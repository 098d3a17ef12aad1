package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.sources.Tables

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  test("withPayload produces binary payload + typed metadata") {
    val docs = Tables.load(spark, sf, "documents")
    val p = Multimodal.withPayload(docs)
    assert(p.schema("payload").dataType.typeName === "binary")
    val row = p.filter(col("doc_id") === 0)
      .select(col("meta.n_bytes"), length(col("payload")).cast("long")).as[(Long, Long)].head()
    assert(row._1 === row._2)
  }

  test("multimodal near-dup: identical payloads pair at cosine 1.0 end-to-end") {
    import graft.dedup.NearDup
    val docs = Seq(
      (1L, "alpha beta gamma delta", "en", "s", 22L),
      (2L, "alpha beta gamma delta", "en", "s", 22L), // identical payload
      (3L, "zzz yyy xxx www", "en", "s", 15L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val feats = Multimodal.decodeFeatures(Multimodal.withPayload(docs))
    val pairs = NearDup.embeddingPairs(
      feats.select(col("doc_id"), col("feat")), "doc_id", "feat",
      minCosine = 0.9999, nBits = 8)
      .as[(Long, Long, Double)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet === Set((1L, 2L)))
    assert(pairs.head._3 === 1.0)
  }

  test("decodeFeatures: deterministic, histogram sums to byte count, feat normalized") {
    val docs = Tables.load(spark, sf, "documents").limit(50)
    val feats = Multimodal.decodeFeatures(Multimodal.withPayload(docs), batchSize = 7)
    val rows = feats.select(col("doc_id"), col("checksum"),
      aggregate(col("byte_histogram"), lit(0L), (a, b) => a + b).as("hist_sum"),
      round(aggregate(col("feat"), lit(0.0), (a, b) => a + b.cast("double")), 3).as("feat_sum"))
      .join(Multimodal.withPayload(docs).select(col("doc_id"), col("meta.n_bytes")), Seq("doc_id"))
      .as[(Long, Long, Long, Double, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, histSum, featSum, nBytes) =>
      assert(histSum === nBytes)
      assert(math.abs(featSum - 1.0) < 0.01)
    }
    // determinism: run twice, same checksums
    val again = Multimodal.decodeFeatures(Multimodal.withPayload(docs))
      .select("doc_id", "checksum").as[(Long, Long)].collect().toMap
    val first = feats.select("doc_id", "checksum").as[(Long, Long)].collect().toMap
    assert(first === again)
  }

  test("decodeImage decodes a real 2x2 PNG to known pixel features") {
    import java.awt.image.BufferedImage
    // red, green, blue, white — every channel mean is exactly 0.5
    val img = new BufferedImage(2, 2, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xFF0000); img.setRGB(1, 0, 0x00FF00)
    img.setRGB(0, 1, 0x0000FF); img.setRGB(1, 1, 0xFFFFFF)
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", baos))
    val png = baos.toByteArray
    val (_, hist, feat) = Multimodal.decodeImage(png)
    assert(feat(0) === 0.5f && feat(1) === 0.5f && feat(2) === 0.5f) // mean RGB
    assert(feat(4) === 2f && feat(5) === 2f) // decoded dimensions
    // BT.601 integer lumas: red 76→bucket 2, green 149→4, blue 29→0,
    // white 255→7
    assert(hist.toSeq === Seq(1L, 0L, 1L, 0L, 1L, 0L, 0L, 1L))
    assert(feat(7) === 0.25f) // brightest-bucket share = the white pixel

    // and through the batched plumbing via the codec swap-in point
    import spark.implicits._
    val df = Seq((1L, png), (2L, png)).toDF("doc_id", "payload")
    val out = Multimodal.decodeFeatures(df, batchSize = 1, codec = Multimodal.decodeImage)
      .select("doc_id", "feat").as[(Long, Seq[Float])].collect().toMap
    assert(out(1L) === out(2L) && out(1L)(3) === feat(3))
  }

  test("splitMjpegFrames: real JPEG frames out of a synthesized MJPEG stream") {
    import java.awt.image.BufferedImage
    // six frames with distinct brightness so decoded features identify them
    def jpeg(shade: Int): Array[Byte] = {
      val img = new BufferedImage(4, 4, BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 4; y <- 0 until 4)
        img.setRGB(x, y, (shade << 16) | (shade << 8) | shade)
      val baos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "jpg", baos))
      baos.toByteArray
    }
    val frames = (0 until 6).map(i => jpeg(i * 40))
    val mjpeg = frames.reduce(_ ++ _)

    val all = Multimodal.splitMjpegFrames(mjpeg)
    assert(all.size === 6)
    assert(all.zip(frames).forall { case (a, b) => a.sameElements(b) },
      "each split frame is byte-identical to its source JPEG")
    // strided sampling: every 2nd frame
    val strided = Multimodal.splitMjpegFrames(mjpeg, stride = 2)
    assert(strided.size === 3)
    assert(strided.zip(Seq(0, 2, 4)).forall { case (f, i) =>
      f.sameElements(frames(i)) })
    // each sampled frame decodes through the REAL image codec
    val lumas = strided.map(f => Multimodal.decodeImage(f)._3(3))
    assert(lumas === lumas.sorted, s"brightness increases across frames: $lumas")
    assert(Multimodal.splitMjpegFrames(mjpeg, maxFrames = 2).size === 2)
  }

  test("splitMjpegFrames survives fill bytes between markers (legal JPEG padding)") {
    import java.awt.image.BufferedImage
    def jpeg(shade: Int): Array[Byte] = {
      val img = new BufferedImage(4, 4, BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 4; y <- 0 until 4)
        img.setRGB(x, y, (shade << 16) | (shade << 8) | shade)
      val baos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "jpg", baos))
      baos.toByteArray
    }
    val f0 = jpeg(40); val f1 = jpeg(200)
    // inject a fill-byte run (0xFF 0xFF ...) right after f0's SOI marker:
    // a parser that reads 0xFFFF as a length-bearing segment consumes a
    // garbage length and can jump past the frame's real EOI
    val padded = f0.take(2) ++ Array.fill(3)(0xFF.toByte) ++ f0.drop(2)
    val stream = padded ++ f1
    val frames = Multimodal.splitMjpegFrames(stream)
    assert(frames.size === 2, s"fill bytes must not swallow frames, got ${frames.size}")
    assert(frames(1).sameElements(f1))
  }

  test("decodeFeatures routes null and empty payloads around a throwing codec") {
    import spark.implicits._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = true)))
    val img = {
      val b = new java.awt.image.BufferedImage(2, 2,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(b, "png", baos); baos.toByteArray
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, img), Row(2L, null), Row(3L, Array.empty[Byte]))),
      schema)
    // decodeImage throws on empty input; the plumbing must not let one
    // missing blob abort the corpus job
    val out = Multimodal.decodeFeatures(df, batchSize = 2,
      codec = Multimodal.decodeImage)
      .select("doc_id", "checksum").as[(Long, Long)].collect().toMap
    assert(out.keySet === Set(1L, 2L, 3L))
    assert(out(2L) === 0L && out(3L) === 0L) // no-media sentinel
    assert(out(1L) !== 0L)
  }

  test("decodeAudioWav decodes a synthesized sine WAV to known signal features") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // 0.5 s of a 1 kHz sine at half full scale, 16-bit mono PCM @ 8 kHz
    val rate = 8000; val freq = 1000; val nFrames = 4000; val amp = 16384
    val pcm = new Array[Byte](nFrames * 2)
    for (i <- 0 until nFrames) {
      val s = math.round(amp * math.sin(2 * math.Pi * freq * i / rate)).toInt
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(rate.toFloat, 16, 1, true, false)
    val baos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong),
      AudioFileFormat.Type.WAVE, baos)
    val wav = baos.toByteArray

    val (_, hist, feat) = Multimodal.decodeAudioWav(wav)
    assert(math.abs(feat(0) - 0.5f / math.sqrt(2).toFloat) < 0.01f) // RMS = A/sqrt(2)
    assert(math.abs(feat(1) - 2f * freq / rate) < 0.01f) // ZCR = 2f/rate per sample
    assert(math.abs(feat(2) - 0.5f) < 0.01f) // peak = A
    assert(feat(4) === 0.5f && feat(5) === rate.toFloat && feat(6) === 1f)
    assert(hist.sum === nFrames.toLong && hist(5) === 0L && hist(6) === 0L
      && hist(7) === 0L) // |s| <= 16384 never reaches buckets 5-7

    // and through the batched plumbing via the codec swap-in point
    import spark.implicits._
    val df = Seq((1L, wav), (2L, wav)).toDF("doc_id", "payload")
    val out = Multimodal.decodeFeatures(df, batchSize = 1, codec = Multimodal.decodeAudioWav)
      .select("doc_id", "feat").as[(Long, Seq[Float])].collect().toMap
    assert(out(1L) === out(2L) && out(1L)(0) === feat(0))
  }

  test("image average-hash: identical images collide, edits stay near, inversion is far") {
    import java.awt.image.BufferedImage
    def png(f: (Int, Int) => Int, w: Int = 32, h: Int = 32): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, f(x, y))
      val baos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", baos))
      baos.toByteArray
    }
    def gray(v: Int) = (v << 16) | (v << 8) | v
    val gradient = (x: Int, y: Int) => gray((x * 255) / 31)
    val a = Multimodal.imageAverageHash(png(gradient))
    val b = Multimodal.imageAverageHash(png(gradient)) // bit-identical
    assert(a === b)
    // a small local edit: one bright corner cell on the dark side
    val edited = Multimodal.imageAverageHash(png((x, y) =>
      if (x < 4 && y < 4) gray(255) else gradient(x, y)))
    val editDist = java.lang.Long.bitCount(a ^ edited)
    assert(editDist >= 1 && editDist <= 3, s"edit distance $editDist")
    // inversion flips the bright/dark structure wholesale
    val inverted = Multimodal.imageAverageHash(png((x, y) =>
      gray(255 - (x * 255) / 31)))
    assert(java.lang.Long.bitCount(a ^ inverted) > 20)
  }

  test("JPEG round trip: decoded cell means keep the aHash margin; hash is closed-form") {
    import spark.implicits._
    val ids = (0L until 24L).toDF("doc_id")
    val payloads = Multimodal.syntheticJpegPayloads(ids).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    payloads.foreach { case (id, bytes) =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img.getWidth === 64 && img.getHeight === 64)
      val g = (id / 3).toInt; val a = 2 * (g % 16) + 1; val flip = (id % 64).toInt
      var expected = 0L
      for (c <- 0 until 64) {
        val white = (((c * a + 7) % 64) < 32) ^ (c == flip)
        if (white) expected |= (1L << c)
        // measure the lossy margin the oracle's closed form RELIES on:
        // every decoded 8x8 cell mean within a few luma units of 0/255
        val (cy, cx) = (c / 8, c % 8)
        var sum = 0L
        for (y <- cy * 8 until cy * 8 + 8; x <- cx * 8 until cx * 8 + 8) {
          val rgb = img.getRGB(x, y)
          sum += (((rgb >>> 16) & 0xff) * 299 + ((rgb >>> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000
        }
        val mean = sum / 64.0
        assert(if (white) mean > 225 else mean < 30,
          s"doc $id cell $c lossy margin violated: mean $mean white=$white")
      }
      assert(Multimodal.imageAverageHash(bytes) === expected, s"doc $id hash")
    }
  }

  test("perceptual-hash near-dup closes end-to-end through hammingPairs64") {
    import spark.implicits._
    // identical payload pair + a perturbed copy + unrelated filler
    val base = ("m" * 200 + "q" * 56).getBytes("UTF-8")
    val perturbed = base.clone(); perturbed(0) = 'n'.toByte
    val rows = Seq(
      (1L, base), (2L, base.clone()), (3L, perturbed),
      (4L, ("z" * 100 + "a" * 100 + "0" * 56).getBytes("UTF-8")),
      (5L, Array.empty[Byte]))
    val hashed = Multimodal.perceptualHashes(
      rows.toDF("doc_id", "payload"))
    val pairs = graft.dedup.NearDup.hammingPairs64(hashed, maxHamming = 3)
      .filter(col("id_a") =!= 5L && col("id_b") =!= 5L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L))) // identical: hamming 0
    // the single-byte perturbation stays within the radius of both copies
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)))
    assert(!pairs.exists { case (x, y) => x == 4L || y == 4L })
  }
}
