package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque binary payloads + typed metadata,
  * with batch feature extraction.
  *
  * Design (brief-mandated): media travels as a `binary` column with a
  * typed metadata struct; decode/feature-extract runs per-partition in
  * bounded batches (the JVM mirror of Arrow-batched pandas UDFs).
  *
  * Codec status (measured, round 11): PNG and JPEG decode/encode are
  * REAL via `javax.imageio` (this JDK ships both readers and writers —
  * see `decodePngGray` / the JPEG path around `jpegBytesGray`), and
  * WAV/AIFF decode is REAL via `javax.sound.sampled`. Only MP3 and
  * H.264 lack a JVM SPI in a stock JDK, so `decodeStub` below remains a
  * clearly-marked deterministic stand-in for THOSE formats only;
  * everything around it (schema, batching, partitioning, null handling)
  * is the real plumbing a JNI/FFI codec binding would drop into.
  */
object Multimodal {

  val payloadSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("source", StringType, nullable = true),
      StructField("n_bytes", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false))), nullable = false)))

  /** Wrap documents as media rows: payload = UTF-8 bytes of the text
    * (stand-in for real image/audio bytes), metadata derived
    * deterministically.
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      lit("text/plain").as("media_type"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        col("source"),
        length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
        (pmod(col("doc_id"), lit(64)) + 16).cast("int").as("width"),
        (pmod(col("doc_id"), lit(48)) + 16).cast("int").as("height")).as("meta"))

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("checksum", LongType, nullable = false),
    StructField("byte_histogram", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("feat", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** STUB decode kernel — deterministic fake standing in for a codec.
    * A real deployment swaps only this function (same byte[]-in,
    * features-out shape a JNI/FFI codec binding would have).
    */
  private[multimodal] def decodeStub(payload: Array[Byte]): (Long, Array[Long], Array[Float]) = {
    var checksum = 1125899906842597L
    val hist = new Array[Long](8)
    var i = 0
    while (i < payload.length) {
      val b = payload(i) & 0xff
      checksum = 31L * checksum + b
      hist(b >>> 5) += 1
      i += 1
    }
    val feat = Array.tabulate(8)(j =>
      if (payload.length == 0) 0.0f else hist(j).toFloat / payload.length)
    (checksum, hist, feat)
  }

  /** REAL image decode (PNG/JPEG/GIF/BMP via javax.imageio — pure JVM,
    * no FFI): the production codec for image payloads, dropping into the
    * [[decodeFeatures]] swap-in point with the same byte[]-in,
    * features-out shape as [[decodeStub]]. Features are deterministic
    * pixel statistics:
    *   - checksum: rolling hash over the raw (encoded) payload bytes
    *   - byte_histogram: 8-bucket LUMINANCE histogram (ITU-R BT.601
    *     integer weights, bucket = luma >>> 5)
    *   - feat: [meanR, meanG, meanB, meanLuma (all /255), width, height,
    *     darkest-bucket share, brightest-bucket share]
    * Undecodable payloads raise (quarantine upstream — the plumbing's
    * null handling already routes empty payloads around the codec).
    */
  private[graft] def decodeImage(payload: Array[Byte]): (Long, Array[Long], Array[Float]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    require(img != null, "payload is not a decodable image")
    val w = img.getWidth
    val h = img.getHeight
    var checksum = 1125899906842597L
    var i = 0
    while (i < payload.length) { checksum = 31L * checksum + (payload(i) & 0xff); i += 1 }
    val hist = new Array[Long](8)
    var sr = 0L; var sg = 0L; var sb = 0L; var sl = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >>> 16) & 0xff
        val g = (rgb >>> 8) & 0xff
        val b = rgb & 0xff
        val luma = (r * 299 + g * 587 + b * 114) / 1000
        sr += r; sg += g; sb += b; sl += luma
        hist(luma >>> 5) += 1L
        x += 1
      }
      y += 1
    }
    val n = (w.toLong * h).toFloat
    val feat = Array(
      sr / n / 255f, sg / n / 255f, sb / n / 255f, sl / n / 255f,
      w.toFloat, h.toFloat, hist(0) / n, hist(7) / n)
    (checksum, hist, feat)
  }

  /** REAL audio decode (WAV/AIFF/AU PCM via javax.sound.sampled — pure
    * JVM, no FFI): the production codec for audio payloads, dropping into
    * the [[decodeFeatures]] swap-in point with the same byte[]-in,
    * features-out shape as [[decodeStub]]/[[decodeImage]]. The container
    * is decoded to canonical 16-bit signed PCM (any source bit depth /
    * endianness), channels mix to mono, and the features are
    * deterministic sample statistics:
    *   - checksum: rolling hash over the raw (encoded) payload bytes
    *   - byte_histogram: 8-bucket |amplitude| histogram (bucket =
    *     |s16| >>> 12, top bucket saturating)
    *   - feat: [rms, zeroCrossingRate (per sample), peak, meanAbs
    *     (all /full-scale), durationSeconds, sampleRateHz, nChannels,
    *     silenceRatio (|s| < 1% full scale)]
    * Undecodable payloads raise (quarantine upstream, like the image
    * codec). Compressed formats (MP3 etc.) have no JVM-builtin SPI — they
    * stay behind the documented stub until a codec lib is available.
    */
  private[graft] def decodeAudioWav(payload: Array[Byte]): (Long, Array[Long], Array[Float]) = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    var checksum = 1125899906842597L
    var i = 0
    while (i < payload.length) { checksum = 31L * checksum + (payload(i) & 0xff); i += 1 }
    val in = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(payload))
    try {
      val src = in.getFormat
      val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, src.getSampleRate,
        16, src.getChannels, src.getChannels * 2, src.getSampleRate, false)
      val pcm = AudioSystem.getAudioInputStream(fmt, in)
      val bytes = pcm.readAllBytes()
      val ch = fmt.getChannels
      val nFrames = bytes.length / (2 * ch)
      val hist = new Array[Long](8)
      var sumSq = 0.0; var sumAbs = 0.0; var peak = 0
      var crossings = 0L; var silent = 0L; var prevSign = 0
      var f = 0
      while (f < nFrames) {
        var acc = 0
        var c = 0
        while (c < ch) { // little-endian interleaved frames, mixed to mono
          val base = 2 * (f * ch + c)
          acc += (bytes(base + 1) << 8) | (bytes(base) & 0xff)
          c += 1
        }
        val s = acc / ch
        val a = math.abs(s)
        hist(math.min(7, a >>> 12)) += 1L
        sumSq += s.toDouble * s; sumAbs += a
        if (a > peak) peak = a
        if (a < 328) silent += 1
        val sign = if (s > 0) 1 else if (s < 0) -1 else 0
        if (prevSign != 0 && sign != 0 && sign != prevSign) crossings += 1
        if (sign != 0) prevSign = sign
        f += 1
      }
      val n = math.max(1, nFrames).toDouble
      val full = 32768.0
      val feat = Array(
        (math.sqrt(sumSq / n) / full).toFloat,
        (crossings / n).toFloat,
        (peak / full).toFloat,
        (sumAbs / n / full).toFloat,
        (nFrames / fmt.getSampleRate.toDouble).toFloat,
        fmt.getSampleRate,
        ch.toFloat,
        (silent / n).toFloat)
      (checksum, hist, feat)
    } finally in.close()
  }

  /** REAL video-frame extraction for MJPEG payloads (pure JVM, no
    * codec libs): Motion-JPEG is concatenated JPEG frames, so frame
    * boundaries are the JPEG SOI/EOI markers (FFD8 .. FFD9, skipping
    * marker-embedded length segments so an FFD9 inside entropy-coded
    * data or a thumbnail can't split a frame early). Every `stride`-th
    * frame is emitted up to `maxFrames`; each frame is a decodable JPEG
    * that [[decodeImage]] turns into pixel features — the full
    * video → frames → features loop with real decoders end to end
    * (MultimodalSpec proves it on a synthesized 6-frame MJPEG).
    * Inter-frame-compressed containers (H.264 etc.) remain behind the
    * documented stub.
    */
  private[graft] def splitMjpegFrames(payload: Array[Byte], stride: Int = 1,
                                      maxFrames: Int = 64): Seq[Array[Byte]] = {
    require(stride >= 1 && maxFrames >= 1, "stride and maxFrames must be >= 1")
    val out = Seq.newBuilder[Array[Byte]]
    var i = 0; var start = -1; var emitted = 0; var seen = 0
    while (i + 1 < payload.length && emitted < maxFrames) {
      val m = ((payload(i) & 0xff) << 8) | (payload(i + 1) & 0xff)
      if (start < 0) {
        if (m == 0xFFD8) { start = i; i += 2 } else i += 1
      } else m match {
        case 0xFFD9 =>
          if (seen % stride == 0) {
            out += java.util.Arrays.copyOfRange(payload, start, i + 2)
            emitted += 1
          }
          seen += 1; start = -1; i += 2
        case 0xFFD8 | 0xFF01 => i += 2 // nested SOI (thumbnail) / TEM
        case x if x >= 0xFFD0 && x <= 0xFFD7 => i += 2 // restart markers
        case 0xFFFF => i += 1 // fill byte (legal padding) — NOT a segment:
          // reading the next two bytes as a length would skip a
          // garbage-derived span and can jump past the frame's real EOI
        case x if (x >> 8) == 0xFF && x != 0xFF00 && i + 3 < payload.length =>
          // length-bearing segment: skip its payload wholesale
          i += 2 + (((payload(i + 2) & 0xff) << 8) | (payload(i + 3) & 0xff))
        case _ => i += 1 // entropy-coded data / stuffed byte
      }
    }
    out.result()
  }

  /** Frame sampling: every `stride`-th fixed-size chunk of the payload
    * (stand-in for video frame extraction — a real decoder swaps into
    * the chunking exactly like decodeStub). One output row per sampled
    * frame, bounded by `maxFrames` so a pathological payload can't
    * explode a task.
    */
  def sampleFrames(payloads: DataFrame, frameBytes: Int = 64, stride: Int = 4,
                   maxFrames: Int = 16): DataFrame =
    payloads.select(col("doc_id"),
      posexplode(split_payload(col("payload"), frameBytes, stride, maxFrames))
        .as(Seq("frame_idx", "frame")))

  private def split_payload(payload: org.apache.spark.sql.Column, frameBytes: Int,
                            stride: Int, maxFrames: Int): org.apache.spark.sql.Column = {
    val nFrames = floor(length(payload) / (frameBytes * stride)).cast("int")
    // the cap clamps the SEQUENCE BOUND, not a downstream slice: a
    // slice-after-transform would first materialize every frame of a
    // pathological payload (a 1 GB blob = millions of array elements in
    // one row's evaluation) before keeping maxFrames of them
    val capped = least(nFrames, lit(maxFrames))
    transform(sequence(lit(0), greatest(capped - 1, lit(0))),
      i => payload.substr(lit(1) + i * frameBytes * stride, lit(frameBytes)))
  }

  /** Per-partition batched feature extraction over payload rows.
    * `batchSize` bounds the rows decoded per inner batch — the knob a
    * real codec needs to cap native-memory use per task (mirrors Arrow
    * batch sizing for pandas UDFs). `codec` is the swap-in point:
    * [[decodeStub]] by default, [[decodeImage]] for real image payloads
    * (any byte[] => (checksum, histogram, features) kernel slots in).
    * Null/empty payloads NEVER reach the codec and emit the no-media
    * sentinel row (checksum 0, empty arrays) — the real codecs throw on
    * empty input, and one missing blob must not abort a corpus job.
    */
  def decodeFeatures(payloads: DataFrame, batchSize: Int = 64,
                     codec: Array[Byte] => (Long, Array[Long], Array[Float]) = decodeStub): DataFrame = {
    val spark = payloads.sparkSession
    val rdd = payloads.select(col("doc_id"), col("payload")).rdd
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { r =>
            val docId = r.getLong(0)
            // a missing/empty blob never reaches the codec — the real
            // codecs (ImageIO, AudioSystem) throw on empty input, and
            // one bad row would fail its task 4 times and abort the job
            if (r.isNullAt(1) || r.getAs[Array[Byte]](1).isEmpty)
              Row(docId, 0L, Seq.empty[Long], Seq.empty[Float])
            else {
              val (checksum, hist, feat) = codec(r.getAs[Array[Byte]](1))
              Row(docId, checksum, hist.toSeq, feat.toSeq)
            }
          }
        }
      }
    spark.createDataFrame(rdd, featureSchema)
  }

  /** Average-hash over raw payload BYTES (the stub tier of the
    * perceptual-hash swap-in): 64-bucket byte histogram, bit i set iff
    * bucket i holds more than its even share — the cross-multiplied
    * integer compare `hist(i)·64 > n` needs no float mean. Identical
    * payloads collide exactly; locally-perturbed payloads land within a
    * small hamming radius.
    */
  private[graft] def byteAverageHash(payload: Array[Byte]): Long = {
    val hist = new Array[Long](64)
    var i = 0
    while (i < payload.length) { hist((payload(i) & 0xff) >>> 2) += 1; i += 1 }
    var h = 0L
    var b = 0
    while (b < 64) {
      if (hist(b) * 64L > payload.length.toLong) h |= (1L << b)
      b += 1
    }
    h
  }

  /** REAL image perceptual hash — the published average-hash (aHash):
    * luminance area-averaged onto an 8×8 grid, bit = cell brighter than
    * the global mean. All-integer: cell boundaries are floor(k·dim/8)
    * and the brightness compare is cross-multiplied
    * (`cellSum·totalN > totalSum·cellN`), so the hash is bit-identical
    * across JVMs/platforms — no float resampling. Contract: w·h ≤ 16M
    * pixels (the cross-product stays far inside 2⁶³).
    *
    * Same swap-in shape as [[decodeImage]]: near-identical images
    * (re-encodes, small edits) land within a small hamming radius;
    * `NearDup.hammingPairs64` pairs them with one bucket shuffle.
    */
  private[graft] def imageAverageHash(payload: Array[Byte]): Long = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    require(img != null, "payload is not a decodable image")
    val w = img.getWidth; val h = img.getHeight
    require(w.toLong * h <= 16L * 1024 * 1024, s"image too large: ${w}x$h")
    val cellSum = new Array[Long](64)
    val cellN = new Array[Long](64)
    var totalSum = 0L
    var y = 0
    while (y < h) {
      val cy = math.min(y * 8 / h, 7)
      var x = 0
      while (x < w) {
        val cx = math.min(x * 8 / w, 7)
        val rgb = img.getRGB(x, y)
        val luma = (((rgb >>> 16) & 0xff) * 299 + ((rgb >>> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114) / 1000
        val c = cy * 8 + cx
        cellSum(c) += luma; cellN(c) += 1; totalSum += luma
        x += 1
      }
      y += 1
    }
    val totalN = w.toLong * h
    var hash = 0L
    var c = 0
    while (c < 64) {
      if (cellN(c) > 0 && cellSum(c) * totalN > totalSum * cellN(c))
        hash |= (1L << c)
      c += 1
    }
    hash
  }

  /** Deterministic synthetic PNG payloads (doc_id, payload): ids in the
    * same `groupSize` group render near-identical 32×32 gradients (same
    * slope, one per-id perturbed cell) — real encoded images for
    * demonstrating the image-perceptual-hash path end-to-end where the
    * corpus has no binary media. Pure function of the id.
    */
  def syntheticPngPayloads(ids: DataFrame, groupSize: Int = 3): DataFrame = {
    val spark = ids.sparkSession
    val rdd = ids.select(col("doc_id")).rdd.mapPartitions(_.map { r =>
      val id = r.getLong(0)
      val g = (id / groupSize).toInt
      val img = new java.awt.image.BufferedImage(32, 32,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < 32) {
        var x = 0
        while (x < 32) {
          val v = ((x * (1 + g % 5) + y * (g % 7)) * 255 /
            (31 * (1 + g % 5) + 31 * (g % 7) max 1)) & 0xff
          img.setRGB(x, y, (v << 16) | (v << 8) | v)
          x += 1
        }
        y += 1
      }
      // per-id small edit: one 4x4 bright patch placed by id
      val px = (id % 8).toInt * 4
      var yy = 0
      while (yy < 4) {
        var xx = 0
        while (xx < 4) { img.setRGB(px + xx, yy, 0xffffff); xx += 1 }
        yy += 1
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      Row(id, baos.toByteArray)
    })
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", org.apache.spark.sql.types.BinaryType, nullable = false))))
  }

  /** Deterministic synthetic JPEG payloads (doc_id, payload): REAL lossy
    * encodes through the JDK's built-in JPEG codec (javax.imageio ships
    * a JPEG reader+writer — measured available in this environment, so
    * the lossy-image rung is NOT codec-blocked the way MP3/H.264 are).
    * The pattern makes the LOSSY chain exactly verifiable: a 64×64
    * image of 8×8-pixel cells, each uniformly black (0) or white (255),
    * aligned 1:1 with JPEG's 8×8 DCT blocks — a uniform block encodes
    * as a DC-only coefficient whose quantization error is a couple of
    * luma units, so every decoded cell average stays within a few units
    * of 0 or 255 and the aHash threshold (cell vs global mean ≈ 127)
    * has a ~125-unit margin: the hash of the DECODED lossy image is a
    * pure integer function of the id. Cell c is white iff
    * ((c·a + 7) mod 64) < 32 with a = 2·(g mod 16)+1 (odd ⇒ a
    * permutation ⇒ exactly 32 white cells), g = id/groupSize; the
    * per-id edit flips cell (id mod 64).
    */
  def syntheticJpegPayloads(ids: DataFrame, groupSize: Int = 3): DataFrame = {
    val spark = ids.sparkSession
    val rdd = ids.select(col("doc_id")).rdd.mapPartitions(_.map { r =>
      val id = r.getLong(0)
      val g = (id / groupSize).toInt
      val a = 2 * (g % 16) + 1
      val flip = (id % 64).toInt
      val img = new java.awt.image.BufferedImage(64, 64,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var cy = 0
      while (cy < 8) {
        var cx = 0
        while (cx < 8) {
          val c = cy * 8 + cx
          val white = (((c * a + 7) % 64) < 32) ^ (c == flip)
          val v = if (white) 0xffffff else 0x000000
          var y = cy * 8
          while (y < cy * 8 + 8) {
            var x = cx * 8
            while (x < cx * 8 + 8) { img.setRGB(x, y, v); x += 1 }
            y += 1
          }
          cx += 1
        }
        cy += 1
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", baos)
      Row(id, baos.toByteArray)
    })
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", org.apache.spark.sql.types.BinaryType, nullable = false))))
  }

  /** (doc_id, sh) perceptual hashes for a payload frame — the same
    * batched mapPartitions plumbing as [[decodeFeatures]] ([[byteAverageHash]]
    * by default; [[imageAverageHash]] for real image payloads). Null or
    * empty payloads emit hash 0 (the no-media sentinel). Feed the result
    * straight to `NearDup.hammingPairs64`.
    */
  def perceptualHashes(payloads: DataFrame,
                       kernel: Array[Byte] => Long = byteAverageHash): DataFrame = {
    val spark = payloads.sparkSession
    val rdd = payloads.select(col("doc_id"), col("payload")).rdd
      .mapPartitions(_.map { r =>
        val docId = r.getLong(0)
        if (r.isNullAt(1) || r.getAs[Array[Byte]](1).isEmpty) Row(docId, 0L)
        else Row(docId, kernel(r.getAs[Array[Byte]](1)))
      })
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("sh", LongType, nullable = false))))
  }

  /** Deterministic WAV payloads (REAL RIFF containers via
    * javax.sound.sampled) for demonstrating the audio path end-to-end:
    * per id, alternating silence / square-wave-tone segments whose
    * lengths are exact multiples of 256 samples — so a 256-sample
    * analysis window is always purely silent or purely tone, and the
    * segment layout is a pure function of the id (AudioSpec's oracle
    * recomputes it). 16-bit mono PCM @ 8 kHz; the square wave keeps
    * every sample integral (no libm in the payload).
    */
  def syntheticWavPayloads(ids: DataFrame, amp: Int = 12000): DataFrame = {
    val spark = ids.sparkSession
    val rdd = ids.select(col("doc_id")).rdd.mapPartitions(_.map { r =>
      val id = r.getLong(0)
      Row(id, synthWavBytes(id, amp))
    })
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", org.apache.spark.sql.types.BinaryType, nullable = false))))
  }

  /** Segment lengths IN 256-SAMPLE WINDOWS for [[synthWavBytes]]:
    * (silence, tone, silence, tone, silence). Exposed so specs can
    * derive the expected energy/segment layout without decoding.
    */
  private[graft] def synthSegmentWindows(id: Long): Seq[(Boolean, Int)] = Seq(
    (false, 2 + (id % 3).toInt), // leading silence
    (true, 3 + (id % 2).toInt),  // tone
    (false, 2),                  // gap
    (true, 4),                   // tone
    (false, 1))                  // trailing silence

  private[graft] def synthWavBytes(id: Long, amp: Int = 12000): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val segs = synthSegmentWindows(id)
    val nFrames = segs.map(_._2).sum * 256
    val pcm = new Array[Byte](nFrames * 2)
    var f = 0
    segs.foreach { case (tone, wins) =>
      var i = 0
      while (i < wins * 256) {
        // square wave, period 32 samples: integral, zero-mean
        val s = if (!tone) 0 else if ((i / 16) % 2 == 0) amp else -amp
        pcm(2 * f) = (s & 0xff).toByte
        pcm(2 * f + 1) = ((s >> 8) & 0xff).toByte
        f += 1; i += 1
      }
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val baos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong),
      AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** Windowed audio energy profile — the VAD-style primitive under
    * silence trimming / speech segmentation of training audio: the
    * payload decodes to canonical 16-bit mono PCM (same
    * javax.sound.sampled conversion as [[decodeAudioWav]]) and every
    * `windowSamples` window emits ONE row of EXACT integer statistics:
    *   - energy_q  = Σ s²  (fits a long: 32768² · windowSamples)
    *   - sum_abs_q = Σ |s|
    *   - peak_abs  = max |s|
    *   - is_silence = peak_abs < silenceAmp (pure integer compare — no
    *     float dB threshold to diverge across engines)
    * The trailing partial window is emitted with its true n_samples.
    * Null/empty payloads emit nothing (the no-media contract).
    * Downstream, gaps-and-islands over `is_silence` turns the rows into
    * speech/tone segments (see q_audio_segments).
    */
  def audioEnergyProfile(payloads: DataFrame, windowSamples: Int = 256,
                         silenceAmp: Int = 328): DataFrame = {
    require(windowSamples > 0 && silenceAmp >= 0)
    val spark = payloads.sparkSession
    val rdd = payloads.select(col("doc_id"), col("payload")).rdd
      .mapPartitions(_.flatMap { r =>
        val docId = r.getLong(0)
        if (r.isNullAt(1) || r.getAs[Array[Byte]](1).isEmpty) Iterator.empty
        else {
          val samples = pcmMonoS16(r.getAs[Array[Byte]](1))
          samples.grouped(windowSamples).zipWithIndex.map { case (w, idx) =>
            var e = 0L; var sa = 0L; var peak = 0
            var i = 0
            while (i < w.length) {
              val s = w(i); val a = math.abs(s)
              e += s.toLong * s; sa += a
              if (a > peak) peak = a
              i += 1
            }
            Row(docId, idx.toLong, w.length.toLong, e, sa, peak.toLong,
              peak < silenceAmp)
          }
        }
      })
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("win_idx", LongType, nullable = false),
      StructField("n_samples", LongType, nullable = false),
      StructField("energy_q", LongType, nullable = false),
      StructField("sum_abs_q", LongType, nullable = false),
      StructField("peak_abs", LongType, nullable = false),
      StructField("is_silence", BooleanType, nullable = false))))
  }

  /** Payload → canonical 16-bit signed mono samples (channels averaged),
    * the same AudioSystem conversion path as [[decodeAudioWav]].
    */
  private[graft] def pcmMonoS16(payload: Array[Byte]): Array[Int] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    val in = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(payload))
    try {
      val src = in.getFormat
      val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, src.getSampleRate,
        16, src.getChannels, src.getChannels * 2, src.getSampleRate, false)
      val pcm = AudioSystem.getAudioInputStream(fmt, in)
      val bytes = pcm.readAllBytes()
      val ch = fmt.getChannels
      val nFrames = bytes.length / (2 * ch)
      val out = new Array[Int](nFrames)
      var f = 0
      while (f < nFrames) {
        var acc = 0; var c = 0
        while (c < ch) {
          val base = 2 * (f * ch + c)
          acc += (bytes(base + 1) << 8) | (bytes(base) & 0xff)
          c += 1
        }
        out(f) = acc / ch
        f += 1
      }
      out
    } finally in.close()
  }
}
