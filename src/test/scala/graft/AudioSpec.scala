package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class AudioSpec extends SparkSuite {
  import spark.implicits._

  private val Amp = 12000L
  private val ToneWindowEnergy = 256L * Amp * Amp
  private val ToneWindowSumAbs = 256L * Amp

  test("energy profile reproduces the planted silence/tone layout exactly") {
    val ids = Seq(0L, 1L, 2L, 5L).toDF("doc_id")
    val prof = Multimodal.audioEnergyProfile(Multimodal.syntheticWavPayloads(ids))
      .orderBy("doc_id", "win_idx")
      .select("doc_id", "win_idx", "energy_q", "sum_abs_q", "peak_abs", "is_silence")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect()
    for (id <- Seq(0L, 1L, 2L, 5L)) {
      val want = Multimodal.synthSegmentWindows(id).flatMap { case (tone, n) =>
        Seq.fill(n)(tone) }
      val got = prof.filter(_._1 == id)
      assert(got.map(_._2).toSeq === want.indices.map(_.toLong), s"id $id windows")
      got.zip(want).foreach { case ((_, w, e, sa, p, sil), tone) =>
        if (tone) {
          assert(e === ToneWindowEnergy && sa === ToneWindowSumAbs &&
            p === Amp && !sil, s"id $id win $w")
        } else {
          assert(e === 0L && sa === 0L && p === 0L && sil, s"id $id win $w")
        }
      }
    }
  }

  test("segmentation (the q_audio_segments shape) finds the two planted tone islands") {
    val ids = Seq(0L, 4L).toDF("doc_id")
    val prof = Multimodal.audioEnergyProfile(Multimodal.syntheticWavPayloads(ids))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("win_idx"))
    val segs = prof.filter(!col("is_silence"))
      .withColumn("__prev", lag(col("win_idx"), 1).over(w))
      .withColumn("__new",
        (col("__prev").isNull || col("win_idx") > col("__prev") + 1).cast("long"))
      .withColumn("__seg", sum(col("__new")).over(w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)))
      .groupBy(col("doc_id"), col("__seg"))
      .agg(min(col("win_idx")).as("s"), max(col("win_idx")).as("e"),
        sum(col("energy_q")).as("eq"))
      .orderBy("doc_id", "s")
      .select("doc_id", "s", "e", "eq").as[(Long, Long, Long, Long)].collect()
    for (id <- Seq(0L, 4L)) {
      val layout = Multimodal.synthSegmentWindows(id)
      val lens = layout.map(_._2)
      val tone1Start = lens(0).toLong
      val tone1End = tone1Start + lens(1) - 1
      val tone2Start = tone1End + 1 + lens(2)
      val tone2End = tone2Start + lens(3) - 1
      val got = segs.filter(_._1 == id)
      assert(got === Array(
        (id, tone1Start, tone1End, lens(1) * ToneWindowEnergy),
        (id, tone2Start, tone2End, lens(3) * ToneWindowEnergy)), s"id $id")
    }
  }

  test("trailing partial window carries its true sample count") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val n = 300 // 256 + 44
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) { // constant amplitude 1000
      pcm(2 * i) = (1000 & 0xff).toByte; pcm(2 * i + 1) = ((1000 >> 8) & 0xff).toByte
    }
    val baos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(new java.io.ByteArrayInputStream(pcm),
      new AudioFormat(8000f, 16, 1, true, false), n.toLong),
      AudioFileFormat.Type.WAVE, baos)
    val df = Seq((9L, baos.toByteArray)).toDF("doc_id", "payload")
    val out = Multimodal.audioEnergyProfile(df)
      .orderBy("win_idx")
      .select("win_idx", "n_samples", "energy_q", "is_silence")
      .as[(Long, Long, Long, Boolean)].collect()
    assert(out === Array(
      (0L, 256L, 256L * 1000 * 1000, false),
      (1L, 44L, 44L * 1000 * 1000, false)))
  }

  test("null and empty payloads emit no windows") {
    val df = Seq((1L, Array.empty[Byte]), (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("doc_id", "payload")
    assert(Multimodal.audioEnergyProfile(df).count() === 0L)
  }
}
