package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Compression-ratio quality signal (the Gopher repetition rule's
  * second face: Rae et al. 2021 filter documents whose zlib-compressed
  * size is implausibly small or large for their length — boilerplate
  * and template spam compress far harder than prose, random noise
  * barely at all).
  *
  * Deflate is an opaque imperative codec, so like the multimodal
  * decoders this is a `mapPartitions` boundary — ONE Deflater per
  * partition (they are expensive to allocate), reset between rows, no
  * shuffle introduced. The level is pinned so the signal is
  * reproducible run to run; rows-only by nature (no SQL engine
  * replays zlib), the spec pins the semantic invariants instead:
  * repetition compresses harder than prose, noise barely compresses,
  * and the ratio is partitioning-invariant.
  */
object Compression {

  /** (id, raw_len, comp_len, ratio_bp) per document over the UTF-8
    * bytes of `textCol`; ratio_bp = comp_len·10⁴ / raw_len (floor).
    * Empty/null texts report 0-length with ratio 10000 by convention
    * (nothing to compress — neither suspicious nor informative).
    */
  def ratios(df: DataFrame, idCol: String, textCol: String,
             level: Int = 6): DataFrame = {
    require(level >= 1 && level <= 9, s"deflate level in [1,9], got $level")
    val spark = df.sparkSession
    val rows = df.select(idCol, textCol)
      .map { r =>
        val id = r.getLong(0)
        val text = if (r.isNullAt(1)) "" else r.getString(1)
        (id, text)
      }(Encoders.tuple(Encoders.scalaLong, Encoders.STRING))
      .mapPartitions { it =>
        val deflater = new Deflater(level)
        val buf = new Array[Byte](64 * 1024)
        it.map { case (id, text) =>
          val raw = text.getBytes("UTF-8")
          if (raw.isEmpty) Row(id, 0L, 0L, 10000L)
          else {
            deflater.reset()
            deflater.setInput(raw)
            deflater.finish()
            var compLen = 0L
            while (!deflater.finished())
              compLen += deflater.deflate(buf)
            Row(id, raw.length.toLong, compLen,
              compLen * 10000L / raw.length)
          }
        }
      }(Encoders.row(StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("raw_len", LongType, nullable = false),
        StructField("comp_len", LongType, nullable = false),
        StructField("ratio_bp", LongType, nullable = false)))))
    rows.toDF(idCol, "raw_len", "comp_len", "ratio_bp")
  }
}
