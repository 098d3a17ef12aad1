package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/** Exact-integer per-key linear recurrences: EWMA smoothing, CUSUM
  * changepoint alarms, and clamped running balances.
  *
  * These are the classic "state that every row rewrites" scans — the
  * reference's per-row pipeline loops express them trivially
  * (EcomProvider.cs:849 walks rows in order mutating writer state); a
  * declarative window cannot, because the frame would have to reference
  * its own output (EWMA's y_{i-1}, CUSUM's reset-to-zero, a balance's
  * clamp at the floor). With floor/clamp applied at EVERY step the fold
  * is non-associative, so no exact parallel prefix exists — the honest
  * distributed contract is ONE keyed shuffle with secondary sort
  * ([[org.apache.spark.sql.KeyValueGroupedDataset.flatMapSortedGroups]])
  * and an O(1)-state scan per key, the same machine as
  * [[Debounce.suppress]].
  *
  * All arithmetic is BIGINT on pre-quantized inputs (callers quantize
  * doubles via `floor(x*scale + 0.5)` — one IEEE multiply + floor,
  * deterministic cross-engine), so a DuckDB recursive CTE replays every
  * step bit-for-bit: these are oracle-checkable recurrences, not
  * float approximations.
  *
  * HOT-KEY WALL-CLOCK BOUND (same as Debounce): each key streams
  * through one task — O(1) memory, cannot OOM, but a single pathological
  * key is a straggler. Pre-flight with [[Diagnostics.keySkew]]. Unlike
  * debounce there is no exact chunking escape hatch: a quiet gap does
  * not reset EWMA/balance state, so the scan is irreducibly sequential
  * per key. At 100 TB the keys here are users/parts (bounded per-key
  * history); a key that genuinely holds 1B rows needs a coarser
  * pre-aggregation upstream, not a different fold.
  */
object Recurrences {

  /** Exponentially-weighted moving average with alpha = num/den, exact:
    * y_1 = x_1; y_i = (num*x_i + (den-num)*y_{i-1}) / den with
    * floor division at every step. Appends `outCol` (BIGINT) to every
    * input row. `xCol` must be a non-null LongType column.
    *
    * Overflow bound: the fold computes num·x + (den-num)·y, and y stays
    * within the observed x range (a weighted mean of inputs), so
    * |x|·den must fit a long — cents-scale inputs with den ≤ 10⁶ sit
    * ~6 orders of magnitude under the bound.
    */
  def ewma(df: DataFrame, keys: Seq[String], sortCols: Seq[String],
           xCol: String, num: Long, den: Long,
           outCol: String = "ewma_q"): DataFrame = {
    require(num > 0 && den > num, s"need 0 < num < den, got $num/$den")
    scanAppend(df, keys, sortCols, xCol, outCol) { () =>
      var y = 0L; var first = true
      x => {
        y = if (first) x else Math.floorDiv(num * x + (den - num) * y, den)
        first = false
        Some(y)
      }
    }
  }

  /** One-sided CUSUM drift alarm: s_i = max(0, s_{i-1} + (x_i - target));
    * when s_i >= threshold the row is EMITTED with the statistic and the
    * state resets to zero (standard restart-after-signal form). Output =
    * alarm rows only, input columns + `outCol` = the statistic at the
    * alarm.
    */
  def cusumAlarms(df: DataFrame, keys: Seq[String], sortCols: Seq[String],
                  xCol: String, target: Long, threshold: Long,
                  outCol: String = "cusum_q"): DataFrame = {
    require(threshold > 0, "threshold must be positive")
    scanAppend(df, keys, sortCols, xCol, outCol) { () =>
      var s = 0L
      x => {
        s = Math.max(0L, s + (x - target))
        if (s >= threshold) { val fired = s; s = 0L; Some(fired) }
        else None
      }
    }
  }

  /** Clamped running balance (stock levels cannot go negative):
    * b_i = max(floor, b_{i-1} + delta_i), b_0 = `init`. Emits ONE row
    * per key: keys + `n_moves` + `outCol` (the final balance).
    */
  def clampedBalance(df: DataFrame, keys: Seq[String], sortCols: Seq[String],
                     deltaCol: String, init: Long = 0L, floorAt: Long = 0L,
                     outCol: String = "balance_q"): DataFrame = {
    val schema = df.schema
    val keyIdx = keys.map(schema.fieldIndex)
    val xIdx = schema.fieldIndex(deltaCol)
    val outSchema = StructType(
      keys.map(schema(_)) :+
        org.apache.spark.sql.types.StructField("n_moves", LongType, false) :+
        org.apache.spark.sql.types.StructField(outCol, LongType, false))
    val grouped = df.groupByKey { r: Row =>
      keyIdx.map(i => String.valueOf(r.get(i))).mkString("\u0000")
    }(Encoders.STRING)
    grouped.flatMapSortedGroups(sortCols.map(col): _*) { (_, it: Iterator[Row]) =>
      var b = init; var n = 0L; var keyVals: Seq[Any] = null
      it.foreach { r =>
        if (keyVals == null) keyVals = keyIdx.map(r.get)
        b = Math.max(floorAt, b + r.getLong(xIdx)); n += 1
      }
      if (keyVals == null) Iterator.empty
      else Iterator.single(Row.fromSeq(keyVals :+ n :+ b))
    }(Encoders.row(outSchema))
  }

  /** Holt's linear-trend double exponential smoothing, exact:
    * l_1 = x_1, b_1 = 0; thereafter
    *   l_i = ⌊(aNum·x_i + (aDen−aNum)·(l+b)) / aDen⌋
    *   b_i = ⌊(bNum·(l_i − l_{i−1}) + (bDen−bNum)·b) / bDen⌋
    * (floor division — Math.floorDiv — at every step, so the DuckDB
    * recursive-CTE oracle replays it bit-for-bit via the pmod-subtract
    * formula). Appends `outCol` = the fitted one-step value l_i + b_i.
    * Same machine, two longs of state; the trend term can go negative,
    * which is why the floor convention must be pinned explicitly on
    * both engines (truncating `div` would diverge on negatives).
    */
  def holt(df: DataFrame, keys: Seq[String], sortCols: Seq[String],
           xCol: String, aNum: Long, aDen: Long, bNum: Long, bDen: Long,
           outCol: String = "holt_q"): DataFrame = {
    require(aNum > 0 && aDen > aNum, s"need 0 < aNum < aDen, got $aNum/$aDen")
    require(bNum > 0 && bDen > bNum, s"need 0 < bNum < bDen, got $bNum/$bDen")
    scanAppend(df, keys, sortCols, xCol, outCol) { () =>
      var l = 0L; var b = 0L; var first = true
      x => {
        if (first) { l = x; b = 0L; first = false }
        else {
          val lPrev = l
          l = Math.floorDiv(aNum * x + (aDen - aNum) * (l + b), aDen)
          b = Math.floorDiv(bNum * (l - lPrev) + (bDen - bNum) * b, bDen)
        }
        Some(l + b)
      }
    }
  }

  /** Holt-Winters additive triple exponential smoothing, exact: level,
    * trend, AND a `period`-slot seasonal array, all updated with floor
    * division —
    *   l_i = ⌊(aNum·(x−s_old) + (aDen−aNum)·(l+b)) / aDen⌋
    *   b_i = ⌊(bNum·(l_i−l_{i−1}) + (bDen−bNum)·b) / bDen⌋
    *   s_i = ⌊(gNum·(x−l_i) + (gDen−gNum)·s_old) / gDen⌋
    * Warm-up convention (pinned, spec-replayed): the first `period`
    * rows initialize l = x, b = 0, s = 0 and emit x. Appends `outCol`
    * = the fitted value l + b + s_i. State = period + 2 longs per key
    * (the seasonal ring buffer) — still O(period), never O(history).
    * Oracle-replayable (round 9): the seasonal ring rides a DuckDB
    * recursive CTE as a LIST column updated by slice surgery, with
    * intermediates named through nested derived tables in the
    * recursive arm — the one-row-arm limitation binds scalar state
    * only; q_holt_winters hash-matches that replay at all three SFs.
    */
  def holtWinters(df: DataFrame, keys: Seq[String], sortCols: Seq[String],
                  xCol: String, period: Int,
                  aNum: Long, aDen: Long, bNum: Long, bDen: Long,
                  gNum: Long, gDen: Long,
                  outCol: String = "hw_q"): DataFrame = {
    require(period >= 2, s"period must be >= 2, got $period")
    require(aNum > 0 && aDen > aNum, s"need 0 < aNum < aDen")
    require(bNum > 0 && bDen > bNum, s"need 0 < bNum < bDen")
    require(gNum > 0 && gDen > gNum, s"need 0 < gNum < gDen")
    scanAppend(df, keys, sortCols, xCol, outCol) { () =>
      val season = new Array[Long](period)
      var l = 0L; var b = 0L; var i = 0
      x => {
        val slot = i % period
        val out =
          if (i < period) { l = x; b = 0L; season(slot) = 0L; x }
          else {
            val sOld = season(slot)
            val lPrev = l
            l = Math.floorDiv(aNum * (x - sOld) + (aDen - aNum) * (l + b), aDen)
            b = Math.floorDiv(bNum * (l - lPrev) + (bDen - bNum) * b, bDen)
            season(slot) = Math.floorDiv(gNum * (x - l) + (gDen - gNum) * sOld, gDen)
            l + b + season(slot)
          }
        i += 1
        Some(out)
      }
    }
  }

  /** The shared machine: one keyed shuffle + secondary sort, an O(1)
    * long state per group, rows emitted with `outCol` appended when the
    * step function fires. `mkStep` builds a FRESH step closure per group
    * (state lives in the closure).
    */
  private def scanAppend(df: DataFrame, keys: Seq[String],
                         sortCols: Seq[String], xCol: String, outCol: String)
                        (mkStep: () => Long => Option[Long]): DataFrame = {
    val schema = df.schema
    require(!schema.fieldNames.contains(outCol),
      s"output column $outCol already exists in the input")
    require(schema(xCol).dataType == LongType,
      s"$xCol must be LongType (quantize doubles first); got ${schema(xCol).dataType}")
    val keyIdx = keys.map(schema.fieldIndex)
    val xIdx = schema.fieldIndex(xCol)
    val outSchema = schema.add(outCol, LongType, nullable = false)
    val grouped = df.groupByKey { r: Row =>
      keyIdx.map(i => String.valueOf(r.get(i))).mkString("\u0000")
    }(Encoders.STRING)
    grouped.flatMapSortedGroups(sortCols.map(col): _*) { (_, it: Iterator[Row]) =>
      val step = mkStep()
      it.flatMap { r =>
        step(r.getLong(xIdx)).map(v => Row.fromSeq(r.toSeq :+ v))
      }
    }(Encoders.row(outSchema))
  }

  /** Two-input variant of the machine (e.g. Kaplan-Meier's (d, n_risk)
    * fold): identical shuffle/sort/state contract, the step sees both
    * LongType columns per row.
    */
  private[graft] def scanAppend2(df: DataFrame, keys: Seq[String],
                                 sortCols: Seq[String], xCol: String,
                                 yCol: String, outCol: String)
                                (mkStep: () => (Long, Long) => Option[Long]): DataFrame = {
    val schema = df.schema
    require(!schema.fieldNames.contains(outCol),
      s"output column $outCol already exists in the input")
    Seq(xCol, yCol).foreach(c => require(schema(c).dataType == LongType,
      s"$c must be LongType (quantize doubles first); got ${schema(c).dataType}"))
    val keyIdx = keys.map(schema.fieldIndex)
    val xIdx = schema.fieldIndex(xCol)
    val yIdx = schema.fieldIndex(yCol)
    val outSchema = schema.add(outCol, LongType, nullable = false)
    val grouped = df.groupByKey { r: Row =>
      keyIdx.map(i => String.valueOf(r.get(i))).mkString("\u0000")
    }(Encoders.STRING)
    grouped.flatMapSortedGroups(sortCols.map(col): _*) { (_, it: Iterator[Row]) =>
      val step = mkStep()
      it.flatMap { r =>
        step(r.getLong(xIdx), r.getLong(yIdx))
          .map(v => Row.fromSeq(r.toSeq :+ v))
      }
    }(Encoders.row(outSchema))
  }
}
