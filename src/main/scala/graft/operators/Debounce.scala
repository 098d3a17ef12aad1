package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Event debounce: keep an event only if it falls ≥ `minGapMicros`
  * after the LAST KEPT event of its key — alert/notification
  * suppression with data-dependent reset.
  *
  * NOT expressible declaratively: the predicate references the previous
  * KEPT row (a running scan whose state resets when it fires), not a
  * fixed lag — and it is not gap-sessionization either: events at
  * minutes 0, 5, 9, 14 with a 10-minute gap keep {0, 14}, while
  * gap-sessions merge them all and keep only {0}. This is the typed-API
  * tier of the custom-operator ladder ((d) in the brief): genuine
  * per-group imperative semantics.
  *
  * Shape: ONE keyed shuffle + SECONDARY SORT (`flatMapSortedGroups` —
  * Spark sorts each group on the shuffle's way in, so the scan holds
  * O(1) state per group and groups stream through without buffering; a
  * sort-within-window formulation would pay the identical exchange).
  * Timestamps compare at MICROsecond precision (the parquet feeds carry
  * sub-ms components; ms truncation would mis-order close events).
  *
  * HOT-KEY WALL-CLOCK BOUND: the scan is a running fold, so each key
  * streams through ONE task — O(1) memory (cannot OOM), but a single
  * pathological key (one device emitting 1B events) is a wall-clock
  * straggler. Pre-flight with [[Diagnostics.keySkew]] (e.g.
  * `keySkew(df, col("device_id"))` — any row with a large `skew_x` is a
  * key that will straggle here), and use [[suppressChunked]] when the
  * hot key's timeline has quiet gaps: it splits each key at raw
  * inter-event gaps ≥ `minGapMicros` — provably exact reset points —
  * and scans the chunks in parallel.
  */
object Debounce {

  def suppress(df: DataFrame, keys: Seq[String], tsCol: String,
               minGapMicros: Long, tiebreak: Seq[String] = Seq.empty): DataFrame = {
    require(minGapMicros > 0, "minGapMicros must be positive")
    val schema = df.schema
    val keyIdx = keys.map(schema.fieldIndex)
    val grouped = df.groupByKey { r: Row =>
      // NUL-joined parts: a printable separator would collide composite
      // keys whose values contain it ("a b"+"c" vs "a"+"b c")
      keyIdx.map(i => String.valueOf(r.get(i))).mkString("\u0000")
    }(Encoders.STRING)
    scanSortedGroups(grouped, schema, tsCol, minGapMicros, tiebreak)
  }

  /** Exact parallel debounce for keys whose timelines have quiet gaps.
    *
    * An event whose raw gap from its key's PREVIOUS event is ≥
    * `minGapMicros` is always kept, whatever the scan state (the last
    * kept event is no later than the previous event), and nothing after
    * it depends on anything before it — such gaps are exact reset
    * points, so each key's timeline splits there into chunks that scan
    * independently. A bursty hot key (1B events in thousands of bursts)
    * now spreads over as many tasks as it has bursts; [[suppress]]
    * would stream it through one.
    *
    * Finding the split points never materializes a key's history:
    * events land in `minGapMicros`-wide time cells (two events in one
    * cell are < gap apart, so splits only happen at cell boundaries),
    * a bounded aggregate keeps each occupied cell's min/max timestamp,
    * and one per-key window over the CELL table (one row per occupied
    * cell — a dense burst is ONE row here, a quiet span ZERO) marks
    * chunk heads and numbers chunks. A key that never pauses for a full
    * gap still scans sequentially — with reset-on-keep semantics its
    * output genuinely depends on every predecessor, so that case is
    * irreducible; this restores parallelism exactly when the data
    * allows it.
    *
    * Output == [[suppress]] row-for-row (OperatorsSpec proves equality
    * on random bursty feeds).
    */
  def suppressChunked(df: DataFrame, keys: Seq[String], tsCol: String,
                      minGapMicros: Long,
                      tiebreak: Seq[String] = Seq.empty): DataFrame = {
    require(minGapMicros > 0, "minGapMicros must be positive")
    require(!df.columns.contains("__cell") && !df.columns.contains("__chunk"),
      "suppressChunked uses temp columns __cell/__chunk; rename them in the input first")
    val kc = keys.map(col)
    val micros = unix_micros(col(tsCol))
    val withCell = df.withColumn("__cell", floor(micros / minGapMicros))
    // per occupied (key, cell): min/max event time — mergeable, parallel
    val cells = withCell.groupBy(kc :+ col("__cell"): _*)
      .agg(min(micros).as("__min"), max(micros).as("__max"))
    // chunk heads over the cell table: a head cell either follows a
    // fully-empty cell (gap > width = minGap by construction) or starts
    // ≥ minGap after the previous occupied cell's last event
    val w = Window.partitionBy(kc: _*).orderBy(col("__cell"))
    val chunked = cells
      .withColumn("__prevCell", lag(col("__cell"), 1).over(w))
      .withColumn("__prevMax", lag(col("__max"), 1).over(w))
      .withColumn("__head",
        col("__prevCell").isNull || col("__cell") > col("__prevCell") + 1 ||
          col("__min") - col("__prevMax") >= minGapMicros)
      .withColumn("__chunk", sum(col("__head").cast("long")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(kc :+ col("__cell") :+ col("__chunk"): _*)
    val tagged = withCell.join(chunked, keys :+ "__cell")
    val schema = tagged.schema
    val keyIdx = (keys :+ "__chunk").map(schema.fieldIndex)
    val grouped = tagged.groupByKey { r: Row =>
      keyIdx.map(i => String.valueOf(r.get(i))).mkString("\u0000")
    }(Encoders.STRING)
    scanSortedGroups(grouped, schema, tsCol, minGapMicros, tiebreak)
      .drop("__cell", "__chunk")
  }

  /** The greedy kept-scan: O(1) state, groups stream through sorted. */
  private def scanSortedGroups(
      grouped: org.apache.spark.sql.KeyValueGroupedDataset[String, Row],
      schema: StructType, tsCol: String, minGapMicros: Long,
      tiebreak: Seq[String]): DataFrame = {
    val tsIdx = schema.fieldIndex(tsCol)
    val sortCols: Seq[Column] = (tsCol +: tiebreak).map(col)
    grouped.flatMapSortedGroups(sortCols: _*) { (_, it: Iterator[Row]) =>
      var lastKept = Long.MinValue
      it.filter { r =>
        val ts = r.getAs[java.sql.Timestamp](tsIdx)
        val micros = ts.getTime / 1000L * 1000000L + ts.getNanos / 1000L
        val keep = lastKept == Long.MinValue || micros >= lastKept + minGapMicros
        if (keep) lastKept = micros
        keep
      }
    }(Encoders.row(schema))
  }
}
