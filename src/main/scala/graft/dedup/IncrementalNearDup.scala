package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.functions.MinHash

/** Streaming twin of [[NearDup.minhashPairs]]: LSH index MAINTENANCE.
  *
  * A batch LSH run re-sketches the whole corpus; a growing corpus needs
  * the incremental contract instead — new documents are checked against
  * the PERSISTED signature/band index and appended to it, so each
  * micro-batch costs O(batch + touched buckets), never O(corpus). This
  * is the composition of the reference's continuous import cycle
  * (RunJob per schedule → here StreamingImport-style foreachBatch) with
  * the LSH dedup family.
  *
  * Index layout under `indexDir`:
  *   - `sigs`:  (id, sig, sset) — minhash signature + hashed shingle set
  *              per doc (the shingle set makes exact verification
  *              possible without re-reading document text)
  *   - `bands`: (id, band, bucket) — the LSH postings list
  *
  * Scale shape per batch: the batch's (band, bucket) key set is tiny and
  * broadcast — the index postings are semi-joined down to touched
  * buckets before any pair work, so the quadratic stage only ever sees
  * bucket-mates of new documents. Appends are append-only parquet (a
  * table format slots in unchanged). The pair stream is EXACTLY what the
  * batch run would emit: new×new pairs within the batch plus new×old
  * pairs against the index — old×old pairs were emitted when their
  * younger member arrived (proven by the batch-equality spec).
  */
object IncrementalNearDup {

  /** Process one batch of new documents: returns the verified pair set
    * involving at least one batch document, and appends the batch's
    * sketches to the index. Documents whose id is already indexed are
    * skipped (append-only corpus contract).
    */
  def processBatch(batch: DataFrame, idCol: String, textCol: String,
                   indexDir: String, numHashes: Int = 64, bands: Int = 16,
                   shingleLen: Int = 3, threshold: Double = 0.8): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val spark = batch.sparkSession
    val rows = numHashes / bands
    val indexExists = new java.io.File(s"$indexDir/sigs").exists()

    val incoming = batch.select(col(idCol).as("id"), col(textCol).as("text"))
    val fresh = if (indexExists) {
      val knownIds = spark.read.parquet(s"$indexDir/sigs").select("id")
      incoming.join(knownIds, Seq("id"), "left_anti")
    } else incoming

    // localCheckpoint (eager), NOT persist: the batch sketches are later
    // APPENDED to the very files their lineage reads (the known-id
    // anti-join scans the index) — a cached-but-lineage-bearing plan
    // would be invalidated and silently recomputed against the
    // just-appended index (Spark recaches by path on write), turning
    // `fresh` empty. Cutting lineage makes the append unable to reach
    // back into the computation.
    val sigsNew = fresh.select(col("id"),
      MinHash.minhashSignature(col("text"), numHashes, shingleLen).as("sig"),
      NearDup.shingles(col("text"), shingleLen).as("sset")).localCheckpoint(true)
    val bandsNew = NearDup.bandBuckets(sigsNew, bands, rows).persist()

    val newNew = NearDup.bucketPairs(bandsNew, Seq("band", "bucket"))
    val cand = (if (indexExists) {
      val postings = spark.read.parquet(s"$indexDir/bands")
      // broadcast the batch's bucket keys; the index is pruned to
      // touched buckets before any pair enumeration
      val touched = postings.join(
        broadcast(bandsNew.select("band", "bucket").distinct()),
        Seq("band", "bucket"), "left_semi")
      val newOld = bandsNew.select(col("band"), col("bucket"), col("id").as("id_new"))
        .join(touched.select(col("band"), col("bucket"), col("id").as("id_old")),
          Seq("band", "bucket"))
        .filter(col("id_new") =!= col("id_old"))
        .select(least(col("id_new"), col("id_old")).as("id_a"),
          greatest(col("id_new"), col("id_old")).as("id_b"))
      newNew.unionByName(newOld)
    } else newNew).dropDuplicates("id_a", "id_b").persist()

    // verification features: batch sketches + (for new×old pairs) the
    // index sketches of candidate ids only — semi-join prunes the read
    val candIds = cand.select(col("id_a").as("id"))
      .unionByName(cand.select(col("id_b").as("id"))).distinct()
    val allSigs = (if (indexExists)
      spark.read.parquet(s"$indexDir/sigs").unionByName(sigsNew)
    else sigsNew.toDF())
      .join(candIds, Seq("id"), "left_semi")

    val featA = allSigs.select(col("id").as("id_a"),
      col("sig").as("sig_a"), col("sset").as("set_a"))
    val featB = allSigs.select(col("id").as("id_b"),
      col("sig").as("sig_b"), col("sset").as("set_b"))
    val verified = cand.join(featA, Seq("id_a")).join(featB, Seq("id_b"))
      .withColumn("est_jaccard", round(
        size(filter(zip_with(col("sig_a"), col("sig_b"), (a, b) => a === b),
          x => x)).cast("double") / numHashes, 4))
      .withColumn("jaccard", round(
        size(array_intersect(col("set_a"), col("set_b"))).cast("double") /
          greatest(size(array_union(col("set_a"), col("set_b"))), lit(1)).cast("double"), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("est_jaccard"), col("jaccard"))
      // materialized AND lineage-cut: the appends below touch the index
      // files this plan read, so a mere persist would be refreshed-by-path
      // into recomputing against the grown index (empty result)
      .localCheckpoint(true)

    // append the batch to the index AFTER the pair computation read it
    sigsNew.write.mode("append").parquet(s"$indexDir/sigs")
    bandsNew.write.mode("append").parquet(s"$indexDir/bands")
    bandsNew.unpersist(); cand.unpersist()
    verified
  }

  /** Compact the append-only index: every micro-batch appends small
    * files to sigs/bands, so file count grows with batch count and the
    * per-batch pruned reads slow down over time. Rewrites both tables
    * into `targetFiles` files each (bands repartitioned BY bucket so
    * the postings for one bucket co-locate — the read pattern every
    * batch runs). Atomic-enough for a paused stream: rewrite to a temp
    * dir, then swap; run between batches (the operational complement a
    * table format would give for free).
    */
  def compactIndex(spark: SparkSession, indexDir: String,
                   targetFiles: Int = 8): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    def swapIn(name: String)(write: String => Unit): Unit = {
      val tmp = s"$indexDir/__compact_$name"
      write(tmp)
      val live = new org.apache.hadoop.fs.Path(s"$indexDir/$name")
      fs.delete(live, true)
      fs.rename(new org.apache.hadoop.fs.Path(tmp), live)
    }
    swapIn("sigs") { tmp =>
      spark.read.parquet(s"$indexDir/sigs").localCheckpoint(true)
        .repartition(targetFiles).write.parquet(tmp)
    }
    swapIn("bands") { tmp =>
      spark.read.parquet(s"$indexDir/bands").localCheckpoint(true)
        .repartition(targetFiles, col("band"), col("bucket")).write.parquet(tmp)
    }
  }

  /** Continuous LSH maintenance: each micro-batch's verified pairs are
    * appended to `pairsDir`, its sketches to the index.
    */
  def start(stream: DataFrame, idCol: String, textCol: String,
            indexDir: String, pairsDir: String, checkpoint: String,
            numHashes: Int = 64, bands: Int = 16, shingleLen: Int = 3,
            threshold: Double = 0.8): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val pairs = processBatch(batch, idCol, textCol, indexDir,
          numHashes, bands, shingleLen, threshold)
        pairs.write.mode("append").parquet(pairsDir)
        pairs.unpersist()
        ()
      }
      .start()
}
