package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import graft.pipeline.{ConnectedComponents, Dedup, DedupConfig, SubstringDup}

/** Structured-Streaming incremental near-dup ingestion — the streaming form
  * of the reference's add-then-query workflow (`tools/addfunctionstoindex
  * .cpp:32-91` adds signatures to a persistent index; `tools/
  * matchfunctionsfromindex.cpp:120-196` probes it): new image rows stream
  * in, are featurized and banded, probed against the band index accumulated
  * so far, and appended to it — so duplicate decisions are available
  * continuously instead of per full batch rerun.
  *
  * Shape per micro-batch (inside `foreachBatch`, where the batch is an
  * ordinary DataFrame and the whole batch pipeline is reusable):
  *
  *   1. `Dedup.signatures` + `Dedup.bands` over the new rows only —
  *      featurize cost is strictly per-arrival, never re-paid.
  *   2. The accumulated index is filtered to buckets TOUCHED by new rows
  *      (left-semi on (band_id, band_key)) — the streaming analog of the
  *      reference's `lower_bound` bucket probe. At cluster scale the index
  *      table is partitioned by bucket hash so this prunes file reads; the
  *      probe never scans the whole index.
  *   3. `Dedup.candidates` runs its sorted-neighbor pass over (touched old
  *      rows ∪ new rows); `Dedup.verified` applies the same Hamming /
  *      MinHash-Jaccard acceptance as the batch pipeline, so every emitted
  *      pair satisfies the exact batch acceptance predicate.
  *   4. Verified pairs append to a pair log; new band rows and signatures
  *      append to the index — both are idempotent-by-dedup (the pair log is
  *      `distinct`-ed at cluster time), so a replayed micro-batch (streaming
  *      checkpoint recovery) cannot corrupt results.
  *
  * Clustering stays a periodic batch job over the pair log
  * (`clustersFromState`) — connected components is a global fixpoint and
  * belongs outside the per-batch path.
  */
object StreamingDedup {

  /** Input schema per the corpus contract (`ImageRow`). */
  val imageSchema: StructType = StructType(Seq(
    StructField("image_id", StringType, nullable = false),
    StructField("bytes", BinaryType, nullable = true),
    StructField("w", IntegerType, nullable = false),
    StructField("h", IntegerType, nullable = false),
    StructField("fmt", StringType, nullable = true),
    StructField("caption", StringType, nullable = true),
    StructField("phash", LongType, nullable = false)))

  private def exists(spark: SparkSession, path: String): Boolean =
    new java.io.File(path.stripPrefix("file:")).exists

  /** One micro-batch: probe new rows against the accumulated index, log
    * verified pairs, grow the index. Pure DataFrame logic — callable
    * directly for tests and from `foreachBatch` in the streaming query.
    *
    * With `metrics = true`, appends one observability row per batch to
    * `<stateDir>/metrics` (north rule: lineage + metrics tables): batch id,
    * new rows, bucket-probed index rows, candidate and accepted pair counts.
    * Off by default — the counts cost one extra job each. */
  def processBatch(spark: SparkSession, batch: DataFrame, stateDir: String,
      cfg: DedupConfig, batchId: Long = -1L, metrics: Boolean = false): Unit = {
    if (batch.isEmpty) return
    val sigs = Dedup.signatures(batch, cfg).localCheckpoint()
    val newBands = Dedup.bands(sigs, cfg).localCheckpoint()
    val indexPath = s"$stateDir/index"
    val sigsPath = s"$stateDir/sigs"
    val oldBands =
      if (exists(spark, indexPath)) spark.read.parquet(indexPath)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], newBands.schema)
    val oldSigs =
      if (exists(spark, sigsPath)) spark.read.parquet(sigsPath)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], sigs.schema)
    // bucket probe: only index rows sharing a bucket with a new row matter
    val touched = newBands.select("band_id", "band_key").distinct()
    val relevant = oldBands
      .join(touched, Seq("band_id", "band_key"), "left_semi")
      .union(newBands)
    val cands = Dedup.candidates(relevant, cfg).localCheckpoint()
    val verifiedPairs = Dedup.verified(cands, oldSigs.union(sigs), cfg)
    // incremental substring pass: only joins touching a NEW row — new
    // anchors vs all windows (new text contained in anything) plus old
    // anchors vs new windows (anything contained in new text). Anchor and
    // window hash tables are state, so old texts are never re-hashed.
    val w = cfg.substringWindow
    val newTexts = sigs.select(col("image_id").as("id"),
      col("caption_norm").as("text"))
    val newAnch = SubstringDup.anchorTable(newTexts, w).localCheckpoint()
    val newWins = SubstringDup.windowTable(newTexts, w).localCheckpoint()
    val anchPath = s"$stateDir/ss_anchors"
    val winsPath = s"$stateDir/ss_windows"
    val oldAnch =
      if (exists(spark, anchPath)) spark.read.parquet(anchPath)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], newAnch.schema)
    val oldWins =
      if (exists(spark, winsPath)) spark.read.parquet(winsPath)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], newWins.schema)
    val ssCands = newAnch.join(oldWins.union(newWins), "k")
      .union(oldAnch.join(newWins, "k"))
      .filter(col("a") =!= col("b"))
      .select(col("a"), col("b"))
      .distinct()
    val allTexts = oldSigs.union(sigs).select(col("image_id").as("id"),
      col("caption_norm").as("text"))
    val ssPairs = SubstringDup.verifyContained(ssCands, allTexts)
    // the five output tables are independent checkpointed plans — submit
    // them as concurrent Spark jobs instead of five serial write barriers
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val allPairs = verifiedPairs.union(ssPairs)
    val batchPairs =
      if (metrics) allPairs.localCheckpoint() else allPairs
    Await.result(Future.sequence(Seq(
      Future(batchPairs.write.mode("append").parquet(s"$stateDir/pairs")),
      Future(newBands.write.mode("append").parquet(indexPath)),
      Future(sigs.write.mode("append").parquet(sigsPath)),
      Future(newAnch.write.mode("append").parquet(anchPath)),
      Future(newWins.write.mode("append").parquet(winsPath)))), Duration.Inf)
    if (metrics) {
      import spark.implicits._
      Seq((batchId, sigs.count(), oldBands
          .join(touched, Seq("band_id", "band_key"), "left_semi").count(),
          cands.count(), batchPairs.count()))
        .toDF("batch_id", "new_rows", "index_rows_probed",
          "candidate_pairs", "pairs_appended")
        .coalesce(1).write.mode("append").parquet(s"$stateDir/metrics")
    }
    ()
  }

  /** Launch the streaming query over a parquet directory source. With
    * `Trigger.AvailableNow` it drains existing files in bounded micro-batches
    * and stops — the test/verify mode; with a processing-time trigger it
    * tails the directory indefinitely — the production mode. */
  def run(spark: SparkSession, inputDir: String, stateDir: String,
      cfg: DedupConfig = DedupConfig(),
      trigger: Trigger = Trigger.AvailableNow(),
      maxFilesPerTrigger: Int = 4, metrics: Boolean = false): StreamingQuery = {
    val stream = spark.readStream
      .schema(imageSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(inputDir)
    stream.writeStream
      .outputMode("update")
      .option("checkpointLocation", s"$stateDir/checkpoint")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(spark, batch, stateDir, cfg, batchId, metrics)
      }
      .start()
  }

  /** Periodic clustering over the accumulated pair log: connected
    * components across every id seen so far. The pair log may hold
    * duplicate pairs from bucket re-probes / replayed batches —
    * `ConnectedComponents` symmetrizes + distincts the edge set — and the
    * signature log may hold duplicate ids from a replayed batch (state
    * appended, checkpoint not yet committed), so the vertex set is
    * explicitly distinct-ed: the output has exactly one row per image.
    * An empty/absent state (stream started, nothing ingested yet) yields
    * an empty result, not an error. */
  def clustersFromState(spark: SparkSession, stateDir: String): DataFrame = {
    import spark.implicits._
    if (!exists(spark, s"$stateDir/sigs"))
      return Seq.empty[(String, String)].toDF("image_id", "cluster_id")
    val ids = spark.read.parquet(s"$stateDir/sigs")
      .select(col("image_id").as("id")).distinct()
    val pairs =
      if (exists(spark, s"$stateDir/pairs"))
        spark.read.parquet(s"$stateDir/pairs")
      else Seq.empty[(String, String)].toDF("a", "b")
    ConnectedComponents.run(spark, pairs, ids)
      .withColumnRenamed("id", "image_id")
  }
}
