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
  *   4. Verified pairs, band rows, signatures, and substring hash tables
  *      each land in a batch-keyed subdirectory written with OVERWRITE
  *      (`<table>/batch_<id>`), so a replayed micro-batch (streaming
  *      checkpoint recovery after a crash between state write and offset
  *      commit) overwrites its own previous attempt instead of appending a
  *      duplicate copy — duplicated band rows would otherwise consume
  *      sliding-window slots and push true neighbors out of the W-row
  *      window. State reads are recursive over the batch subdirectories.
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

  /** Hadoop-FS existence check — a java.io.File probe would silently report
    * false for any non-local state dir (hdfs://, s3a://). */
  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  /** The batch subdirectories of a state table, via the Hadoop FS API
    * (works on any supported filesystem), optionally excluding one batch. */
  private def batchDirs(spark: SparkSession, path: String,
      excludeBatch: Option[Long]): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.filter(_.isDirectory)
      .map(_.getPath.toString)
      .filterNot(d => excludeBatch.exists(b => d.endsWith(s"/batch_$b")))
  }

  /** Read an accumulated state table (batch-keyed subdirectories) or an
    * empty frame of the given schema if nothing is committed yet.
    *
    * `excludeBatch` MUST name the batch currently being processed: on a
    * checkpoint-recovery replay its subdirectory already exists from the
    * failed attempt, and reading it as "old" state would (a) race the
    * overwrite that is about to delete those files and (b) treat the new
    * rows as already indexed, duplicating them in the probe. */
  private def readState(spark: SparkSession, path: String,
      schema: StructType, excludeBatch: Option[Long]): DataFrame = {
    val dirs = batchDirs(spark, path, excludeBatch)
    if (dirs.isEmpty) spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(dirs: _*)
  }

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
    // batch-keyed overwrite = replay idempotence: `batchId` must be unique
    // per DISTINCT batch (the streaming engine guarantees this); a replay
    // of the same batch reuses the id and overwrites its own subdirectory
    def batchDir(table: String) = s"$table/batch_$batchId"
    val self = Some(batchId)
    val oldBands = readState(spark, indexPath, newBands.schema, self)
    val oldSigs = readState(spark, sigsPath, sigs.schema, self)
    // bucket probe: only index rows sharing a bucket with a new row matter
    val touched = newBands.select("band_id", "band_key").distinct()
    val relevant = oldBands
      .join(touched, Seq("band_id", "band_key"), "left_semi")
      .union(newBands)
    val cands = Dedup.candidatesMaterialized(relevant, cfg)
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
    val oldAnch = readState(spark, anchPath, newAnch.schema, self)
    val oldWins = readState(spark, winsPath, newWins.schema, self)
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
      Future(batchPairs.write.mode("overwrite")
        .parquet(batchDir(s"$stateDir/pairs"))),
      Future(newBands.write.mode("overwrite").parquet(batchDir(indexPath))),
      Future(sigs.write.mode("overwrite").parquet(batchDir(sigsPath))),
      Future(newAnch.write.mode("overwrite").parquet(batchDir(anchPath))),
      Future(newWins.write.mode("overwrite").parquet(batchDir(winsPath))))),
      Duration.Inf)
    if (metrics) {
      import spark.implicits._
      Seq((batchId, sigs.count(), oldBands
          .join(touched, Seq("band_id", "band_key"), "left_semi").count(),
          cands.count(), batchPairs.count()))
        .toDF("batch_id", "new_rows", "index_rows_probed",
          "candidate_pairs", "pairs_appended")
        .coalesce(1).write.mode("overwrite")
        .parquet(batchDir(s"$stateDir/metrics"))
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
    val sigDirs = batchDirs(spark, s"$stateDir/sigs", None)
    if (sigDirs.isEmpty)
      return Seq.empty[(String, String)].toDF("image_id", "cluster_id")
    val ids = spark.read.parquet(sigDirs: _*)
      .select(col("image_id").as("id")).distinct()
    val pairDirs = batchDirs(spark, s"$stateDir/pairs", None)
    val pairs =
      if (pairDirs.nonEmpty) spark.read.parquet(pairDirs: _*).select("a", "b")
      else Seq.empty[(String, String)].toDF("a", "b")
    ConnectedComponents.run(spark, pairs, ids)
      .withColumnRenamed("id", "image_id")
  }
}
