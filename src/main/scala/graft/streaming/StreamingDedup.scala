package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  * == State layout (the scale contract) ==
  *
  * The reference's probe touches ~3.6M of 50M index entries — bucket-local,
  * never the whole index (`searchbackend/simhashsearchindex.hpp:40-86`).
  * The streaming state mirrors that with a two-tier, bucket-partitioned
  * layout per table:
  *
  *   <table>/base_<id>/p=<k>/...parquet   one compacted tier, partitioned by
  *                                        bucket hash (`p = hash(bucket
  *                                        key) % stateP`), rows sorted by
  *                                        bucket key within each partition
  *   <table>/batch_<id>/...parquet        one small dir per micro-batch not
  *                                        yet compacted (< compactEvery of
  *                                        these exist at any time)
  *
  * A probe reads ONLY the base partitions whose `p` the new rows touch
  * (computed from the new band/key set — directory-level pruning, the
  * columnar analog of the reference's `lower_bound` bucket seek) plus the
  * few uncompacted batch dirs, then refines with an exact left-semi join on
  * the bucket key. Old signatures are pruned the same way to the partitions
  * containing this batch's CANDIDATE ids (the only rows the MinHash/
  * substring verify can reference), so per-batch read cost is proportional
  * to touched buckets + recent arrivals, never to stream history. Every
  * `compactEvery` batches the committed batch dirs fold into a new base, so
  * file counts stay bounded (≈ stateP + compactEvery·tables) instead of
  * growing 5 dirs per batch forever. `stateP` is sized so a typical
  * micro-batch touches a minority of partitions (bigger index / smaller
  * batches → raise it; it plays the role of Iceberg's `bucket(band_key)`
  * partition spec at cluster scale).
  *
  * == Replay / crash safety ==
  *
  *   1. Batch-keyed OVERWRITE per table (`<table>/batch_<id>`): a replayed
  *      micro-batch (checkpoint recovery between state write and offset
  *      commit) overwrites its own previous attempt instead of appending a
  *      duplicate copy — duplicated band rows would otherwise consume
  *      sliding-window slots and push true neighbors out of the W-row
  *      window.
  *   2. `_done` commit markers: a batch/base dir is visible to readers only
  *      after a `_done` file lands (written after ALL of the dir's writes
  *      finish; deleted FIRST on replay before the overwrites). A
  *      concurrent `clustersFromState` (the documented periodic-clustering
  *      mode) can therefore never observe a half-written batch — pairs
  *      present but sigs absent, or files vanishing mid-overwrite.
  *   3. Compaction only folds batches OLDER than the current one — their
  *      offsets are already committed, so they can never be replayed — and
  *      commits via write-to-tmp → `_done` → atomic rename. Readers take
  *      the newest complete base and ignore any batch dir it subsumes, so a
  *      crash between rename and cleanup leaves duplicates invisible.
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

  /** File-level cost of one batch's pruned state reads (metrics row). */
  final case class ReadStats(filesRead: Long, filesTotal: Long) {
    def +(o: ReadStats): ReadStats =
      ReadStats(filesRead + o.filesRead, filesTotal + o.filesTotal)
  }

  private val Zero = ReadStats(0L, 0L)
  private val BaseRe = "base_(-?\\d+)".r
  private val BatchRe = "batch_(-?\\d+)".r

  private def fileSystem(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  private def isCommitted(fs: FileSystem, dir: Path): Boolean =
    fs.exists(new Path(dir, "_done"))

  private def markDone(fs: FileSystem, dir: Path): Unit = {
    val out = fs.create(new Path(dir, "_done"), true)
    out.close()
  }

  private def clearDone(fs: FileSystem, dir: Path): Unit = {
    val m = new Path(dir, "_done")
    if (fs.exists(m)) { fs.delete(m, false); () }
  }

  /** Committed state of one table: the newest complete base compaction (if
    * any) and every complete batch dir NEWER than it, excluding the batch
    * currently being processed. Dirs without `_done` (in-flight, torn) and
    * batch dirs subsumed by the base (survivors of a crash between
    * compaction rename and cleanup) are ignored. */
  private case class Committed(base: Option[Path], batches: Seq[(Long, Path)])

  private def committedDirs(fs: FileSystem, table: Path,
      excludeBatch: Option[Long]): Committed = {
    if (!fs.exists(table)) return Committed(None, Nil)
    val entries = fs.listStatus(table).toSeq.filter(_.isDirectory)
    val bases = entries.flatMap { st =>
      st.getPath.getName match {
        case BaseRe(id) if isCommitted(fs, st.getPath) =>
          Some((id.toLong, st.getPath))
        case _ => None
      }
    }
    val base = if (bases.isEmpty) None else Some(bases.maxBy(_._1))
    val floor = base.map(_._1)
    val batches = entries.flatMap { st =>
      st.getPath.getName match {
        case BatchRe(id) if isCommitted(fs, st.getPath) &&
            !excludeBatch.contains(id.toLong) &&
            floor.forall(id.toLong > _) =>
          Some((id.toLong, st.getPath))
        case _ => None
      }
    }.sortBy(_._1)
    Committed(base.map(_._2), batches)
  }

  private def parquetFiles(fs: FileSystem, dir: Path): Long =
    if (!fs.exists(dir)) 0L
    else {
      val it = fs.listFiles(dir, true)
      var n = 0L
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) n += 1
      }
      n
    }

  /** Base partitions selected by the touched-partition set: `p=<k>` subdirs
    * with k ∈ touched (None = no pruning, read all). An UNPARTITIONED base
    * (the pair log — nothing probes it by key) has no `p=` subdirs and is
    * returned whole. */
  private def basePartDirs(fs: FileSystem, base: Path,
      touchedP: Option[Set[Int]]): Seq[Path] = {
    val parts = fs.listStatus(base).toSeq.filter(_.isDirectory)
      .map(_.getPath).filter(_.getName.startsWith("p="))
    if (parts.isEmpty) Seq(base)
    else touchedP match {
      case None => parts
      case Some(set) =>
        parts.filter(p => p.getName.stripPrefix("p=").toIntOption.exists(set))
    }
  }

  private def emptyDf(spark: SparkSession, schema: StructType): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** Read a table's committed state, pruned: base partitions restricted to
    * `touchedP`; uncompacted batch dirs always read in full (they are few
    * and small by construction). Returns the frame plus file-level read
    * stats when `wantStats`. */
  private def readState(spark: SparkSession, tablePath: String,
      schema: StructType, excludeBatch: Option[Long],
      touchedP: Option[Set[Int]],
      wantStats: Boolean): (DataFrame, ReadStats) = {
    val (fs, table) = fileSystem(spark, tablePath)
    val c = committedDirs(fs, table, excludeBatch)
    val baseDirs = c.base.toSeq.flatMap(basePartDirs(fs, _, touchedP))
    val dirs = (baseDirs ++ c.batches.map(_._2)).map(_.toString)
    val df =
      if (dirs.isEmpty) emptyDf(spark, schema)
      else spark.read.schema(schema).parquet(dirs: _*)
    val stats =
      if (!wantStats) Zero
      else {
        val read = dirs.map(d => parquetFiles(fs, new Path(d))).sum
        val total = (c.base.toSeq ++ c.batches.map(_._2))
          .map(parquetFiles(fs, _)).sum
        ReadStats(read, total)
      }
    (df, stats)
  }

  private def partCol(cols: Seq[Column], p: Int): Column =
    pmod(xxhash64(cols: _*), lit(p.toLong)).cast("int")

  /** The distinct state-partition numbers the key columns take over `df` —
    * the touched-partition set driving directory pruning. Uses `partCol`
    * itself so read- and write-side partitioning can never diverge. */
  private def touchedPartitions(df: DataFrame, keys: Seq[Column],
      p: Int): Set[Int] =
    df.select(partCol(keys, p).as("p"))
      .distinct().collect().map(_.getInt(0)).toSet

  /** Fold the committed base + all batch dirs OLDER than `currentBatch` into
    * a new base (partitioned by `partKeys` hash when given, rows sorted by
    * `sortCols` for parquet min/max locality), then drop the consumed dirs.
    * Only ever touches batches whose offsets the streaming engine has
    * already committed — the current (replayable) batch is never folded. */
  private def compactTable(spark: SparkSession, tablePath: String,
      schema: StructType, currentBatch: Long, partKeys: Option[Seq[Column]],
      sortCols: Seq[Column], stateP: Int): Unit = {
    val (fs, table) = fileSystem(spark, tablePath)
    val c = committedDirs(fs, table, excludeBatch = Some(currentBatch))
    if (c.batches.isEmpty) return
    val newId = c.batches.map(_._1).max
    val dirs = (c.base.toSeq.flatMap(basePartDirs(fs, _, None)) ++
      c.batches.map(_._2)).map(_.toString)
    val all = spark.read.schema(schema).parquet(dirs: _*)
    val tmp = new Path(table, s".base_$newId.tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    partKeys match {
      case Some(keys) =>
        all.withColumn("p", partCol(keys, stateP))
          .repartition(col("p"))
          .sortWithinPartitions(col("p") +: sortCols: _*)
          .write.partitionBy("p").mode("overwrite").parquet(tmp.toString)
      case None =>
        all.coalesce(4).write.mode("overwrite").parquet(tmp.toString)
    }
    markDone(fs, tmp)
    val dest = new Path(table, s"base_$newId")
    if (fs.exists(dest)) fs.delete(dest, true) // stale replay leftover
    require(fs.rename(tmp, dest), s"compaction rename failed: $tmp -> $dest")
    // cleanup is best-effort: the reader rule (newest base subsumes every
    // older batch/base) keeps leftovers invisible if a delete is lost
    c.base.foreach(b => fs.delete(b, true))
    c.batches.foreach { case (_, d) => fs.delete(d, true) }
  }

  /** One micro-batch: probe new rows against the accumulated index, log
    * verified pairs, grow the index, compact on cadence. Pure DataFrame
    * logic — callable directly for tests and from `foreachBatch` in the
    * streaming query.
    *
    * With `metrics = true`, appends one observability row per batch to
    * `<stateDir>/metrics` (north rule: lineage + metrics tables): batch id,
    * new rows, bucket-probed index rows, candidate and accepted pair
    * counts, and state files read vs present (the prune ratio). Off by
    * default — the counts cost one extra job each.
    *
    * `batchId` must be unique per DISTINCT batch and monotonically
    * increasing (the streaming engine guarantees both); a replay of the
    * same batch reuses the id and overwrites its own subdirectory. */
  def processBatch(spark: SparkSession, batch: DataFrame, stateDir: String,
      cfg: DedupConfig, batchId: Long = -1L, metrics: Boolean = false,
      stateP: Int = 64, compactEvery: Int = 8): Unit = {
    if (batch.isEmpty) return
    val sigs = Dedup.signatures(batch, cfg).localCheckpoint()
    val newBands = Dedup.bands(sigs, cfg).localCheckpoint()
    val indexPath = s"$stateDir/index"
    val sigsPath = s"$stateDir/sigs"
    val anchPath = s"$stateDir/ss_anchors"
    val winsPath = s"$stateDir/ss_windows"
    val pairsPath = s"$stateDir/pairs"
    def batchDir(table: String) = s"$table/batch_$batchId"
    val self = Some(batchId)
    // replay: withdraw this batch's commit markers BEFORE touching its
    // files, so a concurrent clustersFromState never reads mid-overwrite
    val (fsRoot, _) = fileSystem(spark, stateDir)
    Seq(indexPath, sigsPath, anchPath, winsPath, pairsPath)
      .foreach(t => clearDone(fsRoot, new Path(batchDir(t))))
    // bucket probe, two levels: (1) directory prune — only base partitions
    // holding a bucket this batch touches are even listed; (2) exact
    // left-semi on the bucket key
    val touchedIdxP = touchedPartitions(newBands,
      Seq(col("band_id"), col("band_key")), stateP)
    val (oldBands, idxStats) = readState(spark, indexPath, newBands.schema,
      self, Some(touchedIdxP), metrics)
    val touched = newBands.select("band_id", "band_key").distinct()
    val relevantOld = oldBands
      .join(touched, Seq("band_id", "band_key"), "left_semi")
    val relevant = relevantOld.union(newBands)
    val cands = Dedup.candidatesMaterialized(relevant, cfg)
    // incremental substring pass: only joins touching a NEW row — new
    // anchors vs all windows (new text contained in anything) plus old
    // anchors vs new windows (anything contained in new text). Anchor and
    // window hash tables are state, so old texts are never re-hashed; the
    // equi-join key is `k`, so old-side reads prune to the partitions of
    // the NEW side's keys.
    val w = cfg.substringWindow
    val newTexts = sigs.select(col("image_id").as("id"),
      col("caption_norm").as("text"))
    val newAnch = SubstringDup.anchorTable(newTexts, w).localCheckpoint()
    val newWins = SubstringDup.windowTable(newTexts, w).localCheckpoint()
    val (oldAnch, anchStats) = readState(spark, anchPath, newAnch.schema, self,
      Some(touchedPartitions(newWins, Seq(col("k")), stateP)), metrics)
    val (oldWins, winStats) = readState(spark, winsPath, newWins.schema, self,
      Some(touchedPartitions(newAnch, Seq(col("k")), stateP)), metrics)
    val ssCands = newAnch.join(oldWins.union(newWins), "k")
      .union(oldAnch.join(newWins, "k"))
      .filter(col("a") =!= col("b"))
      .select(col("a"), col("b"))
      .distinct()
      .localCheckpoint()
    // old signatures: the MinHash verify and the substring contains-check
    // only ever dereference ids that appear in a candidate pair — prune the
    // signature read to exactly those ids' partitions
    val candIds = cands.select(col("a").as("id"))
      .union(cands.select(col("b").as("id")))
      .union(ssCands.select(col("a").as("id")))
      .union(ssCands.select(col("b").as("id")))
    val (oldSigs, sigStats) = readState(spark, sigsPath, sigs.schema, self,
      Some(touchedPartitions(candIds, Seq(col("id")), stateP)), metrics)
    val allSigs = oldSigs.union(sigs)
    val verifiedPairs = Dedup.verified(cands, allSigs, cfg)
    val allTexts = allSigs.select(col("image_id").as("id"),
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
    val writes = Seq(
      batchPairs -> batchDir(pairsPath),
      newBands -> batchDir(indexPath),
      sigs -> batchDir(sigsPath),
      newAnch -> batchDir(anchPath),
      newWins -> batchDir(winsPath))
    Await.result(Future.sequence(writes.map { case (df, dir) =>
      Future(df.coalesce(4).write.mode("overwrite").parquet(dir))
    }), Duration.Inf)
    // commit markers only after every file of every table is in place
    writes.foreach { case (_, dir) => markDone(fsRoot, new Path(dir)) }
    if (metrics) {
      import spark.implicits._
      val st = idxStats + anchStats + winStats + sigStats
      Seq((batchId, sigs.count(), relevantOld.count(),
          cands.count(), batchPairs.count(), st.filesRead, st.filesTotal))
        .toDF("batch_id", "new_rows", "index_rows_probed",
          "candidate_pairs", "pairs_appended",
          "state_files_read", "state_files_total")
        .coalesce(1).write.mode("overwrite")
        .parquet(batchDir(s"$stateDir/metrics"))
    }
    // compaction cadence: enough committed PRE-current batches -> fold them
    // (and the previous base) into a new bucket-partitioned base
    val (fsIdx, idxTable) = fileSystem(spark, indexPath)
    val nCommitted =
      committedDirs(fsIdx, idxTable, excludeBatch = self).batches.size
    if (nCommitted >= compactEvery) {
      compactTable(spark, indexPath, newBands.schema, batchId,
        Some(Seq(col("band_id"), col("band_key"))),
        Seq(col("band_id"), col("band_key")), stateP)
      compactTable(spark, sigsPath, sigs.schema, batchId,
        Some(Seq(col("image_id"))), Seq(col("image_id")), stateP)
      compactTable(spark, anchPath, newAnch.schema, batchId,
        Some(Seq(col("k"))), Seq(col("k")), stateP)
      compactTable(spark, winsPath, newWins.schema, batchId,
        Some(Seq(col("k"))), Seq(col("k")), stateP)
      compactTable(spark, pairsPath, batchPairs.schema, batchId,
        None, Nil, stateP)
    }
    ()
  }

  /** Launch the streaming query over a parquet directory source. With
    * `Trigger.AvailableNow` it drains existing files in bounded micro-batches
    * and stops — the test/verify mode; with a processing-time trigger it
    * tails the directory indefinitely — the production mode.
    *
    * Exactly ONE running query may own a given `stateDir` (and its
    * checkpoint) — see StreamJob's ownership note. `stateP` is the state
    * bucket-partition count (raise it as the index grows so probes keep
    * pruning); `compactEvery` is the compaction cadence in batches. */
  def run(spark: SparkSession, inputDir: String, stateDir: String,
      cfg: DedupConfig = DedupConfig(),
      trigger: Trigger = Trigger.AvailableNow(),
      maxFilesPerTrigger: Int = 4, metrics: Boolean = false,
      stateP: Int = 64, compactEvery: Int = 8): StreamingQuery = {
    val stream = spark.readStream
      .schema(imageSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(inputDir)
    stream.writeStream
      .outputMode("update")
      .option("checkpointLocation", s"$stateDir/checkpoint")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(spark, batch, stateDir, cfg, batchId, metrics,
          stateP, compactEvery)
      }
      .start()
  }

  /** Per-batch metrics rows accumulated so far (empty frame if none). */
  def metricsFromState(spark: SparkSession, stateDir: String): DataFrame = {
    import spark.implicits._
    val (fs, table) = fileSystem(spark, s"$stateDir/metrics")
    if (!fs.exists(table))
      return Seq.empty[(Long, Long, Long, Long, Long, Long, Long)]
        .toDF("batch_id", "new_rows", "index_rows_probed", "candidate_pairs",
          "pairs_appended", "state_files_read", "state_files_total")
    spark.read.parquet(
      fs.listStatus(table).filter(_.isDirectory).map(_.getPath.toString): _*)
  }

  private val sigSchema = StructType(Seq(
    StructField("image_id", StringType),
    StructField("caption_norm", StringType),
    StructField("sim_hi", LongType), StructField("sim_lo", LongType),
    StructField("minhash", ArrayType(LongType))))
  private val pairSchema = StructType(Seq(
    StructField("a", StringType), StructField("b", StringType)))

  /** Periodic clustering over the accumulated pair log: connected
    * components across every id seen so far. The pair log may hold
    * duplicate pairs from bucket re-probes / replayed batches —
    * `ConnectedComponents` symmetrizes + distincts the edge set — and the
    * signature log may hold duplicate ids from a replayed batch (state
    * written, checkpoint not yet committed), so the vertex set is
    * explicitly distinct-ed: the output has exactly one row per image.
    * Only `_done`-committed state is read (safe to run concurrently with
    * the ingesting query — StreamJob `cluster` mode). An empty/absent
    * state yields an empty result, not an error. */
  def clustersFromState(spark: SparkSession, stateDir: String): DataFrame = {
    import spark.implicits._
    val (sigDf, _) = readState(spark, s"$stateDir/sigs", sigSchema,
      excludeBatch = None, touchedP = None, wantStats = false)
    val ids = sigDf.select(col("image_id").as("id")).distinct()
    if (ids.isEmpty)
      return Seq.empty[(String, String)].toDF("image_id", "cluster_id")
    val (pairs, _) = readState(spark, s"$stateDir/pairs", pairSchema,
      excludeBatch = None, touchedP = None, wantStats = false)
    ConnectedComponents.run(spark, pairs.select("a", "b"), ids)
      .withColumnRenamed("id", "image_id")
  }

  /** Internals of one incremental-clustering step, surfaced for the
    * cost-proportionality spec: the subgraph actually re-clustered. */
  final case class IncrementalStats(fullRecompute: Boolean,
      newEdges: Long, subgraphEdges: Long, subgraphVertices: Long)

  /** INCREMENTAL periodic clustering: fold only the batches newer than the
    * previous label snapshot into it, re-clustering just the components
    * those new edges touch.
    *
    *  - Previous labels live in `<stateDir>/labels/upto_<W>` (W = the
    *    newest batch id folded in; `_done`-committed like all state).
    *  - New edges' endpoints name the AFFECTED old clusters; every other
    *    label row is provably unchanged (min-id labeling is per-component)
    *    and passes through untouched.
    *  - The re-clustered subgraph is (affected members ∪ new ids) with
    *    (new edges ∪ one star edge per affected member to its old label —
    *    collapsing each old component in one hop). Its size is proportional
    *    to new arrivals + touched components, never to stream history, and
    *    it is usually small enough to take ConnectedComponents' local
    *    union-find path outright.
    *  - If compaction has folded batches beyond W into a base (the label
    *    snapshot lagged more than `compactEvery` batches), per-batch deltas
    *    are no longer addressable and the step falls back to one full
    *    recompute — correct, and self-healing: the new snapshot restores
    *    incrementality.
    *
    * Returns the same frame `clustersFromState` would. At most one
    * clustering runner may own `<stateDir>/labels` at a time (same
    * single-writer rule as the ingesting query itself). */
  def clustersIncremental(spark: SparkSession, stateDir: String): DataFrame =
    clustersIncrementalWithStats(spark, stateDir)._1

  def clustersIncrementalWithStats(spark: SparkSession,
      stateDir: String): (DataFrame, IncrementalStats) = {
    import spark.implicits._
    val labelsTable = s"$stateDir/labels"
    val (fs, lt) = fileSystem(spark, labelsTable)
    val SnapRe = "upto_(-?\\d+)".r
    val prevSnap: Option[(Long, Path)] =
      if (!fs.exists(lt)) None
      else fs.listStatus(lt).toSeq.filter(_.isDirectory).flatMap { st =>
        st.getPath.getName match {
          case SnapRe(w) if isCommitted(fs, st.getPath) =>
            Some((w.toLong, st.getPath))
          case _ => None
        }
      }.sortBy(_._1).lastOption

    val (fsS, sigT) = fileSystem(spark, s"$stateDir/sigs")
    val sigC = committedDirs(fsS, sigT, None)
    val (fsP, pairT) = fileSystem(spark, s"$stateDir/pairs")
    val pairC = committedDirs(fsP, pairT, None)
    def baseIdOf(c: Committed): Option[Long] = c.base.flatMap(_.getName match {
      case BaseRe(id) => Some(id.toLong)
      case _ => None
    })
    val baseFloor = (baseIdOf(sigC).toSeq ++ baseIdOf(pairC).toSeq)
      .maxOption.getOrElse(Long.MinValue)
    val maxBatch = ((sigC.batches ++ pairC.batches).map(_._1) :+ baseFloor)
      .max

    def writeSnapshot(labels: DataFrame, upto: Long): DataFrame = {
      val dir = new Path(lt, s"upto_$upto")
      clearDone(fs, dir)
      val out = labels.localCheckpoint()
      out.coalesce(4).write.mode("overwrite").parquet(dir.toString)
      markDone(fs, dir)
      // older snapshots are subsumed; best-effort cleanup
      prevSnap.filter(_._1 != upto).foreach(p => fs.delete(p._2, true))
      out
    }

    prevSnap match {
      case Some((w, snapDir)) if w >= baseFloor =>
        val newSigDirs = sigC.batches.filter(_._1 > w).map(_._2.toString)
        val newPairDirs = pairC.batches.filter(_._1 > w).map(_._2.toString)
        val prev = spark.read.parquet(snapDir.toString)
        if (newSigDirs.isEmpty && newPairDirs.isEmpty)
          return (prev, IncrementalStats(fullRecompute = false, 0L, 0L, 0L))
        // anti-join: an id can only be NEW if the snapshot has never
        // labeled it (defensive — a replayed id must not appear both as an
        // untouched old label and as a fresh singleton)
        val newIds =
          (if (newSigDirs.isEmpty) emptyDf(spark, sigSchema)
           else spark.read.schema(sigSchema).parquet(newSigDirs: _*))
            .select(col("image_id").as("id")).distinct()
            .join(prev.select(col("image_id").as("id")), Seq("id"), "left_anti")
        val newPairs =
          (if (newPairDirs.isEmpty) emptyDf(spark, pairSchema)
           else spark.read.schema(pairSchema).parquet(newPairDirs: _*))
            .select("a", "b").distinct().localCheckpoint()
        val endpoints = newPairs.select(col("a").as("image_id"))
          .union(newPairs.select(col("b").as("image_id"))).distinct()
        val affected = prev.join(endpoints, "image_id")
          .select("cluster_id").distinct()
        val members = prev.join(affected, "cluster_id").localCheckpoint()
        val starEdges = members
          .filter(col("image_id") =!= col("cluster_id"))
          .select(col("image_id").as("a"), col("cluster_id").as("b"))
        val subVertices = members.select(col("image_id").as("id"))
          .union(endpoints.select(col("image_id").as("id")))
          .union(newIds)
          .distinct()
        val subEdges = newPairs.union(starEdges)
        val re = ConnectedComponents.run(spark, subEdges, subVertices)
          .withColumnRenamed("id", "image_id")
        val untouched = prev.join(affected, Seq("cluster_id"), "left_anti")
          .select("image_id", "cluster_id")
        // stats BEFORE the snapshot write: their plans still read the old
        // snapshot files, which writeSnapshot deletes once the new one is
        // committed
        val stats = IncrementalStats(fullRecompute = false,
          newEdges = newPairs.count(), subgraphEdges = subEdges.count(),
          subgraphVertices = subVertices.count())
        val out = writeSnapshot(
          untouched.unionByName(re.select("image_id", "cluster_id")), maxBatch)
        (out, stats)
      case _ =>
        // first run, or the snapshot fell behind a compaction — one full
        // pass restores incrementality
        val full = clustersFromState(spark, stateDir)
        if (sigC.base.isEmpty && sigC.batches.isEmpty)
          return (full, IncrementalStats(fullRecompute = true, 0L, 0L, 0L))
        val out = writeSnapshot(full, maxBatch)
        (out, IncrementalStats(fullRecompute = true, 0L, 0L, 0L))
    }
  }
}
