package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.pipeline.DedupConfig
import graft.streaming.StreamingDedup

/** Long-horizon streaming soak: drives ~N micro-batches through the
  * streaming dedup state and reports whether per-batch cost stays FLAT as
  * the base grows — the local[32] stand-in for the reference's 50M-entry
  * probe-cost contract (`searchbackend/simhashsearchindex.hpp:40-86`: a
  * probe touches bucket-local entries, never the whole index). The
  * StreamingDedupSpec enforces the same contract at 15 micro-batches;
  * this run produces the evidence table at ~100.
  *
  *   sbt -batch "runMain graft.SoakJob <nBatches> <batchSize> <outDir>
  *     [nBands] [bandProbes]"
  *
  * `[nBands] [bandProbes]` select the band config (defaults 28 / 0 — the
  * single-probe default): `8 3` is the reduced-band multi-probe
  * configuration, whose persisted index carries ~0.55x the band rows at
  * equal truth recall (the A/B the round-5 notes record). The job prints
  * the committed index row count at the end so the two runs' state
  * volumes are directly comparable.
  *
  * Emits one line per batch (from the engine's own committed metrics
  * table) and a head-vs-tail summary: mean wall/read-cost over an early
  * same-phase window vs the final window. Corpus is generated and written
  * BEFORE the stream starts (one file per intended micro-batch).
  */
object SoakJob {
  def main(args: Array[String]): Unit = {
    val nBatches = args.headOption.map(_.toInt).getOrElse(100)
    val batchSize = args.lift(1).map(_.toInt).getOrElse(200)
    val outDir = args.lift(2).getOrElse("/tmp/graft_soak")
    val nBands = args.lift(3).map(_.toInt).getOrElse(28)
    val bandProbes = args.lift(4).map(_.toInt).getOrElse(0)
    val spark = Bench.makeSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val n = nBatches * batchSize
    // dup-heavy mix like the scaling corpus: ~60% of rows in planted groups
    val groups = n * 3 / 20 // x4 variants -> 60% grouped
    val (images, _) = graft.images.SyntheticCorpus.generate(
      spark, nGroups = groups, variantsPerGroup = 4,
      nDistractors = n - groups * 4)
    val inputDir = s"$outDir/input"
    val stateDir = s"$outDir/state"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(stateDir))
    // one file per micro-batch, deterministic round-robin assignment
    images.repartition(nBatches).write.mode("overwrite").parquet(inputDir)
    val t0 = System.nanoTime()
    StreamingDedup.run(spark, inputDir, stateDir,
      DedupConfig(nBands = nBands, bandProbes = bandProbes),
      Trigger.AvailableNow(), maxFilesPerTrigger = 1, metrics = true,
      stateP = 64, compactEvery = 8)
      .awaitTermination()
    val wallTotal = (System.nanoTime() - t0) / 1e9
    val m = StreamingDedup.metricsFromState(spark, stateDir)
      .orderBy("batch_id").collect()
    println("batch_id new_rows exact_drop probed cand pairs files_read files_total touched_frac wall_ms")
    m.foreach { r =>
      println(f"${r.getAs[Long]("batch_id")}%8d ${r.getAs[Long]("new_rows")}%8d " +
        f"${r.getAs[Long]("exact_dropped")}%10d " +
        f"${r.getAs[Long]("index_rows_probed")}%6d ${r.getAs[Long]("candidate_pairs")}%5d " +
        f"${r.getAs[Long]("pairs_appended")}%5d ${r.getAs[Long]("state_files_read")}%10d " +
        f"${r.getAs[Long]("state_files_total")}%11d ${r.getAs[Double]("touched_frac_idx")}%12.2f " +
        f"${r.getAs[Long]("batch_wall_ms")}%7d")
    }
    // head-vs-tail comparison at the SAME compaction phase (same number of
    // uncompacted batch dirs), skipping the warmup decade
    def window(rows: Seq[org.apache.spark.sql.Row]): (Double, Double) = (
      rows.map(_.getAs[Long]("batch_wall_ms")).sum.toDouble / rows.size,
      rows.map(_.getAs[Long]("state_files_read")).sum.toDouble / rows.size)
    // the head/tail comparison needs enough batches past the warmup decade
    // to fill both windows — refuse to print NaN "evidence" otherwise
    require(m.length >= 48,
      s"soak needs >= 48 metric rows for the head/tail windows, got ${m.length}")
    val head = m.slice(16, 32).toSeq
    val tail = m.slice(m.length - 16, m.length).toSeq
    val (headWall, headRead) = window(head)
    val (tailWall, tailRead) = window(tail)
    val sigs = spark.read.schema(StreamingDedup.imageSchema)
      .parquet(inputDir).count()
    println(f"SOAK batches=${m.length} rows=$sigs total_wall=$wallTotal%.1f s " +
      f"throughput=${sigs / wallTotal}%.1f img/s")
    println(f"SOAK head(16..31)  mean wall=$headWall%8.1f ms  mean files_read=$headRead%8.1f")
    println(f"SOAK tail(last 16) mean wall=$tailWall%8.1f ms  mean files_read=$tailRead%8.1f")
    println(f"SOAK wall_ratio=${tailWall / headWall}%.2f read_ratio=${tailRead / headRead}%.2f " +
      "(flat contract: ratios ~1, NOT proportional to 5x history growth)")
    val idxRows = StreamingDedup.indexFromState(spark, stateDir).count()
    println(f"SOAK persisted index: $idxRows%,d band rows " +
      f"(nBands=$nBands bandProbes=$bandProbes)")
    spark.stop()
  }
}
