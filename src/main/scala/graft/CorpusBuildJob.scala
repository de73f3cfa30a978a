package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.{ParquetTableIO, StageRunner}
import graft.ops.{MixOps, TextOps}
import graft.pipeline.DedupConfig

/** spark-submit entrypoint for the FULL training-corpus build — the composite
  * a corpus owner actually launches, chaining every family this library
  * ships: near-dup clustering (DedupJob's five resumable stages), caption
  * hygiene (token floor + Gopher repetition cap), eval-set decontamination
  * (exact shared word n-grams with a benchmark table, plus the opt-in
  * near-match MinHash-LSH rule for re-formatted benchmark copies —
  * `fuzzyMinJaccard`), canonical-member election,
  * and the leakage-free cluster-aware train/val/test split — under the same
  * atomic-manifest checkpoint-resume and lineage discipline as DedupJob
  * (north rule: resumable from checkpoint with per-partition lineage +
  * metrics; the reference's reopen-existing-index semantics,
  * `simhashsearchindex.cpp:23-40`, applied at every stage boundary).
  *
  *   spark-submit --class graft.CorpusBuildJob app.jar \
  *     <inputParquet> <workDir> [benchParquet]
  *
  * Input: the input_hint image+caption schema. Output:
  * `<workDir>/corpus_out` — one canonical row per surviving near-dup
  * cluster, tagged with its split — plus `report` (dedup savings
  * histogram), `metrics`, and `lineage_build`; the dedup stages keep their
  * own lineage under `<workDir>/dedup`.
  *
  * Stage granularity is the resume unit: a config change to the hygiene
  * thresholds invalidates hygiene/contaminated/corpus but NOT the five
  * dedup stages (their manifests are keyed by DedupConfig.stageHash alone),
  * so re-tuning a caption filter on a 100-TB corpus never re-runs the
  * decode+LSH pipeline.
  *
  * Scale shape: hygiene is map-only per caption (single-pass compiled UDF —
  * no corpus-wide gram shuffle); decontamination broadcasts the benchmark
  * grams (eval sets are MBs against a TB corpus) so the training side never
  * shuffles its grams; canonical election is one groupBy on cluster_id;
  * the split is per-row arithmetic on the cluster label. Nothing here adds
  * a shuffle proportional to corpus bytes beyond what clustering already
  * paid.
  */
object CorpusBuildJob {

  /** Pure-value config (no Arrays — resume keys stages on the hash).
    * `fuzzyMinJaccard > 0` adds the near-match decontamination pass
    * (TextOps.fuzzyDecontaminate) alongside the exact-gram rule: a
    * benchmark caption that was re-formatted or token-edited into the
    * crawl breaks every shared 13-gram but keeps high shingle Jaccard.
    * 0.0 (default) disables it. */
  final case class BuildConfig(
      dedup: DedupConfig = DedupConfig(),
      minCaptionTokens: Int = 2,
      maxDup5Frac: Double = 0.75,
      decontamN: Int = 5,
      nBuckets: Int = 10,
      trainUpTo: Int = 8,
      valUpTo: Int = 9,
      fuzzyMinJaccard: Double = 0.0) {
    /** Non-default fields only (the DedupConfig pattern): adding a future
      * config knob must not invalidate every existing stage manifest for
      * configs that leave it at its default. */
    def stageHash: String = {
      val defaults = BuildConfig().productIterator.toSeq
      // the dedup config contributes through its own stageHash prefix —
      // excluded from the diff so it is not double-counted
      val diff = productElementNames.zip(productIterator).zip(defaults)
        .collect { case ((n, v), d) if v != d && n != "dedup" => s"$n=$v" }
        .toSeq
      s"${dedup.stageHash}-" + java.lang.Integer.toHexString(
        ("BuildConfig" +: diff).mkString(";").hashCode)
    }
  }

  /** Caption hygiene signals + verdict: token floor and the Gopher
    * dup-5-gram cap (TextOps.repetitionScore — captions under 5 tokens have
    * no 5-gram signal and pass that test vacuously, as in the published
    * recipe). Map-only per row. */
  def hygiene(caps: DataFrame, minTokens: Int, maxDup5: Double): DataFrame =
    TextOps.tokenCount(caps)
      .join(TextOps.repetitionScore(caps).select("doc_id", "dup_5gram_frac"),
        "doc_id")
      .withColumn("keep", col("n_tokens") >= minTokens &&
        (col("dup_5gram_frac").isNull || col("dup_5gram_frac") <= maxDup5))

  /** Canonical-member election + leakage-free split over the survivors:
    * keep the min surviving id per cluster (a cluster whose every member
    * failed hygiene or decontamination vanishes entirely), then assign the
    * cluster's split from the positional hash of its LABEL — so the
    * assignment is stable under membership churn (re-filtering never moves
    * a surviving cluster across splits, only adds/removes it). */
  def assemble(clusters: DataFrame, keptIds: DataFrame, droppedIds: DataFrame,
      nBuckets: Int, trainUpTo: Int, valUpTo: Int): DataFrame = {
    val surv = clusters
      .join(keptIds, Seq("image_id"), "left_semi")
      .join(droppedIds, Seq("image_id"), "left_anti")
    val canon = surv.groupBy("cluster_id").agg(min("image_id").as("image_id"))
    MixOps.clusterSplit(canon.select("image_id", "cluster_id"),
      nBuckets, trainUpTo, valUpTo)
  }

  def run(spark: SparkSession, images: DataFrame, workDir: String,
      bench: Option[DataFrame], cfg: BuildConfig = BuildConfig()): DataFrame = {
    val stages = new StageRunner(new ParquetTableIO(workDir), spark,
      cfg.stageHash)

    // near-dup clustering: DedupJob's own resumable stages + lineage under
    // workDir/dedup, keyed by the dedup config hash alone (see scaladoc)
    val clusters = DedupJob.run(spark, images, s"$workDir/dedup", cfg.dedup)

    val caps = images.select(col("image_id").as("doc_id"),
      col("caption").as("text"))
    val hyg = stages.stage("hygiene")(
      hygiene(caps, cfg.minCaptionTokens, cfg.maxDup5Frac))
    val cont = stages.stage("contaminated")(bench match {
      case Some(b) => TextOps.decontaminate(caps, b, cfg.decontamN)
      case None => caps.select(col("doc_id"),
        lit(0L).as("n_shared_grams"), lit(0L).as("n_bench_docs")).limit(0)
    })
    // near-match decontamination (opt-in): one row per (doc, near bench
    // doc) — aggregated per doc so the stage table carries the evidence a
    // corpus owner audits (how many benchmarks, how close)
    val fuzzy = stages.stage("fuzzy_contaminated")(bench match {
      case Some(b) if cfg.fuzzyMinJaccard > 0 =>
        TextOps.fuzzyDecontaminate(caps, b, cfg.fuzzyMinJaccard)
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_bench_near"), max("jacc").as("max_jacc"))
      case _ => caps.select(col("doc_id"), lit(0L).as("n_bench_near"),
        lit(0.0).as("max_jacc")).limit(0)
    })
    val dropped = cont.select(col("doc_id").as("image_id"))
      .union(fuzzy.select(col("doc_id").as("image_id")))
    val corpus = stages.stage("corpus")(
      assemble(clusters,
        hyg.filter(col("keep")).select(col("doc_id").as("image_id")),
        dropped,
        cfg.nBuckets, cfg.trainUpTo, cfg.valUpTo)
        .join(images.select("image_id", "caption"), "image_id"))

    // dedup savings report + build metrics + build-stage lineage
    val sizes = images.select(col("image_id"),
      length(col("bytes")).cast("long").as("n_bytes"))
    MixOps.dedupReport(clusters, sizes)
      .coalesce(1).write.mode("overwrite").parquet(s"$workDir/report")
    // stage row counts from the commit manifests (counted at write time —
    // r5 verdict #7); the remaining jobs are independent → concurrent
    import spark.implicits._
    val hash = cfg.stageHash
    def rowsOf(name: String, fallback: => Long): Long =
      stages.io.stageRows(name, hash).getOrElse(fallback)
    val Seq(perSplitRaw, inputRows, nClusters, hygDropped) =
      graft.core.Checkpoints.parallelRun[Any](Seq(
        () => corpus.groupBy("split").count().collect(),
        () => images.count(),
        () => clusters.select("cluster_id").distinct().count(),
        () => hyg.filter(!col("keep")).count()))
    val perSplit = perSplitRaw.asInstanceOf[Array[org.apache.spark.sql.Row]]
      .map(r => s"${r.getString(0)}_rows" -> r.getLong(1)).toSeq
    val metrics = (Seq(
      ("input_rows", inputRows.asInstanceOf[Long]),
      ("clusters", nClusters.asInstanceOf[Long]),
      ("hygiene_dropped", hygDropped.asInstanceOf[Long]),
      ("contaminated_rows", rowsOf("contaminated", cont.count())),
      ("fuzzy_contaminated_rows", rowsOf("fuzzy_contaminated", fuzzy.count())),
      ("corpus_rows", rowsOf("corpus", corpus.count()))
    ) ++ perSplit).toDF("metric", "value")
    metrics.coalesce(1).write.mode("overwrite").parquet(s"$workDir/metrics_build")
    stages.lineageLog.toDF("stage", "resumed_from_checkpoint")
      .coalesce(1).write.mode("overwrite").parquet(s"$workDir/lineage_build")
    corpus
  }

  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println(
        "usage: graft.CorpusBuildJob <inputParquet> <workDir> " +
          "[benchParquet] [fuzzyMinJaccard]")
      sys.exit(2)
    }
    val input = args(0)
    val workDir = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Bench.makeSession(cpus)
    val bench = args.lift(2).map(p => spark.read.parquet(p))
    val cfg = BuildConfig(
      fuzzyMinJaccard = args.lift(3).map(_.toDouble).getOrElse(0.0))
    val corpus = run(spark, spark.read.parquet(input), workDir, bench, cfg)
    corpus.write.mode("overwrite").parquet(s"$workDir/corpus_out")
    println(s"corpus: ${spark.read.parquet(s"$workDir/corpus_out").count()} rows")
    spark.stop()
  }
}
