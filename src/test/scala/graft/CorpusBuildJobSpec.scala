package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.images.SyntheticCorpus
import graft.ops.TextOps

/** End-to-end corpus build (CorpusBuildJob): clustering → caption hygiene →
  * decontamination → canonical election → leakage-free split, with the
  * composition independently re-derived in plain Scala over collected rows,
  * plus the checkpoint-resume contract at BOTH stage granularities (build
  * stages rekey on BuildConfig; the five dedup stages must survive a
  * hygiene-threshold change untouched). */
class CorpusBuildJobSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def posHash(s: String, m: Long): Long =
    s.zipWithIndex.map { case (c, i) => c.toLong * (i + 1) }.sum % m

  test("build: composition matches a plain-Scala re-derivation; metrics reconcile") {
    val root = Files.createTempDirectory("graft-corpusbuild").toString
    val (images, _) = SyntheticCorpus.generate(spark,
      nGroups = 20, variantsPerGroup = 3, nDistractors = 15)
    val caps = images.select(col("image_id").as("doc_id"),
      col("caption").as("text"))
    val bench = caps.orderBy("doc_id").limit(2)
    val cfg = CorpusBuildJob.BuildConfig(minCaptionTokens = 12)

    val corpus = CorpusBuildJob.run(spark, images, root, Some(bench), cfg)
      .cache()
    val got = corpus.select("image_id", "cluster_id", "split").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet

    // independent re-derivation on collected rows: clusters from the
    // pipeline (its own oracles cover it), hygiene + contamination verdicts
    // from TextOps (q41/q42-oracle-backed), composition in plain Scala
    val clusters = graft.pipeline.Dedup.run(images, cfg.dedup)
      .collect().map(r => r.getString(0) -> r.getString(1))
    val kept = CorpusBuildJob.hygiene(caps, 12, cfg.maxDup5Frac)
      .filter(col("keep")).select("doc_id")
      .collect().map(_.getString(0)).toSet
    val cont = TextOps.decontaminate(caps, bench, cfg.decontamN)
      .select("doc_id").collect().map(_.getString(0)).toSet
    val expected = clusters
      .filter { case (id, _) => kept(id) && !cont(id) }
      .groupBy(_._2).map { case (cl, members) =>
        val canon = members.map(_._1).min
        val b = posHash(cl, 1000003L) % 10
        (canon, cl, if (b < 8) "train" else if (b < 9) "val" else "test")
      }.toSet
    assert(got === expected)
    assert(expected.nonEmpty)
    // the hygiene floor actually bit (some caption under 12 tokens exists)
    assert(kept.size < clusters.length)
    // one row per surviving cluster, never an empty or duplicated cluster
    assert(got.size === got.map(_._2).size)

    // metrics reconcile with the output
    val metrics = spark.read.parquet(s"$root/metrics_build").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(metrics("corpus_rows") === got.size.toLong)
    assert(metrics("contaminated_rows") === cont.size.toLong)
    val splitSum = Seq("train_rows", "val_rows", "test_rows")
      .map(metrics.getOrElse(_, 0L)).sum
    assert(splitSum === got.size.toLong)
    // report exists and accounts every input image exactly once
    val rep = spark.read.parquet(s"$root/report").collect()
    assert(rep.map(_.getAs[Long]("n_images")).sum === images.count())
    corpus.unpersist()
  }

  test("fuzzy decontamination: a token-edited benchmark copy is dropped only when enabled; dedup stages survive the toggle") {
    val root = Files.createTempDirectory("graft-corpusbuild-fz").toString
    val (images, truth) = SyntheticCorpus.generate(spark,
      nGroups = 8, variantsPerGroup = 2, nDistractors = 12)
    val caps = images.select(col("image_id").as("doc_id"),
      col("caption").as("text"))
    // distractors are singleton truth groups — their row is its own
    // cluster canonical, so dropping it visibly changes the output corpus
    val singletonIds = truth.groupBy("group_id")
      .agg(count(lit(1)).as("n"), min("image_id").as("image_id"))
      .filter(col("n") === 1).select("image_id")
      .collect().map(_.getString(0)).toSet
    // a singleton-cluster caption of 13..25 tokens: one token edit at
    // position 13 breaks EVERY shared 13-gram (all window starts cover
    // position 13 at n <= 25) while word-3-gram jaccard stays at
    // (n-5)/(n+1) >= 0.57 — the re-formatted-benchmark case the exact rule
    // is blind to
    val (targetId, targetCap) = caps.collect()
      .map(r => (r.getString(0), r.getString(1)))
      .filter { case (id, t) =>
        val n = t.split(" ").length; singletonIds(id) && n >= 13 && n <= 25 }
      .minBy(_._1)
    import spark.implicits._
    val edited = targetCap.split(" ").updated(12, "zzedited").mkString(" ")
    val bench = Seq(("bench0", edited)).toDF("doc_id", "text")
    val cfg = CorpusBuildJob.BuildConfig(minCaptionTokens = 2, decontamN = 13)

    val off = CorpusBuildJob.run(spark, images, root, Some(bench), cfg)
      .select("image_id").collect().map(_.getString(0)).toSet
    val on = CorpusBuildJob.run(spark, images, root, Some(bench),
      cfg.copy(fuzzyMinJaccard = 0.5))
      .select("image_id").collect().map(_.getString(0)).toSet

    assert(off(targetId), "exact 13-gram rule alone must miss the edited copy")
    assert(!on(targetId), "fuzzy rule must drop the near-match")
    assert(off - targetId === on, "fuzzy toggle must change exactly the target")
    val metrics = spark.read.parquet(s"$root/metrics_build").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(metrics("fuzzy_contaminated_rows") === 1L)
    assert(metrics("contaminated_rows") === 0L)
    // toggling the fuzzy knob re-keys the build stages but must NOT re-run
    // decode+LSH (the same 100-TB property as the hygiene re-tune below)
    val dl = spark.read.parquet(s"$root/dedup/lineage").collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(dl.values.forall(identity),
      "dedup stages must survive the fuzzy toggle")
  }

  test("resume: identical rerun resumes every stage; hygiene re-tune keeps dedup stages") {
    val root = Files.createTempDirectory("graft-corpusbuild-rs").toString
    val (images, _) = SyntheticCorpus.generate(spark,
      nGroups = 8, variantsPerGroup = 2, nDistractors = 8)
    val cfg = CorpusBuildJob.BuildConfig(minCaptionTokens = 10)

    val first = CorpusBuildJob.run(spark, images, root, None, cfg)
      .collect().map(_.toSeq).toSet
    def lineage(path: String): Map[String, Boolean] =
      spark.read.parquet(path).collect()
        .map(r => r.getString(0) -> r.getBoolean(1)).toMap

    val second = CorpusBuildJob.run(spark, images, root, None, cfg)
      .collect().map(_.toSeq).toSet
    assert(second === first)
    assert(lineage(s"$root/lineage_build").values.forall(identity),
      "identical rerun must resume every build stage")
    assert(lineage(s"$root/dedup/lineage").values.forall(identity),
      "identical rerun must resume every dedup stage")

    // re-tune a hygiene threshold: build stages recompute, dedup stages
    // stay committed (the 100-TB property — caption re-filtering never
    // re-runs decode+LSH)
    val third = CorpusBuildJob.run(spark, images, root, None,
      cfg.copy(minCaptionTokens = 2))
    val lb = lineage(s"$root/lineage_build")
    assert(!lb("hygiene") && !lb("contaminated") && !lb("corpus"),
      "config change must invalidate the build stages")
    assert(lineage(s"$root/dedup/lineage").values.forall(identity),
      "dedup stages must survive a hygiene-config change")
    // looser floor keeps at least as many clusters
    assert(third.count() >= first.size.toLong)
  }
}
