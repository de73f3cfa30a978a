package graft.eval

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Retrieval-quality harness — the Spark port of
  * `testdata/evaluate_ROC_curve.py:1-309`: grouped-by-symbol relevance,
  * exact (full-corpus Hamming sweep) vs approximate (LSH bucket probe)
  * search, TPR/FPR/IRR per similarity cutoff.
  *
  *   TPR = retrieved relevant / total relevant
  *   FPR = retrieved irrelevant / total irrelevant
  *   IRR = retrieved irrelevant / total retrieved   (0 when nothing retrieved)
  *
  * Queries are the records whose group has >= 2 members (the python picks
  * functions with >1 implementation, `get_function_subset`); rates are
  * computed per query then averaged per cutoff, as the python does. The
  * whole evaluation is relational once signatures are columns — one
  * broadcast-join pass over (query × corpus), then a cutoff explode and two
  * aggregations; the DuckDB oracle re-derives it exactly from the dumped
  * signature table (q30).
  */
object RocEval {

  val DefaultCutoffs: Seq[Int] = 96 to 128 by 4

  /** Exact-search ROC. `sigs`: (id, group_id, sim_hi, sim_lo).
    * Returns (cutoff, tpr, fpr, irr) rounded to 6 places. */
  def exactRoc(sigs: DataFrame, cutoffs: Seq[Int] = DefaultCutoffs): DataFrame = {
    val n = sigs.count()
    val groupSizes = sigs.groupBy("group_id").agg(count(lit(1)).as("gsize"))
    val queries = sigs.join(groupSizes, "group_id").filter(col("gsize") >= 2)
      .select(col("id").as("qid"), col("group_id").as("qg"),
        col("sim_hi").as("q_hi"), col("sim_lo").as("q_lo"), col("gsize"))
    val corpus = sigs.select(col("id").as("oid"), col("group_id").as("og"),
      col("sim_hi").as("o_hi"), col("sim_lo").as("o_lo"))
    val scored = broadcast(queries).join(corpus, col("qid") =!= col("oid"))
      .select(col("qid"), col("gsize"),
        (col("qg") === col("og")).as("relevant"),
        (lit(128) - (bit_count(col("q_hi").bitwiseXOR(col("o_hi"))) +
          bit_count(col("q_lo").bitwiseXOR(col("o_lo"))))).as("sim"))
    rates(scored, queries.select("qid", "gsize"), n, cutoffs)
  }

  /** Approximate-search ROC: candidates from the permuted-band LSH probe
    * (dedup to min distance per (query, candidate), as `QueryTopN` does)
    * instead of the full sweep. Non-colliding pairs are simply never
    * retrieved — the approximation under measurement. */
  def approxRoc(sigs: DataFrame, cfg: graft.pipeline.DedupConfig =
      graft.pipeline.DedupConfig(), cutoffs: Seq[Int] = DefaultCutoffs): DataFrame =
    approxRocFromIndex(graft.index.SimIndex.build(
      sigs.select("id", "sim_hi", "sim_lo"), cfg), sigs, cutoffs)

  /** `approxRoc` over an ALREADY-BUILT (e.g. persisted or dumped) band
    * index — everything downstream of the index is pure relational algebra,
    * re-derivable by the DuckDB oracle from the same index table (q33). */
  def approxRocFromIndex(index: DataFrame, sigs: DataFrame,
      cutoffs: Seq[Int] = DefaultCutoffs): DataFrame = {
    val n = sigs.count()
    val groupSizes = sigs.groupBy("group_id").agg(count(lit(1)).as("gsize"))
    val probes = index.select(col("band_id"), col("band_key"),
      col("id").as("qid"), col("sim_hi").as("q_hi"), col("sim_lo").as("q_lo"))
    val hits = probes.join(
        index.select(col("band_id"), col("band_key"), col("id").as("oid"),
          col("sim_hi").as("o_hi"), col("sim_lo").as("o_lo")),
        Seq("band_id", "band_key"))
      .filter(col("qid") =!= col("oid"))
      .select(col("qid"), col("oid"),
        (lit(128) - (bit_count(col("q_hi").bitwiseXOR(col("o_hi"))) +
          bit_count(col("q_lo").bitwiseXOR(col("o_lo"))))).as("sim"))
      .groupBy("qid", "oid").agg(max("sim").as("sim"))
    val qmeta = sigs.join(groupSizes, "group_id")
      .select(col("id").as("qid"), col("group_id").as("qg"), col("gsize"))
      .filter(col("gsize") >= 2)
    val omata = sigs.select(col("id").as("oid"), col("group_id").as("og"))
    val scored = hits.join(broadcast(qmeta), "qid").join(omata, "oid")
      .select(col("qid"), col("gsize"), (col("qg") === col("og")).as("relevant"),
        col("sim"))
    rates(scored, qmeta.select("qid", "gsize"), n, cutoffs)
  }

  /** Per-query counts at each cutoff -> per-query rates -> mean per cutoff.
    * `scored`: (qid, gsize, relevant, sim); total relevant per query is
    * gsize-1, total irrelevant is n-gsize. Aggregates over the FULL
    * (query × cutoff) grid so queries that retrieved nothing (possible on
    * the approximate path: zero bucket collisions) still contribute their
    * zero rates to the mean, as the python harness does. */
  private def rates(scored: DataFrame, queries: DataFrame, n: Long,
      cutoffs: Seq[Int]): DataFrame = {
    val cutoffDf = broadcast(scored.sparkSession.createDataFrame(
      cutoffs.map(Tuple1(_))).toDF("cutoff"))
    val counts = scored
      .join(cutoffDf, expr("true"))
      .groupBy("qid", "cutoff")
      .agg(
        sum(when(col("relevant") && col("sim") >= col("cutoff"), 1L)
          .otherwise(0L)).as("rel_ret"),
        sum(when(!col("relevant") && col("sim") >= col("cutoff"), 1L)
          .otherwise(0L)).as("irr_ret"))
    val grid = queries.join(cutoffDf, expr("true"))
    val perQuery = grid.join(counts, Seq("qid", "cutoff"), "left")
      .select(col("cutoff"),
        (coalesce(col("rel_ret"), lit(0L)).cast("double") /
          (col("gsize") - 1)).as("tpr"),
        (coalesce(col("irr_ret"), lit(0L)).cast("double") /
          (lit(n) - col("gsize"))).as("fpr"),
        when(coalesce(col("rel_ret"), lit(0L)) +
            coalesce(col("irr_ret"), lit(0L)) > 0,
          coalesce(col("irr_ret"), lit(0L)).cast("double") /
            (coalesce(col("rel_ret"), lit(0L)) + coalesce(col("irr_ret"), lit(0L))))
          .otherwise(lit(0.0)).as("irr"))
    perQuery.groupBy("cutoff")
      .agg(round(avg("tpr"), 6).as("tpr"), round(avg("fpr"), 6).as("fpr"),
        round(avg("irr"), 6).as("irr"))
      .orderBy("cutoff")
  }
}
