package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-assembly ops downstream of dedup: leakage-free cluster-aware
  * splits, deterministic per-stratum quota sampling, and the dedup savings
  * report. These are the steps a training-data pipeline runs AFTER
  * near-duplicate clustering (the reference's similarity semantics applied
  * to corpus hygiene — see `doc/02-training.md`'s attract/repulse split
  * discipline, which requires pairs never to straddle train/validation):
  * every op is pure relational algebra + an engine-portable arithmetic
  * hash, so each has an exact DuckDB oracle in SparkEntry.oracleSql.
  *
  * Scale notes (10^12 rows): clusterSplit is map-only over the cluster
  * frame (no shuffle beyond the clustering that produced it); the split
  * hash is per-row arithmetic, NOT a rank over distinct clusters — a global
  * rank would sort ~10^11 cluster labels for pure ceremony. stratifiedSample
  * shuffles once on the stratum key (the quota is a per-partition window).
  * dedupReport shuffles once on cluster_id; the size histogram is tiny.
  */
object MixOps {

  /** Engine-portable positional string hash: (sum over chars of
    * (i+1)·code(ch_i)) mod m — the q14 fingerprint arithmetic applied to a
    * key column, so the split assignment is reproducible in ANY engine
    * (DuckDB re-derives it with a list comprehension; no library hash whose
    * spec differs across engines). Order-sensitive, so "img_…_01" and
    * "img_…_10" land independently. */
  def posHash(key: Column, m: Long): Column = {
    // compiled single-pass UDF, same rationale and identical arithmetic as
    // TextOps.fingerprintUdf (the interpreted HOF chain split one string
    // per character per row); null key → null, zero characters → null —
    // exactly what the HOF form produced (its sequence/zip padded a null
    // into the sum). The DuckDB oracles re-derive the same definition.
    val u = udf((s: String) => {
      if (s == null) None: Option[Long]
      else {
        var pos = 0L; var idx = 1L
        var i = 0
        while (i < s.length) {
          val cp = s.codePointAt(i)
          pos += idx * cp
          idx += 1
          i += Character.charCount(cp)
        }
        if (idx == 1L) None: Option[Long]
        else Some(java.lang.Math.floorMod(pos, m))
      }
    })
    u(key)
  }

  /** Leakage-free train/val/test split: every member of a near-dup cluster
    * gets the SPLIT OF ITS CLUSTER LABEL, so no pair of near-duplicates can
    * straddle a split boundary (train/test contamination via a surviving
    * near-copy is the web-scale failure mode; gram-level decontamination —
    * TextOps.decontaminate — cannot catch a paraphrased or re-encoded dup,
    * the cluster can). Buckets 0..trainUpTo-1 → train, ..valUpTo-1 → val,
    * rest → test over `nBuckets` hash buckets.
    *
    * Input: `clusters` as produced by Dedup.run / ConnectedComponents —
    * one row per record, (idCol, cluster_id). Map-only; deterministic. */
  def clusterSplit(clusters: DataFrame, nBuckets: Int = 10,
      trainUpTo: Int = 8, valUpTo: Int = 9,
      m: Long = 1000003L): DataFrame = {
    // bucket lands in its own projection so the (non-cheap) hash evaluates
    // ONCE per row instead of once per `when` branch referencing it
    val bucket = pmod(posHash(col("cluster_id"), m), lit(nBuckets.toLong))
    clusters.withColumn("__split_bucket", bucket)
      .withColumn("split",
        when(col("__split_bucket") < trainUpTo, lit("train"))
          .when(col("__split_bucket") < valUpTo, lit("val"))
          .otherwise(lit("test")))
      .drop("__split_bucket")
  }

  /** Deterministic per-stratum quota sample: the `k` docs per `source` with
    * the smallest values of the portable LCG hash (doc_id·40503 + 9973 mod
    * 1000003; ties broken by doc_id) — exact-quota mix construction, the
    * companion of TextOps.deterministicSample's rate-based keep. One
    * shuffle on the stratum key; the quota is a bounded window per stratum.
    * A skewed stratum concentrates its window on one task — at 10^12 rows
    * use the rate-based sampler to pre-thin any stratum whose row count
    * dwarfs `k` by >10^3 before the exact quota pass. */
  def stratifiedSample(docs: DataFrame, k: Int,
      m: Long = 1000003L): DataFrame = {
    val h = pmod(col("doc_id") * lit(40503L) + lit(9973L), lit(m))
    val w = Window.partitionBy("source").orderBy(h.asc, col("doc_id").asc)
    docs.select(col("doc_id"), col("source"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }

  /** Token-budget mix planning — the step between token counting
    * (TextOps.tokenCount) and the deterministic samplers: training mixes
    * are specified in TOKENS per source ("60% web, 15% code"), not rows,
    * so the planner turns per-source token totals + target weights + a
    * total token budget into the keep RATE per source and the integer
    * threshold `TextOps.deterministicSample` consumes. A source that
    * cannot fill its allocation caps at rate 1.0 and REPORTS the
    * shortfall — re-weighting the remainder is a policy decision, not an
    * engine one, so nothing is silently reallocated.
    *
    * Scale shape: one aggregate over (source, token-count) rows — the
    * token count is a map-side projection and the groupBy key space is
    * the source list (tiny); the weight table is a broadcast dim. All
    * arithmetic is IEEE-double + floor, engine-portable, so the DuckDB
    * oracle re-derives the plan exactly (q53). */
  def mixPlan(docs: DataFrame, weights: Map[String, Double],
      budgetTokens: Long, m: Long = 1000003L): DataFrame = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}
    val dim = broadcast(docs.sparkSession.createDataFrame(
      weights.toSeq.sortBy(_._1)
        .map { case (s, w) => org.apache.spark.sql.Row(s, w) }.asJava,
      StructType(Seq(StructField("source", StringType, nullable = false),
        StructField("weight", DoubleType, nullable = false)))))
    val perSource = docs
      .select(col("source"),
        size(TextOps.tokensCol(col("text"))).cast("long").as("n_tok"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))
    perSource.join(dim, Seq("source"), "inner")
      .withColumn("alloc_raw", col("weight") * lit(budgetTokens.toDouble))
      .withColumn("rate_raw",
        least(lit(1.0), col("alloc_raw") / col("n_tokens")))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("weight"),
        round(col("alloc_raw"), 4).as("alloc_tokens"),
        round(col("rate_raw"), 6).as("rate"),
        floor(col("rate_raw") * lit(m.toDouble)).cast("long").as("thr"),
        round(col("rate_raw") * col("n_tokens"), 4).as("expected_tokens"),
        round(greatest(lit(0.0), col("alloc_raw") - col("n_tokens")), 4)
          .as("shortfall"))
      .orderBy("source")
  }

  /** Dedup savings report: cluster-size histogram with image and byte
    * accounting — for each cluster size `sz`: how many clusters, how many
    * records they hold, and the bytes REMOVED by keeping only the canonical
    * member (the member whose id equals the cluster label — the min-id
    * convention every clustering surface here uses). The ops answer to
    * "what did the dedup pass buy" at fleet-report granularity.
    *
    * `sizes` = (idCol, n_bytes). One shuffle on cluster_id; the histogram
    * aggregate is over one row per cluster. */
  def dedupReport(clusters: DataFrame, sizes: DataFrame,
      idCol: String = "image_id"): DataFrame = {
    val per = clusters.join(sizes, idCol)
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("sz"),
        sum("n_bytes").as("total_bytes"),
        sum(when(col(idCol) === col("cluster_id"), col("n_bytes"))
          .otherwise(0L)).as("kept_bytes"))
    per.groupBy("sz")
      .agg(count(lit(1)).as("n_clusters"),
        sum("sz").as("n_images"),
        sum(col("total_bytes") - col("kept_bytes")).as("bytes_removed"))
      .orderBy("sz")
  }
}
