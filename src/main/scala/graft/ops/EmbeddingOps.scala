package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over the `embeddings` table (`vec_id`, `embedding:
  * array<float>`, `label`).
  *
  * Brute-force cosine top-k is the exact baseline (the reference's own
  * conclusion for sub-hundreds-of-millions scale: a linear XOR+POPCNT sweep
  * beats the index, `doc/01-motivation-and-overview.md:801-814` — same
  * economics apply to a vectorized dot-product sweep). The scale path is
  * random-hyperplane LSH bucketing, which is exactly the SimHash machinery:
  * sign-of-projection bits, Hamming banding, verify by true cosine.
  *
  * Dot products run in a compiled Scala UDF (left-to-right double
  * accumulation, arithmetic-identical to the DuckDB oracle's
  * `list_dot_product`): Catalyst's `aggregate` higher-order function is
  * CodegenFallback and ~100x slower in the O(n²) verify loop. Norms are
  * computed once per row BEFORE the pair join, not per pair.
  */
object EmbeddingOps {

  /** Left-to-right double-precision dot product. */
  val dotUdf = udf((a: Seq[Float], b: Seq[Float]) => {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  })

  def normCol(a: Column): Column = sqrt(dotUdf(a, a))

  /** Tiny inputs arrive as one parquet split; fan the O(n²) stream side out
    * to the session's parallelism before the pair join. */
  private def fanOut(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Exact top-k neighbors by cosine for the query set `vec_id < nQueries`.
    * The query side is tiny → broadcast; the corpus side streams through one
    * compiled projection — no shuffle until the per-query top-k window. */
  def knnBrute(emb: DataFrame, nQueries: Int = 10, k: Int = 5): DataFrame = {
    val withNorm = emb.select(col("vec_id"), col("embedding"),
      normCol(col("embedding")).as("nrm"))
    val queries = withNorm.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))
    val corpus = fanOut(withNorm)
      .select(col("vec_id").as("n_id"), col("embedding").as("n_emb"),
        col("nrm").as("n_nrm"))
    val scored = broadcast(queries).join(corpus, col("q_id") =!= col("n_id"))
      .withColumn("cos",
        dotUdf(col("q_emb"), col("n_emb")) / (col("q_nrm") * col("n_nrm")))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("rank"), round(col("cos"), 4).as("cos"))
      .orderBy("q_id", "rank")
  }

  /** All pairs with cosine >= `minCos` — embedding near-duplicate detection.
    * Exact (block-nested-loop self-join); the LSH variant below is the
    * 100×-scale path. */
  def cosinePairs(emb: DataFrame, minCos: Double): DataFrame = {
    val withNorm = emb.select(col("vec_id"), col("embedding"),
      normCol(col("embedding")).as("nrm"))
    val a = fanOut(withNorm).select(col("vec_id").as("a"),
      col("embedding").as("a_emb"), col("nrm").as("a_nrm"))
    val b = withNorm.select(col("vec_id").as("b"),
      col("embedding").as("b_emb"), col("nrm").as("b_nrm"))
    a.join(broadcast(b), col("a") < col("b"))
      .withColumn("cos",
        dotUdf(col("a_emb"), col("b_emb")) / (col("a_nrm") * col("b_nrm")))
      .filter(col("cos") >= minCos)
      .select(col("a").as("vec_a"), col("b").as("vec_b"),
        round(col("cos"), 4).as("cos"))
      .orderBy("vec_a", "vec_b")
  }

  /** Per-label centroid stats (count, mean norm) — the cheap clustering
    * sanity aggregate. */
  def labelStats(emb: DataFrame): DataFrame =
    emb.select(col("label"), normCol(col("embedding")).as("nrm"))
      .groupBy("label")
      .agg(count(lit(1)).as("n"), round(avg("nrm"), 4).as("mean_norm"))
      .orderBy("label")

  /** Deterministic pseudo-random hyperplane component for (plane, dim) —
    * splitmix-derived, centered on 0. */
  private def hyperplane(planes: Int, dims: Int): Array[Array[Double]] =
    Array.tabulate(planes, dims) { (p, d) =>
      val h = graft.images.SyntheticCorpus.mix64(0x5EEDL + p * 131L + d * 7919L)
      (h >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
    }

  /** Random-hyperplane LSH ANN, structured exactly like the SimHash index:
    * `planes` sign-of-projection bits form an embedding SimHash, banded into
    * (bands × rowsPerBand) bucket keys; candidates collide in >= 1 band and
    * are verified by exact cosine. Two vectors at angle θ agree per bit with
    * probability 1-θ/π, so a band of r bits collides with p^r — recall at a
    * given cosine is tuned by (bands, rowsPerBand): r=4,b=16 gives ~0.96
    * recall at cos 0.4; production raises r (narrower buckets) and b.
    * The bucket id is an equi-join/partition key, so the 10^12-row version
    * is a shuffle on (band, key) instead of a cross join. Approximate by
    * construction → recall measured against `cosinePairs` in tests, not
    * oracle-gated. */
  def lshCosinePairs(emb: DataFrame, minCos: Double, planes: Int = 64,
      bands: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    require(bands * rowsPerBand <= planes)
    val dims = 64
    val H = hyperplane(planes, dims)
    val bucketUdf = udf((v: Seq[Float]) => {
      val bits = new Array[Boolean](planes)
      var p = 0
      while (p < planes) {
        var s = 0.0
        var d = 0
        while (d < dims && d < v.length) { s += H(p)(d) * v(d); d += 1 }
        bits(p) = s >= 0
        p += 1
      }
      Array.tabulate(bands) { b =>
        var key = 0L
        var r = 0
        while (r < rowsPerBand) {
          key = (key << 1) | (if (bits(b * rowsPerBand + r)) 1L else 0L)
          r += 1
        }
        graft.pipeline.BandKey(b, key)
      }
    })
    val withNorm = fanOut(emb).select(col("vec_id"), col("embedding"),
      normCol(col("embedding")).as("nrm"))
    val banded = withNorm.select(col("vec_id"), col("embedding"), col("nrm"),
      explode(bucketUdf(col("embedding"))).as("bk"))
      .select(col("vec_id"), col("embedding"), col("nrm"),
        col("bk.band_id"), col("bk.band_key"))
    banded.select(col("band_id"), col("band_key"), col("vec_id").as("a"),
        col("embedding").as("a_emb"), col("nrm").as("a_nrm"))
      .join(banded.select(col("band_id"), col("band_key"),
        col("vec_id").as("b"), col("embedding").as("b_emb"),
        col("nrm").as("b_nrm")), Seq("band_id", "band_key"))
      .filter(col("a") < col("b"))
      .select("a", "b", "a_emb", "b_emb", "a_nrm", "b_nrm")
      .dropDuplicates("a", "b")
      .withColumn("cos",
        dotUdf(col("a_emb"), col("b_emb")) / (col("a_nrm") * col("b_nrm")))
      .filter(col("cos") >= minCos)
      .select(col("a").as("vec_a"), col("b").as("vec_b"),
        round(col("cos"), 4).as("cos"))
      .orderBy("vec_a", "vec_b")
  }
}
