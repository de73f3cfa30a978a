package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.MinHash
import graft.featurize.{FeaturizeConfig, ImageFeaturizer}
import graft.lsh.Bands

/** Dedup pipeline configuration, pinned to the reference's query config where
  * one exists:
  *  - 28 bands (`pybindings.cpp:385`, tests), 8-bit band prefix
  *    (`simhashsearchindex.cpp:65`);
  *  - Hamming verify at similarity > 0.8·128 (`matchfunctionsfromindex.cpp:36,165`)
  *    i.e. distance <= 25;
  *  - our additions per the north rule: MinHash/Jaccard caption verify,
  *    substring-caption pass, hot-bucket cap (the skew guard).
  * `prefixBits` widens beyond 8 for cluster scale (see Bands scaladoc).
  */
final case class DedupConfig(
    nBands: Int = 28,
    prefixBits: Int = 8,
    maxHamming: Int = 25,
    minhashBands: Int = 16,
    minhashRows: Int = 4,
    minJaccard: Double = 0.7,
    substringWindow: Int = 24,
    maxBucketSize: Int = 256,
    featurize: FeaturizeConfig = FeaturizeConfig()) {
  require(minhashBands * minhashRows <= featurize.minhashK,
    "minhash banding exceeds sketch size")
}

/** The near-duplicate detection + clustering pipeline: stage-typed
  * DataFrame→DataFrame transforms (signatures → bands → candidates →
  * verified ∪ substring → clusters), each independently materializable for
  * checkpoint-resume (see StageRunner).
  */
object Dedup {

  /** Stage 1 — featurize + fold: one decode pass per row, emitting
    * (image_id, caption, sim_hi, sim_lo, minhash). The fold is row-local
    * (SURVEY.md §2.4 A1): a scalar UDF inside a projection, no shuffle.
    * Column pruning keeps `bytes` out of every downstream stage. */
  def signatures(images: DataFrame, cfg: DedupConfig): DataFrame = {
    val fz = cfg.featurize
    val sigUdf = udf((bytes: Array[Byte], caption: String) =>
      ImageFeaturizer.signature(bytes, caption, fz))
    val normUdf = udf((c: String) => ImageFeaturizer.normalizeCaption(c))
    images
      .select(col("image_id"), normUdf(col("caption")).as("caption_norm"),
        sigUdf(col("bytes"), col("caption")).as("sig"))
      .select(col("image_id"), col("caption_norm"),
        col("sig.sim_hi").as("sim_hi"), col("sig.sim_lo").as("sim_lo"),
        col("sig.minhash").as("minhash"))
  }

  /** Stage 2 — LSH banding: explode each signature into its (band_id,
    * band_key) bucket rows, both families in one table. This is the Spark
    * form of the reference's sorted index tuples
    * (`simhashsearchindex.hpp:91-99`): the mmap'd ordered set becomes a table
    * shuffled on the bucket key, and `lower_bound` range scans become hash
    * partitioning. */
  def bands(sigs: DataFrame, cfg: DedupConfig): DataFrame = {
    val nb = cfg.nBands; val pb = cfg.prefixBits
    val mb = cfg.minhashBands; val mr = cfg.minhashRows
    val bandsUdf = udf((hi: Long, lo: Long, mh: Array[Long]) =>
      (Bands.simhashBands(hi, lo, nb, pb) ++ Bands.minhashBands(mh, mb, mr))
        .map { case (b, k) => BandKey(b, k) })
    sigs.select(col("image_id"), col("sim_hi"), col("sim_lo"),
        explode(bandsUdf(col("sim_hi"), col("sim_lo"), col("minhash"))).as("bk"))
      .select(col("bk.band_id").as("band_id"), col("bk.band_key").as("band_key"),
        col("image_id"), col("sim_hi"), col("sim_lo"))
  }

  /** Stage 3 — candidate generation: bucket self-join.
    *
    * Skew guard: buckets larger than `maxBucketSize` (degenerate features —
    * blank images, empty captions) are capped to their first N members by
    * image_id; the cap count is observable via the returned `_dropped`
    * accumulator-free metrics DataFrame (see `bucketStats`). The join is an
    * equi-join on (band_id, band_key) so AQE's skew-join splitting also
    * applies. Cross-bucket duplicates collapse via groupBy-min, the
    * reference's candidate-dedup map (`simhashsearchindex.cpp:51,102`).
    */
  def candidates(bandsDf: DataFrame, cfg: DedupConfig): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("band_id", "band_key").orderBy("image_id")
    val capped = bandsDf
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= cfg.maxBucketSize)
      .drop("_rn")
    val a = capped.select(col("band_id"), col("band_key"),
      col("image_id").as("a"), col("sim_hi").as("a_hi"), col("sim_lo").as("a_lo"))
    val b = capped.select(col("band_id"), col("band_key"),
      col("image_id").as("b"), col("sim_hi").as("b_hi"), col("sim_lo").as("b_lo"))
    a.join(b, Seq("band_id", "band_key"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        hamming128Col(col("a_hi"), col("a_lo"), col("b_hi"), col("b_lo")).as("dist"))
      .groupBy("a", "b").agg(min("dist").as("dist"))
  }

  /** Full-width Hamming distance as a built-in column expression — pure
    * codegen, no UDF (`bit_count` ≥ Spark 3.3; SURVEY.md §1.3). */
  def hamming128Col(aHi: Column, aLo: Column, bHi: Column, bLo: Column): Column =
    bit_count(aHi.bitwiseXOR(bHi)) + bit_count(aLo.bitwiseXOR(bLo))

  /** Stage 4 — verify: accept a candidate pair if its SimHash Hamming
    * distance passes F5 (`dist <= maxHamming`), else look up both MinHash
    * sketches and accept on estimated caption Jaccard >= minJaccard. Only the
    * Hamming-rejected remainder pays the sketch join. */
  def verified(cands: DataFrame, sigs: DataFrame, cfg: DedupConfig): DataFrame = {
    val byHamming = cands.filter(col("dist") <= cfg.maxHamming)
      .select(col("a"), col("b"))
    val rest = cands.filter(col("dist") > cfg.maxHamming)
    val jacc = udf((x: Array[Long], y: Array[Long]) => MinHash.estimateJaccard(x, y))
    val mh = sigs.select(col("image_id"), col("minhash"))
    val byJaccard = rest
      .join(mh.select(col("image_id").as("a"), col("minhash").as("mh_a")), "a")
      .join(mh.select(col("image_id").as("b"), col("minhash").as("mh_b")), "b")
      .filter(jacc(col("mh_a"), col("mh_b")) >= cfg.minJaccard)
      .select(col("a"), col("b"))
    byHamming.union(byJaccard)
  }

  /** Stage 5 — exact substring-duplicate captions (north-rule must-link). */
  def substringPairs(sigs: DataFrame, cfg: DedupConfig): DataFrame =
    SubstringDup.containedPairs(sigs.sparkSession,
      sigs.select(col("image_id").as("id"), col("caption_norm").as("text")),
      cfg.substringWindow)

  /** Stage 6 — clusters: connected components over all accepted pairs. */
  def clusters(images: DataFrame, pairs: DataFrame): DataFrame =
    ConnectedComponents.run(images.sparkSession, pairs,
      images.select(col("image_id").as("id")))
      .withColumnRenamed("id", "image_id")

  /** End-to-end: images → (image_id, cluster_id). */
  def run(images: DataFrame, cfg: DedupConfig = DedupConfig()): DataFrame = {
    val sigs = signatures(images, cfg).localCheckpoint()
    val cands = candidates(bands(sigs, cfg), cfg)
    val pairs = verified(cands, sigs, cfg)
      .union(substringPairs(sigs, cfg))
      .distinct()
    clusters(images, pairs)
  }

  /** All predicted duplicate pairs implied by the clustering (for the recall
    * gate): within-cluster pairs, a < b. */
  def clusterPairs(clusterDf: DataFrame): DataFrame = {
    val l = clusterDf.select(col("cluster_id"), col("image_id").as("a"))
    val r = clusterDf.select(col("cluster_id"), col("image_id").as("b"))
    l.join(r, "cluster_id").filter(col("a") < col("b")).select("a", "b")
  }

  /** Per-bucket size stats — the skew observability feed for the metrics
    * table (north rule: no silent truncation). */
  def bucketStats(bandsDf: DataFrame, cfg: DedupConfig): DataFrame =
    bandsDf.groupBy("band_id", "band_key").count()
      .agg(count(lit(1)).as("buckets"),
        max("count").as("max_bucket"),
        sum(when(col("count") > cfg.maxBucketSize,
          col("count") - cfg.maxBucketSize).otherwise(0L)).as("rows_capped"))
}

final case class BandKey(band_id: Int, band_key: Long)
