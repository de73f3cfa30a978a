package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.lsh.Bands
import graft.pipeline.{Dedup, DedupConfig}

/** The reference's primary API re-expressed as DataFrame transforms:
  * `SimHashSearchIndex.AddFunction` / `QueryTopN`
  * (`searchbackend/simhashsearchindex.cpp:48-187`, surfaced in
  * `pybindings.cpp:360-517` as add_function/query_top_N).
  *
  * The index is a table, not a file: one row per (permutation, bucket)
  * per record, range-layout-friendly (write it `repartitionByRange(band_id,
  * band_key)` + `sortWithinPartitions` to parquet/Iceberg and bucket probes
  * become partition-pruned scans). Queries are a small batch broadcast
  * against the index — the reference's per-query `lower_bound` bucket scan
  * becomes one equi-join on (band_id, band_key).
  */
object SimIndex {

  /** Build index rows from signatures `(id, sim_hi, sim_lo)`. Append = just
    * union/append more rows (the reference's index-file append, K1).
    * Carries BOTH the un-permuted signature (`sim_hi/sim_lo`, for the
    * full-width Hamming verify) and the permuted band words
    * (`sort_hi/sort_lo` — what the reference's `IndexEntry` actually stores,
    * `simhashsearchindex.hpp:91-99`, and what `DumpIndexToStdout` prints). */
  def build(sigs: DataFrame, cfg: DedupConfig = DedupConfig()): DataFrame = {
    val nb = cfg.nBands; val pb = cfg.prefixBits
    val bandsUdf = udf((hi: Long, lo: Long) => Bands.simhashBands(hi, lo, nb, pb))
    sigs.select(col("id"), col("sim_hi"), col("sim_lo"),
        explode(bandsUdf(col("sim_hi"), col("sim_lo"))).as("bk"))
      .select(col("bk.band_id").as("band_id"), col("bk.band_key").as("band_key"),
        col("bk.sort_hi").as("sort_hi"), col("bk.sort_lo").as("sort_lo"),
        col("id"), col("sim_hi"), col("sim_lo"))
  }

  /** Top-N most-similar index entries per query, reference semantics:
    * probe the query's `nBands` permuted buckets, full-width Hamming on every
    * collision, dedup per candidate (A3), `similarity = 128 - distance`,
    * keep `similarity > minSimilarity*128` (strict, F5,
    * `matchfunctionsfromindex.cpp:165`), rank by (distance asc, id asc) and
    * take N (`simhashsearchindex.cpp:111-136`).
    *
    * With `extraProbes > 0` (multi-probe — Lv et al. applied to the
    * permuted-band layout), each query band also probes that many
    * flipped-key buckets, flipping its lowest-|fold-accumulator| key bits
    * first; queries must then carry a `margins` column (the 128-entry
    * array from `SimHash.simhash128WithMargins`). Probing buys back the
    * recall a smaller `cfg.nBands` gives up — the INDEX side, which is
    * what dominates storage at 10^12 rows, shrinks by the band ratio while
    * only the per-query probe fan-out grows. Candidate semantics are
    * unchanged: full-width Hamming verify, per-candidate dedup, same
    * ranking (probing can only ADD candidates, never alter a distance).
    *
    * @param queries `(query_id, sim_hi, sim_lo[, margins])` — small batch
    *   (broadcast)
    */
  def queryTopN(index: DataFrame, queries: DataFrame, n: Int,
      minSimilarity: Double, cfg: DedupConfig = DedupConfig(),
      extraProbes: Int = 0): DataFrame = {
    val nb = cfg.nBands; val pb = cfg.prefixBits
    val probes0 =
      if (extraProbes == 0) {
        val bandsUdf =
          udf((hi: Long, lo: Long) => Bands.simhashBands(hi, lo, nb, pb))
        queries.select(col("query_id"),
          col("sim_hi").as("q_hi"), col("sim_lo").as("q_lo"),
          explode(bandsUdf(col("sim_hi"), col("sim_lo"))).as("bk"))
      } else {
        require(queries.columns.contains("margins"),
          "multi-probe queries need a margins column " +
            "(SimHash.simhash128WithMargins)")
        val probeUdf = udf((hi: Long, lo: Long, m: Seq[Double]) =>
          Bands.simhashBands(hi, lo, nb, pb) ++
            Bands.simhashProbeBands(hi, lo, m.toArray, nb, pb, extraProbes))
        queries.select(col("query_id"),
          col("sim_hi").as("q_hi"), col("sim_lo").as("q_lo"),
          explode(probeUdf(col("sim_hi"), col("sim_lo"), col("margins"))).as("bk"))
      }
    val probes = probes0
      .select(col("bk.band_id").as("band_id"), col("bk.band_key").as("band_key"),
        col("query_id"), col("q_hi"), col("q_lo"))
    val hits = broadcast(probes)
      .join(index, Seq("band_id", "band_key"))
      .select(col("query_id"), col("id"),
        Dedup.hamming128Col(col("q_hi"), col("q_lo"),
          col("sim_hi"), col("sim_lo")).as("dist"))
      .groupBy("query_id", "id").agg(min("dist").as("dist"))
      .withColumn("similarity", lit(128) - col("dist"))
      .filter(col("similarity") > lit(minSimilarity * 128))
    val w = Window.partitionBy("query_id")
      .orderBy(col("dist").asc, col("id").asc)
    hits.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= n)
      .select("query_id", "id", "similarity", "rank")
  }

  /** J3 — metadata enrichment of query results, the composition the
    * reference's match tool performs per hit
    * (`matchfunctionsfromindex.cpp:189-196`): candidate id → file name,
    * base64-decoded symbol, vulnerability flag. Metadata is the small side
    * → broadcast left join; hits with no metadata row keep null columns
    * (the reference prints them bare). `metadata` is `RefFormats
    * .readMetadata` output; ids follow the `fileid:address` convention. */
  def enrichTopN(results: DataFrame, metadata: DataFrame): DataFrame =
    results.join(
      broadcast(metadata.select(
        concat_ws(":", col("file_id"), col("address")).as("id"),
        col("file_name"), col("symbol"), col("vulnerable"))),
      Seq("id"), "left")

  /** Index introspection — the `indexed_functions` / `get_used_size`
    * surface (`pybindings.cpp:430-474`, stats dump
    * `simhashsearchindex.cpp:189-211`): total index entries, distinct
    * indexed records, occupied buckets, and the largest bucket (the skew
    * signal). Free/used BYTE sizes are deliberately absent — columnar
    * storage is elastic, the mmap-full guard (F8) has no analog. */
  def stats(index: DataFrame): DataFrame = {
    val buckets = index.groupBy("band_id", "band_key").count()
    index.agg(count(lit(1)).as("index_entries"),
        countDistinct("id").as("indexed_records"))
      .crossJoin(buckets.agg(count(lit(1)).as("occupied_buckets"),
        max("count").as("max_bucket")))
  }

  /** `GetOddsOfRandomHit` (`simhashsearchindex.cpp:142-157`), same
    * direction and scale as the reference: "such a deviation would occur by
    * chance once every RESULT searches" — BIGGER is better; < 1 means the
    * match is probably random. Normal approximation of Binomial(128, 0.5)
    * (mean 64, sd sqrt(32)): `1 / (1 - erf(z/sqrt 2)) / indexedRecords`
    * where z = |similarity - 64| / sd. */
  def oddsOfRandomHit(similarity: Int, indexedRecords: Long): Double = {
    val sd = math.sqrt(128.0 * 0.5 * 0.5)
    val z = math.abs(similarity - 64.0) / sd
    // complementary tail computed DIRECTLY (erfc), not as 1 - erf: for
    // similarity ≳ 112 the tail is below ulp(1.0) and `1 - erf(z)` cancels
    // to exactly 0.0, returning Infinity for the strongest (most common)
    // hits; the A&S polynomial times exp(-x²) keeps it finite
    1.0 / erfc(z / math.sqrt(2.0)) / indexedRecords
  }

  /** Complementary error function via Abramowitz–Stegun 7.1.26
    * (|err| < 1.5e-7 absolute; the poly·exp(−x²) form stays accurate and
    * non-zero deep into the tail where 1−erf(x) underflows). */
  private def erfc(x: Double): Double = {
    val a = math.abs(x)
    val t = 1.0 / (1.0 + 0.3275911 * a)
    val tail = (((((1.061405429 * t - 1.453152027) * t) + 1.421413741) * t -
      0.284496736) * t + 0.254829592) * t * math.exp(-a * a)
    if (x >= 0) tail else 2.0 - tail
  }
}
