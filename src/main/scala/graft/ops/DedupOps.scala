package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.{MinHash, SimHash, SimHashConfig, Tuple3Feat}
import graft.lsh.Bands

/** Deduplication operators over the `documents` table — the text-corpus
  * instantiations of the engine's dedup families: exact (hash groupBy),
  * MinHash+LSH, SimHash+Hamming. The image pipeline (graft.pipeline.Dedup)
  * composes the same kernels over image+caption rows.
  */
object DedupOps {

  /** Exact dedup: content-hash groupBy; keeper = min id per group. The
    * shuffle key is the sha-256 DIGEST of the text, not the text itself —
    * at multi-KB documents grouping by the raw body would move the whole
    * corpus over the network where 32 bytes per row suffice. sha-256, not
    * a 64-bit hash: at 10^12 rows a 64-bit key expects thousands of
    * birthday collisions, each silently merging unrelated documents (same
    * argument as the image cascade's tier 1). NULL text digests to NULL,
    * which groups with its own kind — exactly how the oracle's
    * `GROUP BY text` treats it. */
  def exactDedup(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        sha2(encode(col("text"), "UTF-8"), 256).as("text_sha"))
      .groupBy(col("text_sha"))
      .agg(min("doc_id").as("keeper_id"), count(lit(1)).as("dup_count"))
      .select("keeper_id", "dup_count")
      .orderBy("keeper_id")

  /** MinHash LSH near-dedup: shingle → sketch → band join → verify with
    * EXACT Jaccard on the candidate pairs only. Candidates come from the
    * banded equi-join (never O(n²)); the exact verify makes the output
    * independent of sketch randomness given the bands catch every true pair
    * (b=16, r=4 at j≥0.5: miss probability < 1e-15 per pair).
    *
    * Skew note: the one bucket this op cannot cap away is m IDENTICAL (or
    * near-identical) texts — their pairs are TRUE dups, so a df-cap (the
    * embedding/shingle guard) would drop real edges, yet m² join rows is
    * the web-scale boilerplate blowup. The designed answer is the tiered
    * cascade (`TieredDedup` / the streaming exact front tier): an exact
    * record-hash tier collapses identical content to one survivor BEFORE
    * this op, so the bucket this join sees is bounded by genuine lexical
    * diversity. The empty-shingle filter below handles the other
    * degenerate bucket (all short docs sketching identically). */
  def minhashLshDedup(docs: DataFrame, minJaccard: Double = 0.5,
      k: Int = 64, bands: Int = 16, rows: Int = 4): DataFrame =
    graft.core.Checkpoints.scoped(docs.sparkSession) {
      minhashLshDedupImpl(docs, minJaccard, k, bands, rows)
    }

  /** (doc_id, sh, sketch) over docs with >= 3 tokens — the shared MinHash
    * front of every consumer (intra-corpus dedup here, cross-corpus fuzzy
    * decontamination in [[TextOps.fuzzyDecontaminate]]).
    *
    * The < 3-token filter runs BEFORE the UDFs: docs with < 3 tokens have
    * NO shingles — their sketches are identical all-MaxValue vectors, so
    * banding them would (a) collide every short doc with every other
    * (m short docs emit bands*m^2 join rows, the exact hot-bucket blowup
    * the n-gram path guards against) and (b) verify unrelated short docs
    * at Jaccard 1.0 between EMPTY sets. No shingles = no lexical evidence
    * = no candidates (the DuckDB oracles agree: their Jaccard is NULL on
    * empty unions, so such pairs never pass the threshold either). NULL
    * text tokenizes to NULL, which the filter also drops — before the
    * UDFs, where it would NPE inside sliding(). */
  private[ops] def shingleSketch(docs: DataFrame, k: Int): DataFrame = {
    val shingleUdf = udf((toks: Seq[String]) =>
      toks.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toArray.distinct
        .map(graft.core.HashFamily.stringHash))
    val sketchUdf = udf((sh: Array[Long]) => MinHash.sketch(sh, k))
    docs.select(col("doc_id"), TextOps.tokensCol(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
      .withColumn("sh", shingleUdf(col("toks")))
      .withColumn("sketch", sketchUdf(col("sh")))
      .drop("toks")
  }

  /** (doc_id, band_id, band_key) band explode of a [[shingleSketch]] frame. */
  private[ops] def sketchBands(ws: DataFrame, bands: Int, rows: Int): DataFrame = {
    val bandUdf = udf((sk: Array[Long]) =>
      MinHash.bandKeys(sk, bands, rows).zipWithIndex.map {
        case (key, b) => graft.pipeline.BandKey(b, key)
      })
    ws.select(col("doc_id"), explode(bandUdf(col("sketch"))).as("bk"))
      .select(col("doc_id"), col("bk.band_id"), col("bk.band_key"))
  }

  private def minhashLshDedupImpl(docs: DataFrame, minJaccard: Double,
      k: Int, bands: Int, rows: Int): DataFrame = {
    val withSketchC = graft.core.Checkpoints.ckpt(shingleSketch(docs, k))
    val banded = sketchBands(withSketchC, bands, rows)
    val cands = banded.select(col("band_id"), col("band_key"), col("doc_id").as("a"))
      .join(banded.select(col("band_id"), col("band_key"), col("doc_id").as("b")),
        Seq("band_id", "band_key"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
    // exact verify on candidates only
    val sh = withSketchC.select(col("doc_id"), col("sh"))
    val jacc = udf((x: Seq[Long], y: Seq[Long]) =>
      MinHash.exactJaccard(x.toSet, y.toSet))
    cands
      .join(sh.select(col("doc_id").as("a"), col("sh").as("sh_a")), "a")
      .join(sh.select(col("doc_id").as("b"), col("sh").as("sh_b")), "b")
      .withColumn("jacc", round(jacc(col("sh_a"), col("sh_b")), 4))
      .filter(col("jacc") >= minJaccard)
      .select(col("a").as("doc_a"), col("b").as("doc_b"), col("jacc"))
      .orderBy("doc_a", "doc_b")
  }

  /** SimHash near-dedup: word-3-gram features → 128-bit SimHash → the same
    * permuted-band LSH the image pipeline uses → Hamming verify. Split into
    * the hash-kernel half (`simhashBanded`) and the relational half
    * (`simhashPairsFromBands`) so the latter can be oracle-checked in
    * DuckDB from a dump of the former (q18). */
  def simhashDedup(docs: DataFrame, maxHamming: Int = 25,
      nBands: Int = 28, prefixBits: Int = 8): DataFrame =
    simhashPairsFromBands(simhashBanded(docs, nBands, prefixBits), maxHamming)

  /** Kernel half: `(doc_id, hi, lo, band_id, band_key)` — one row per
    * (document, permuted band). */
  def simhashBanded(docs: DataFrame, nBands: Int = 28,
      prefixBits: Int = 8): DataFrame =
    graft.core.Checkpoints.scoped(docs.sparkSession) {
      simhashBandedImpl(docs, nBands, prefixBits)
    }

  private def simhashBandedImpl(docs: DataFrame, nBands: Int,
      prefixBits: Int): DataFrame = {
    val simUdf = udf((toks: Seq[String]) => {
      val feats = toks.sliding(3).filter(_.size == 3)
        .map(w => Tuple3Feat(w(0), w(1), w(2))).toSeq
      val (hi, lo) = SimHash.simhash128(feats, SimHashConfig())
      graft.featurize.Signature(hi, lo, Array.empty[Long])
    })
    val bandUdf = udf((hi: Long, lo: Long) =>
      Bands.simhashBands(hi, lo, nBands, prefixBits).map(r =>
        graft.pipeline.BandKey(r.band_id, r.band_key)))
    val sigs0 = docs
      .select(col("doc_id"), TextOps.tokensCol(col("text")).as("toks"))
      // a doc with < 3 tokens has NO features: the tie rule folds the empty
      // set to the all-ones hash, identical for every such doc, so banding
      // them would declare all short docs mutual duplicates at distance 0.
      // No features = no evidence = no bands (same contract as the minhash
      // path's empty-shingle exclusion above).
      .filter(size(col("toks")) >= 3)
      .withColumn("sig", simUdf(col("toks")))
      .select(col("doc_id"), col("sig.sim_hi").as("hi"), col("sig.sim_lo").as("lo"))
    val sigsC = graft.core.Checkpoints.ckpt(sigs0)
    sigsC.select(col("doc_id"), col("hi"), col("lo"),
      explode(bandUdf(col("hi"), col("lo"))).as("bk"))
      .select(col("doc_id"), col("hi"), col("lo"),
        col("bk.band_id"), col("bk.band_key"))
  }

  /** Relational half: band equi-join → cross-band dedup (groupBy-min) →
    * Hamming threshold. Pure `bit_count(xor(...))` algebra — the part the
    * DuckDB oracle re-derives. */
  def simhashPairsFromBands(banded: DataFrame, maxHamming: Int = 25): DataFrame =
    banded.select(col("band_id"), col("band_key"), col("doc_id").as("a"),
        col("hi").as("a_hi"), col("lo").as("a_lo"))
      .join(banded.select(col("band_id"), col("band_key"), col("doc_id").as("b"),
        col("hi").as("b_hi"), col("lo").as("b_lo")), Seq("band_id", "band_key"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        graft.pipeline.Dedup.hamming128Col(col("a_hi"), col("a_lo"),
          col("b_hi"), col("b_lo")).as("dist"))
      .groupBy("a", "b").agg(min("dist").as("dist"))
      .filter(col("dist") <= maxHamming)
      .select(col("a").as("doc_a"), col("b").as("doc_b"), col("dist"))
      .orderBy("doc_a", "doc_b")
}
