package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.HashFamily

/** Exact substring-duplicate pass over normalized captions: find all pairs
  * (a, b) where a's full caption appears verbatim inside b's caption.
  *
  * The reference has no counterpart (north-rule addition, SURVEY.md §7.4).
  * A monolithic suffix array over the concatenated corpus cannot shard at
  * 10^12 rows, so this uses the equivalent anchored windowed-hash join:
  *  - every caption with length >= w emits ONE anchor = hash of its first w
  *    characters;
  *  - every caption emits a rolling set of ALL w-length window hashes;
  *  - if b contains a, then b has a window equal to a's first w chars, so the
  *    equi-join (anchor == window) finds every true containment; an exact
  *    `contains` filter removes hash/prefix false positives.
  * Window hashes per row are O(len) and the join is a plain shuffled
  * equi-join — fully distributed, no global structure. Captions shorter than
  * w are handled exactly by a second equi-join on the full short text versus
  * windows of every length-bucket < w only if enabled; the default pipeline
  * scopes the guarantee to len >= w (documented; short captions still dedup
  * via the n-gram/minhash path).
  */
object SubstringDup {

  /** 64-bit hashes of every `w`-char window of `s` (deterministic; FNV via
    * HashFamily.stringHash on the substring — O(len·w) worst case, fine for
    * caption-length strings; a rolling polynomial hash drops the w factor if
    * captions grow). */
  def windowHashes(s: String, w: Int): Array[Long] = {
    if (s == null || s.length < w) Array.empty
    else Array.tabulate(s.length - w + 1)(i => HashFamily.stringHash(s.substring(i, i + w)))
  }

  /** Anchor table (`a`, `k`): one row per text with length >= w, k = hash of
    * its first w chars. Materializable state for the incremental path. */
  def anchorTable(rows: DataFrame, w: Int): DataFrame = {
    val anchorUdf = udf((s: String) => HashFamily.stringHash(s.substring(0, w)))
    rows.filter(length(col("text")) >= w)
      .select(col("id").as("a"), anchorUdf(col("text")).as("k"))
  }

  /** Window table (`b`, `k`): one row per distinct w-length window hash. */
  def windowTable(rows: DataFrame, w: Int): DataFrame = {
    val winUdf = udf((s: String) => windowHashes(s, w).distinct)
    rows.select(col("id").as("b"), explode(winUdf(col("text"))).as("k"))
  }

  /** Exact-contains verification of bare (a, b) candidates against the text
    * table: re-join texts only for hash-matched candidates. */
  def verifyContained(cands: DataFrame, rows: DataFrame): DataFrame =
    cands
      .join(rows.select(col("id").as("a"), col("text").as("a_text")), "a")
      .join(rows.select(col("id").as("b"), col("text").as("b_text")), "b")
      .filter(col("b_text").contains(col("a_text")))
      .select(col("a"), col("b"))

  /** @param rows columns (`id`, `text`) — text should already be normalized
    * @return pairs (a, b), a != b, where text(a) is a substring of text(b)
    *         and length(text(a)) >= w
    */
  def containedPairs(spark: SparkSession, rows: DataFrame, w: Int = 24): DataFrame = {
    // the window join ships ONLY (hash, id) — carrying the caption text
    // itself through the exploded window rows multiplies the shuffle by the
    // caption length (measured ~20 GB at 1.8M rows); texts are re-joined for
    // the exact-contains verify on the (few) hash-matched candidates only
    val cands = anchorTable(rows, w).join(windowTable(rows, w), "k")
      .filter(col("a") =!= col("b"))
      .select(col("a"), col("b"))
      .distinct()
    verifyContained(cands, rows)
  }
}
