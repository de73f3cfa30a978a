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

  /** Cross-document repeated-span mining — the second suffix-array-family
    * pass (north rule), generalizing [[containedPairs]] from whole-caption
    * containment to ANY shared verbatim span: pairs (a, b), a < b, whose
    * texts share a common substring of length >= w. This is the
    * "documents sharing a long verbatim repeat" contamination/boilerplate
    * detector a training-data pipeline runs corpus-wide.
    *
    * Two texts share a span of length >= w iff they share at least one
    * w-char window, so the monolithic suffix array shards into the same
    * windowed-hash equi-join as [[containedPairs]]: every row emits its
    * distinct w-window hashes, the self-join on the hash yields candidate
    * pairs (ids only — O(total_chars) shuffled rows of (i64, id)), and the
    * texts are re-joined ONLY for hash-matched candidates, where an exact
    * string-set intersection removes 64-bit collisions and counts the
    * distinct shared windows.
    *
    * Hot-window guard (mirrors `TextOps.ngramJaccardPairs`): a window
    * present in m documents emits m² join rows, and real corpora have
    * boilerplate (licenses, headers) with m in the millions — windows with
    * document frequency > `maxWindowDf` are excluded from candidate
    * generation via a broadcast anti-join and the drop is LOGGED; the
    * DuckDB oracle applies the identical cap, so the operator contract is
    * "pairs sharing a df<=K window" in both engines. `n_shared` is then
    * computed over the FULL window universe by the exact verifier, so its
    * value is cap-independent and collision-proof.
    *
    * @param rows columns (`id`, `text`)
    * @return (a, b, n_shared): a < b, n_shared = number of distinct w-char
    *         windows the two texts share (>= 1)
    */
  def sharedSpanPairs(spark: SparkSession, rows: DataFrame, w: Int = 40,
      maxWindowDf: Int = 1000): DataFrame =
    graft.core.Checkpoints.scoped(spark) {
      sharedSpanPairsImpl(spark, rows, w, maxWindowDf)
    }

  private def sharedSpanPairsImpl(spark: SparkSession, rows: DataFrame,
      w: Int, maxWindowDf: Int): DataFrame = {
    // materialize the (hash, id) table once: it feeds the hot-window count
    // AND both sides of the self-join — without this the text scan + window
    // explode runs four times. The table is ids-only (~16 B/row, ~40% of
    // the raw text bytes at w=40), so checkpointing it is far cheaper than
    // recomputing the explode. (Same windowed-hash explode as
    // `windowTable`, renamed to this operator's key column.)
    val wins = graft.core.Checkpoints.ckpt(
      windowTable(rows, w).select(col("b").as("id"), col("k")))
    val kept = graft.ops.TextOps.dropHotKeys(wins, "k", maxWindowDf,
      "sharedSpanPairs")
    val cands = kept.select(col("id").as("a"), col("k"))
      .join(kept.select(col("id").as("b"), col("k")), "k")
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
    val nSharedUdf = udf((x: String, y: String) => {
      // windows of the shorter text as a set, probe with the longer —
      // O(len_a + len_b) strings, caption/document-length inputs only
      // (this runs per verified CANDIDATE, never per corpus row pair)
      val (s1, s2) = if (x.length <= y.length) (x, y) else (y, x)
      val set = new java.util.HashSet[String]()
      var i = 0
      while (i + w <= s1.length) { set.add(s1.substring(i, i + w)); i += 1 }
      val seen = new java.util.HashSet[String]()
      var n = 0
      var j = 0
      while (j + w <= s2.length) {
        val sub = s2.substring(j, j + w)
        if (set.contains(sub) && seen.add(sub)) n += 1
        j += 1
      }
      n
    })
    cands
      .join(rows.select(col("id").as("a"), col("text").as("a_text")), "a")
      .join(rows.select(col("id").as("b"), col("text").as("b_text")), "b")
      .withColumn("n_shared", nSharedUdf(col("a_text"), col("b_text")))
      .filter(col("n_shared") >= 1)
      .select(col("a"), col("b"), col("n_shared"))
  }

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
