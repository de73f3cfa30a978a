package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-modality hygiene audits over an image+caption corpus, run AFTER
  * the near-dup pipeline: the two directions of disagreement between image
  * evidence and caption evidence are themselves training-data signals.
  * Reference analog: the attract/repulse disagreement discipline of
  * `doc/02-training.md` — items the features say are "the same" while the
  * label stream says otherwise are exactly what gets inspected, and the
  * weighted feature classes (`functionsimhash.cpp` weights) are what make
  * the image signal dominate the signature so a caption edit cannot hide
  * an image duplicate (the same argument as the pinned golden: low-weight
  * class contributions cannot flip an accumulator the high-weight class
  * decided).
  *
  * Scale notes (10^12 rows): captionRewrites joins the verified pair log
  * (near-linear in N by construction — sorted-neighbor candidates) against
  * the caption table twice on image_id; only ids and normalized captions
  * move, never `bytes`. The token-set Jaccard is per-row array arithmetic
  * inside the projection — no shuffle of its own. boilerplateCaptions
  * groups on a 256-bit caption digest (the q16 exact-text-dedup shuffle
  * shape: bounded keys even for pathological captions) and joins ONE
  * representative caption back per surviving group for the report.
  */
object ModalityAudit {

  private def tokens(c: Column): Column =
    array_distinct(filter(split(c, " "), t => length(t) > 0))

  /** Caption-rewrite candidates: image-near-dup pairs (the pipeline's
    * verified pair log) whose NORMALIZED captions differ — the re-caption /
    * alt-text-rewrite case a caption-level dedup can never see. Each pair
    * is ranked by caption token-set Jaccard (low = aggressive rewrite;
    * values near 1 are single-token paraphrases).
    *
    * `pairs` = (a, b) from Dedup.verifiedHamming (signature evidence —
    * NOT the caption-MinHash accept path, which is caption evidence);
    * `captions` = (image_id, caption_norm). Empty-token captions divide by
    * a floor of 1, so the output is never null/NaN in either engine. */
  def captionRewrites(pairs: DataFrame, captions: DataFrame): DataFrame = {
    val ca = captions.select(col("image_id").as("a"),
      col("caption_norm").as("cap_a"))
    val cb = captions.select(col("image_id").as("b"),
      col("caption_norm").as("cap_b"))
    pairs.join(ca, "a").join(cb, "b")
      .filter(col("cap_a") =!= col("cap_b"))
      // token arrays computed ONCE per side in a projection: the split/
      // distinct chain is an interpreted HOF with no common-subexpression
      // elimination, so inlining tokens() into both array_intersect and
      // array_union evaluated each caption's tokenization four times per
      // row (r5 verdict #3). CollapseProject keeps non-cheap multi-use
      // aliases in their own projection, so these stay single evaluations.
      .withColumn("tok_a", tokens(col("cap_a")))
      .withColumn("tok_b", tokens(col("cap_b")))
      .select(col("a"), col("b"),
        (size(array_intersect(col("tok_a"), col("tok_b")))
          .cast("double") /
          greatest(size(array_union(col("tok_a"), col("tok_b"))),
            lit(1))).as("cap_jaccard"))
  }

  /** Boilerplate (spam) captions: one normalized caption shared across
    * >= 2 image near-dup CLUSTERS — not merely >= 2 rows, because
    * re-encoded copies of one image legitimately share their caption; the
    * cluster count is what separates "the same photo twice" from "stock
    * caption pasted onto unrelated images". Output: the caption, how many
    * rows carry it, how many distinct image clusters it spans.
    *
    * `clusters` = (image_id, cluster_id) built from IMAGE-evidence pairs
    * ONLY (Dedup.verifiedHamming → Dedup.clusters) — NOT Dedup.run's full
    * clustering: both caption accept paths (MinHash Jaccard, caption
    * substring) merge identical-caption rows into one cluster by
    * construction, which would mask the very signal this audit measures
    * (spec-asserted). `captions` = (image_id, caption_norm). */
  def boilerplateCaptions(clusters: DataFrame, captions: DataFrame,
      minImages: Int = 2): DataFrame = {
    val keyed = clusters.join(captions, "image_id")
      .select(col("image_id"), col("cluster_id"),
        sha2(col("caption_norm"), 256).as("cap_sha"))
    val groups = keyed.groupBy("cap_sha")
      .agg(count(lit(1)).as("n_images"),
        countDistinct("cluster_id").as("n_clusters"),
        min("image_id").as("rep_id"))
      .filter(col("n_images") >= minImages && col("n_clusters") >= 2)
    groups.join(captions.select(col("image_id").as("rep_id"),
        col("caption_norm")), "rep_id")
      .select("caption_norm", "n_images", "n_clusters")
  }
}
