package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.images.SyntheticCorpus

class TieredImageDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("tiered image cascade: first-tier-wins attribution, verdicts partition the corpus") {
    val cfg = DedupConfig()
    val (images, _) = SyntheticCorpus.generate(spark, nGroups = 20,
      variantsPerGroup = 3, nDistractors = 15)
    // plant byte-identical copies of a deterministic subset: suffixed ids
    // sort AFTER their originals (prefix property), so the original is the
    // expected tier-1 canonical
    val copies = images.filter(pmod(crc32(col("image_id")), lit(5)) === 0)
      .withColumn("image_id", concat(col("image_id"), lit("~c")))
    val all = images.union(copies).cache()
    val res = TieredImageDedup.run(all, cfg)
    val v = res.verdicts.collect()
      .map(r => r.getString(0) -> ((r.getInt(1), r.getString(2)))).toMap

    // exactly one verdict per image
    assert(v.size.toLong === all.count())
    // every planted copy is dropped at tier 1; its canonical is at most its
    // original (tier 1 keys on the whole record — bytes AND caption — so a
    // smaller sibling is only possible if the corpus itself contains a
    // full-record duplicate, e.g. a paraphrase that swapped zero tokens)
    val copyIds = copies.select("image_id").collect().map(_.getString(0))
    assert(copyIds.nonEmpty)
    copyIds.foreach { id =>
      val (tier, canon) = v(id)
      assert(tier === 1, s"verdict for $id: ${v(id)}")
      assert(canon <= id.stripSuffix("~c"), s"verdict for $id: ${v(id)}")
    }
    // tier-2 and tier-3 evidence never mentions an id a cheaper tier dropped
    // (the expensive tiers only see survivors)
    val d1 = v.filter { case (_, (t, _)) => t == 1 }.keySet
    val nearIds = res.nearPairs.select("a").union(res.nearPairs.select("b"))
      .collect().map(_.getString(0)).toSet
    assert(nearIds.intersect(d1).isEmpty)
    val d12 = d1 ++ v.filter { case (_, (t, _)) => t == 2 }.keySet
    val subIds = res.subPairs.select("a").union(res.subPairs.select("b"))
      .collect().map(_.getString(0)).toSet
    assert(subIds.intersect(d12).isEmpty)
    // the corpus plants substring-caption rows (~1/8 of groups) — with 20
    // groups the tier-3 mechanism must actually fire
    assert(v.values.exists(_._1 == 3), "no tier-3 drop on a corpus that plants substring rows")

    // consistency with the monolithic pipeline: every tiered drop links two
    // images the union-closure pipeline also co-clusters (each tier's edge
    // set is a subset of the monolithic edge set, so closure containment
    // must hold pairwise)
    val mono = Dedup.run(all, cfg).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    v.foreach { case (id, (t, c)) =>
      if (t > 0) assert(mono(id) === mono(c),
        s"tier-$t drop $id -> $c straddles monolithic clusters")
    }
    // and the tiered cascade never merges MORE than the monolithic closure:
    // survivors >= monolithic cluster count (separate closures may keep an
    // extra representative, never fewer)
    val keptN = v.values.count(_._1 == 0)
    assert(keptN >= mono.values.toSet.size)
    all.unpersist()
    ()
  }

  test("reduced-band multi-probe config keeps the wide config's tier-2 drops") {
    // the cascade's tier 2 under DedupConfig(nBands = 8, bandProbes = 3)
    // must recover the 28-band run's near-dup evidence via transient probe
    // rows (candidateBands) — the same contract DedupPipelineSpec pins for
    // the monolithic run, here through the tiered surface
    val (images, truth) = SyntheticCorpus.generate(spark, nGroups = 10,
      variantsPerGroup = 3, nDistractors = 12)
    val all = images.localCheckpoint()
    def drops(cfg: DedupConfig): Map[String, String] =
      TieredImageDedup.run(all, cfg).verdicts.collect()
        .filter(_.getInt(1) > 0)
        .map(r => r.getString(0) -> r.getString(2)).toMap
    val wide = drops(DedupConfig())
    val probed = drops(DedupConfig(nBands = 8, bandProbes = 3))
    // every wide-config drop has SOME drop verdict under the probed config
    // (canonical election may differ when candidate edges differ; what must
    // not happen is a dup surviving the reduced-band cascade)
    val lost = wide.keySet.diff(probed.keySet)
    assert(lost.isEmpty,
      s"${lost.size} wide-config drops survived the 8-band+3-probe cascade")
  }

  test("null-bytes rows flow through the cascade: tier-1 dedup, tier-3 captions, no decode crash") {
    import spark.implicits._
    val cfg = DedupConfig()
    val (images, truth) = SyntheticCorpus.generate(spark, nGroups = 4,
      variantsPerGroup = 2, nDistractors = 4)
    // recordSha's contract: null bytes group with their own kind instead
    // of vanishing — and tier 2 must ROUTE AROUND them (no pixel evidence)
    // instead of feeding null to the decoder
    val longCap = "this caption is long enough to exceed the substring window"
    // a DISTRACTOR (pixel-unrelated, so it survives tier 2) whose caption
    // will contain cap2 — and an undecodable row "aa_null" whose id sorts
    // BEFORE every synthetic id ("img_..."): blind min-id election would
    // crown the null-bytes row and drop the only pixel-bearing copy
    val cap2 = "another long caption that exceeds the substring window easily"
    // distractor = a SINGLETON truth group (truth lists every image, so an
    // anti-join against it selects nothing)
    val distractor = truth.groupBy("group_id")
      .agg(count(lit(1)).as("n"), min("image_id").as("id"))
      .filter(col("n") === 1)
      .select("id").orderBy("id").limit(1)
      .collect()(0).getString(0)
    val withCap2 = images.withColumn("caption",
      when(col("image_id") === distractor, lit(s"start $cap2 end"))
        .otherwise(col("caption")))
    val nullRows = Seq(
      graft.images.ImageRow("zz_null_a", null, 0, 0, "none", longCap, 0L),
      graft.images.ImageRow("zz_null_b", null, 0, 0, "none", longCap, 0L),
      graft.images.ImageRow("zz_null_c", null, 0, 0, "none",
        s"prefix text then $longCap and a suffix", 0L),
      graft.images.ImageRow("zz_null_d", null, 0, 0, "none",
        "an entirely unrelated short note", 0L),
      graft.images.ImageRow("aa_null", null, 0, 0, "none", cap2, 0L)).toDF()
    val all = withCap2.unionByName(nullRows).localCheckpoint()
    val v = TieredImageDedup.run(all, cfg).verdicts.collect()
      .map(r => r.getString(0) -> ((r.getInt(1), r.getString(2)))).toMap
    // every row got exactly one verdict (nothing crashed, nothing vanished)
    assert(v.size.toLong === all.count())
    // identical (null, caption) records collapse at tier 1
    assert(v("zz_null_b") === ((1, "zz_null_a")))
    // a null-bytes survivor whose caption CONTAINS another's joins at the
    // caption tier (its only evidence channel)
    assert(v("zz_null_c") === ((3, "zz_null_a")))
    // no spurious merge for the unrelated null-bytes row
    assert(v("zz_null_d") === ((0, "zz_null_d")))
    // mixed component: canonical election must prefer the DECODABLE record
    // even though the null-bytes id sorts first — dropping the only
    // pixel-bearing copy would be data loss
    assert(v("aa_null") === ((3, distractor)), s"aa_null verdict ${v("aa_null")}")
    assert(v(distractor) === ((0, distractor)))
  }
}
