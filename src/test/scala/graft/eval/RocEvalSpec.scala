package graft.eval

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.core.{SimHash, SimHashConfig, U64Feat}

/** Port of the `evaluate_ROC_curve.py` methodology checks: exact-search
  * TPR falls as the cutoff rises, the approximate (LSH) search retrieves a
  * subset of the exact results, and at the reference's design point
  * (28 buckets, <=26-bit distances ~= sim >= 102, miss probability < 1%,
  * `simhashsearchindex.hpp:40-86`) the approximate TPR tracks the exact
  * one. */
class RocEvalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  /** 30 groups x 4 members; members are ~10-bit perturbations of the group
    * signature, mirroring the XOR-distortion fixture. */
  private lazy val sigs = {
    import spark.implicits._
    val rows = for (g <- 1 to 30; m <- 0 until 4) yield {
      val base = SimHash.simhash128(
        (1 to 150).map(i => U64Feat(graft.images.SyntheticCorpus.mix64(g * 1000L + i))),
        SimHashConfig())
      val rng = new graft.images.SyntheticCorpus.Rng(g.toLong, m.toLong, 3L)
      var (hi, lo) = base
      if (m > 0) (0 until 10).foreach { _ =>
        if (rng.nextInt(2) == 0) hi ^= 1L << rng.nextInt(64)
        else lo ^= 1L << rng.nextInt(64)
      }
      (f"g${g}%02d_m$m", g.toLong, hi, lo)
    }
    rows.toDF("id", "group_id", "sim_hi", "sim_lo").cache()
  }

  test("exact ROC: TPR decreases with cutoff; cutoff 96 catches the groups") {
    val roc = RocEval.exactRoc(sigs).collect()
      .map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val cutoffs = roc.keys.toSeq.sorted
    cutoffs.sliding(2).foreach { case Seq(a, b) =>
      assert(roc(a)._1 >= roc(b)._1, s"TPR not monotone at $a -> $b")
    }
    // ~10-bit distortions => distances ~<= 20 bits => sim >= 108
    assert(roc(96)._1 > 0.95, s"TPR@96 = ${roc(96)._1}")
    assert(roc(96)._2 < 0.05, s"FPR@96 = ${roc(96)._2}")
    assert(roc(128)._1 < 0.5, "exact matches only at cutoff 128")
  }

  test("approximate ROC tracks exact at the design point (sim >= 102)") {
    val exact = RocEval.exactRoc(sigs, Seq(104, 112)).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val approx = RocEval.approxRoc(sigs, cutoffs = Seq(104, 112)).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    Seq(104, 112).foreach { c =>
      assert(approx(c) <= exact(c) + 1e-9, "approx retrieves a subset")
      assert(approx(c) >= 0.95 * exact(c),
        s"approx TPR@$c ${approx(c)} vs exact ${exact(c)}")
    }
  }
}
