package graft.io

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class TableIOSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("stage runner: recompute once, resume from manifest, invalidate on config change") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-io").toString
    val io = new ParquetTableIO(root)
    var computes = 0
    def runner(h: String) = new StageRunner(io, spark, h)

    val r1 = runner("cfg-A")
    val out1 = r1.stage("sigs") { computes += 1; Seq(1, 2, 3).toDF("x") }
    assert(out1.count() === 3 && computes === 1)
    assert(r1.lineageLog === Seq(("sigs", false)))

    // resume: same config hash -> no recompute
    val r2 = runner("cfg-A")
    val out2 = r2.stage("sigs") { computes += 1; Seq(9).toDF("x") }
    assert(out2.count() === 3 && computes === 1)
    assert(r2.lineageLog === Seq(("sigs", true)))

    // config change -> stale manifest ignored, recompute
    val r3 = runner("cfg-B")
    val out3 = r3.stage("sigs") { computes += 1; Seq(7, 8).toDF("x") }
    assert(out3.count() === 2 && computes === 2)
  }

  test("a failed rewrite invalidates the previous commit instead of leaving a stale manifest") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-io-crash").toString
    val io = new ParquetTableIO(root)
    io.writeStage(Seq(1, 2, 3).toDF("x"), "sigs", "cfg-A")
    assert(io.readStage(spark, "sigs", "cfg-A").isDefined)
    // a rewrite under a new config that DIES mid-write (here: a task
    // failure; a driver kill behaves the same) must not leave the OLD
    // manifest pointing at torn new-config data — the old commit is
    // invalidated before the data dir is touched, so the crashed stage
    // reads as absent and is recomputed on resume
    val boom = org.apache.spark.sql.functions.udf((i: Int) =>
      if (i > 0) throw new RuntimeException("boom") else i)
    intercept[Exception] {
      io.writeStage(Seq(4, 5).toDF("x")
        .select(boom(org.apache.spark.sql.functions.col("x")).as("x")),
        "sigs", "cfg-B")
    }
    assert(io.readStage(spark, "sigs", "cfg-A").isEmpty,
      "stale manifest survived a failed rewrite")
    assert(io.readStage(spark, "sigs", "cfg-B").isEmpty)
  }
}
