package graft.refio

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class RefFormatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def writeTemp(lines: Seq[String]): String = {
    val f = Files.createTempFile("refio", ".txt")
    Files.writeString(f, lines.mkString("\n"))
    f.toString
  }

  test("C10 parseFeatureHash: 16/32/35-char forms, reject junk") {
    assert(RefFormats.parseFeatureHash("c3a5c85c97cb3127") ===
      Some((0xc3a5c85c97cb3127L, 0L)))
    assert(RefFormats.parseFeatureHash("c3a5c85c97cb3127b492b66fbe98f273") ===
      Some((0xc3a5c85c97cb3127L, 0xb492b66fbe98f273L)))
    assert(RefFormats.parseFeatureHash("1f.c3a5c85c97cb3127b492b66fbe98f273") ===
      Some((0xc3a5c85c97cb3127L, 0xb492b66fbe98f273L)))
    assert(RefFormats.parseFeatureHash("xyz") === None)
    assert(RefFormats.parseFeatureHash("12345") === None)
  }

  test("S5 weights scan: hex key -> weight map keyed by high word") {
    val p = writeTemp(Seq(
      "c3a5c85c97cb3127 0.5",
      "b492b66fbe98f2739ae16a3b2f90404f 2.25",
      "",
      "badline"))
    val w = RefFormats.readWeights(spark, p)
    assert(w === Map(0xc3a5c85c97cb3127L -> 0.5, 0xb492b66fbe98f273L -> 2.25))
  }

  test("zero-weights file semantics: all-zero weights give the all-ones hash") {
    // mirrors testdata/train_zero_weights + functionsimhash_test.cpp:33-95
    import graft.core._
    val feats = Seq(U64Feat(42L), Tuple3Feat("a", "b", "c"))
    val ids = feats.map(_.hash128(0)._1)
    val cfg = SimHashConfig(weights = ids.map(_ -> 0.0).toMap)
    assert(SimHash.simhash128(feats, cfg) === ((-1L, -1L)))
  }

  test("S6 metadata scan: 5 columns with base64 symbol decode") {
    val sym = java.util.Base64.getEncoder.encodeToString("RarVM::ExecuteCode".getBytes)
    val p = writeTemp(Seq(s"0123456789abcdef unrar.exe 806c811 $sym true"))
    val m = RefFormats.readMetadata(spark, p).collect()(0)
    assert(m.getString(0) === "0123456789abcdef")
    assert(m.getString(3) === "RarVM::ExecuteCode")
    assert(m.getBoolean(4) === true)
  }

  test("S7 + U2 + J4 + A4: training files -> features, ids, pair distance stats") {
    val fns = writeTemp(Seq(
      "f1:100 c3a5c85c97cb3127b492b66fbe98f273 9ae16a3b2f90404f0000000000000001",
      "f2:200 c3a5c85c97cb3127b492b66fbe98f273",
      "f3:300 000000000000000f0000000000000002"))
    val features = RefFormats.readFunctionFeatures(spark, fns)
    assert(features.count() === 4)
    val ids = RefFormats.featureIds(features)
    assert(ids.count() === 3) // global dedup: f1 and f2 share a feature
    assert(ids.agg(max("feature_id")).collect()(0).getLong(0) === 2L)

    // pair stats over simhashes derived from those features
    import spark.implicits._
    val sims = features.groupBy("function_key")
      .agg(collect_list(struct(col("feature_hi"), col("feature_lo"))).as("fs"))
      .select(col("function_key"),
        udf((fs: Seq[org.apache.spark.sql.Row]) => {
          val (hi, lo) = graft.core.SimHash.simhashOfHashes(
            fs.map(r => (r.getLong(0), r.getLong(1))), Map.empty)
          (hi, lo)
        }).apply(col("fs")).as("s"))
      .select(col("function_key"), col("s._1").as("sim_hi"), col("s._2").as("sim_lo"))
    val attract = writeTemp(Seq("f1:100 f2:200")) // share 1 of 2 features
    val stats = RefFormats.pairDistanceStats(
      RefFormats.readPairs(spark, attract), sims).collect()(0)
    assert(stats.getLong(0) === 1)
    assert(stats.getDouble(1) > 0.0 && stats.getDouble(1) < 64.0,
      "attract pair should be closer than random (64)")
  }

  test("K2/K4 sinks round-trip") {
    import spark.implicits._
    val sigs = Seq(("rec_1", 0x0123456789abcdefL, 0xfedcba9876543210L))
      .toDF("id", "sim_hi", "sim_lo")
    val dir = Files.createTempDirectory("sink").toString
    RefFormats.writeFingerprints(sigs, s"$dir/fp")
    val line = spark.read.text(s"$dir/fp").collect()(0).getString(0)
    assert(line === "rec_1 0123456789abcdeffedcba9876543210")
    val index = graft.index.SimIndex.build(sigs)
    RefFormats.dumpIndex(index, s"$dir/dump")
    val dumped = spark.read.text(s"$dir/dump").collect().map(_.getString(0))
    assert(dumped.length === 28) // one line per band
    // permutation 0 is the identity (bitpermutation.cpp:37-45): its stored
    // words are the raw signature, %16.16lx-formatted like DumpIndexToStdout
    assert(dumped.head === "0 0123456789abcdef fedcba9876543210 rec_1")
    // every line carries the PERMUTED words: parse back and verify each
    // matches the k-times-iterated permutation of the signature
    dumped.foreach { line =>
      val Array(b, hiHex, loHex, id) = line.split(" ")
      val expect = graft.core.BitPermutation.nPermutations(
        graft.core.U128(0x0123456789abcdefL, 0xfedcba9876543210L), 28)(b.toInt)
      assert(java.lang.Long.parseUnsignedLong(hiHex, 16) === expect.hi)
      assert(java.lang.Long.parseUnsignedLong(loHex, 16) === expect.lo)
      assert(id === "rec_1")
    }
  }

  test("K3 sinks: DOT edges in source order; JSON sink round-trips the S2 scan") {
    import spark.implicits._
    import graft.Fixtures
    val cfgs = Seq(Fixtures.diamondCfgJson).toDF("value")
      .select(from_json(col("value"), graft.cfg.CfgSparkOps.cfgJsonSchema).as("g"))
    val dir = Files.createTempDirectory("k3").toString
    graft.cfg.CfgSparkOps.writeDotGraphs(cfgs, s"$dir/dot")
    val dot = Files.readString(java.nio.file.Path.of(s"$dir/dot/CFG.dot"))
    assert(dot.startsWith("digraph G {\n"))
    assert(dot.endsWith("}\n"))
    val edgeLines = dot.linesIterator.filter(_.contains("->")).toSeq
    assert(edgeLines.nonEmpty && edgeLines.forall(
      _.matches("\tblk_[0-9a-f]+ -> blk_[0-9a-f]+;")))
    assert(edgeLines === edgeLines.sortBy(l =>
      java.lang.Long.parseLong(l.split(" ")(0).stripPrefix("\tblk_"), 16)))
    // JSON sink ∘ S2 scan = identity on the kernel output
    graft.cfg.CfgSparkOps.writeJsonGraphs(cfgs, s"$dir/json")
    val direct = graft.cfg.CfgSparkOps.fromJson(
      Seq(Fixtures.diamondCfgJson).toDF("value")).collect()(0)
    val roundTrip = graft.cfg.CfgSparkOps.fromJson(
      spark.read.text(s"$dir/json")).collect()(0)
    assert(direct.getString(4) === roundTrip.getString(4)) // same simhash
    assert(direct.getInt(1) === roundTrip.getInt(1))
  }

  test("C9 executableId: big-endian first 8 bytes of sha256") {
    // sha256("abc") = ba7816bf8f01cfea...
    assert(RefFormats.executableId("abc".getBytes) === 0xba7816bf8f01cfeaL)
    assert(RefFormats.executableId(Array[Byte]()) ===
      0xe3b0c44298fc1c14L) // sha256 of empty input
  }

  test("F4 dropSharedBlocks: functions sharing a basic block are dropped") {
    import spark.implicits._
    import graft.Fixtures
    val otherJson = Fixtures.diamondCfgJson
      .replace("\"name\":\"CFG\"", "\"name\":\"CFG2\"")
      .replace("1518838565", "99") // distinct entry but still shares blocks
    val soloJson = Fixtures.diamondCfgJson
      .replace("\"name\":\"CFG\"", "\"name\":\"SOLO\"")
      .replaceAll("15188385", "25188385") // fully disjoint addresses
    val cfgs = Seq(Fixtures.diamondCfgJson, otherJson, soloJson).toDF("value")
      .select(from_json(col("value"), graft.cfg.CfgSparkOps.cfgJsonSchema).as("g"))
    val kept = graft.cfg.CfgSparkOps.dropSharedBlocks(cfgs)
      .select("g.name").collect().map(_.getString(0)).toSet
    assert(kept === Set("SOLO"))
  }
}
