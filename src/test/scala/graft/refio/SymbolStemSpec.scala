package graft.refio

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** C14 parity cases (`tools/stemsymbol.cpp:53-123`) + the J3 enrichment
  * composition (`matchfunctionsfromindex.cpp:189-196`). */
class SymbolStemSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("cppSplit keeps bracket nesting intact (cppsplitter.cpp:7-38)") {
    assert(SymbolStem.cppSplit("int foo(int, int)") ===
      Vector("int", "foo(int, int)"))
    assert(SymbolStem.cppSplit("std::pair<int, bool> f(x y) [clone .a]") ===
      Vector("std::pair<int, bool>", "f(x y)", "[clone .a]"))
  }

  test("simple tokens pass through unstemmed") {
    assert(SymbolStem.stem("main") === "main")
    assert(SymbolStem.stem("_ZN5RarVM11ExecuteCode") === "_ZN5RarVM11ExecuteCode")
  }

  test("VS-demangled symbols stem to the GCC form") {
    // return type stripped, comma spacing normalized
    assert(SymbolStem.stem("unsigned long RarVM::ExecuteCode(VM_PreparedCommand*, unsigned int)")
      === "RarVM::ExecuteCode(VM_PreparedCommand*, unsigned int)")
    // `class ...` return type dropped whole, `(void)` -> `()`
    assert(SymbolStem.stem("class std::pair<int, int> Foo::bar(void)")
      === "Foo::bar()")
    // `bool&` -> `bool &` is immediately undone by the later ` &` -> `&`
    // replace — faithful to the reference's replace-chain ordering
    assert(SymbolStem.stem("int baz(bool&)") === "baz(bool&)")
    // `struct` qualifier dropped (leaves the reference's leftover space
    // after the paren — same output as stemsymbol.cpp), ` *` tightened
    assert(SymbolStem.stem("unsigned long Run(struct Cmd *, unsigned int)")
      === "Run( Cmd*, unsigned int)")
    // trailing [clone ...] token dropped
    assert(SymbolStem.stem("void qux(int) [clone .part.1]") === "qux(int)")
    // GCC-demangled names (no return type) are already stemmed
    assert(SymbolStem.stem("RarVM::ExecuteCode(VM_PreparedCommand*, unsigned int)")
      === "RarVM::ExecuteCode(VM_PreparedCommand*, unsigned int)")
  }

  test("J3: queryTopN results enrich with metadata (file, symbol, vuln flag)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val sym = java.util.Base64.getEncoder.encodeToString(
      "RarVM::ExecuteCode".getBytes)
    val metaFile = java.nio.file.Files.createTempFile("meta", ".txt")
    java.nio.file.Files.writeString(metaFile,
      s"0123456789abcdef unrar.exe 806c811 $sym true")
    val metadata = RefFormats.readMetadata(spark, metaFile.toString)

    val sig = graft.core.SimHash.simhash128(
      (1 to 50).map(i => graft.core.U64Feat(i * 7919L)),
      graft.core.SimHashConfig())
    val index = graft.index.SimIndex.build(
      Seq(("0123456789abcdef:806c811", sig._1, sig._2))
        .toDF("id", "sim_hi", "sim_lo"))
    val q = Seq(("q", sig._1, sig._2)).toDF("query_id", "sim_hi", "sim_lo")
    val hits = graft.index.SimIndex.queryTopN(index, q, 1, 0.8)
    val enriched = graft.index.SimIndex.enrichTopN(hits, metadata).collect()
    assert(enriched.length === 1)
    val r = enriched(0)
    assert(r.getAs[String]("file_name") === "unrar.exe")
    assert(r.getAs[String]("symbol") === "RarVM::ExecuteCode")
    assert(r.getAs[Boolean]("vulnerable"))
    assert(r.getAs[Int]("similarity") === 128)
  }
}
