package graft.cfg

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.{SimHash, SimHashConfig}

/** Spark-side CFG ingestion: the reference's JSON graph scan (S2,
  * `Disassembly::LoadFromJSONStream`, `disassembly.cpp:53-65`; wire format
  * `flowgraphwithinstructions.cpp:25-76`) as a `from_json` nested-schema scan
  * plus a row-local kernel UDF — one CFG per row, no RDDs.
  */
object CfgSparkOps {

  /** The reference's JSON wire schema: `{name, nodes:[{address,
    * instructions:[{mnemonic, operands:[...]}]}], edges:[{source,
    * destination}]}`. */
  val cfgJsonSchema: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("nodes", ArrayType(StructType(Seq(
      StructField("address", LongType),
      StructField("instructions", ArrayType(StructType(Seq(
        StructField("mnemonic", StringType),
        StructField("operands", ArrayType(StringType)))))))))),
    StructField("edges", ArrayType(StructType(Seq(
      StructField("source", LongType),
      StructField("destination", LongType)))))))

  private def toCfg(nodes: Seq[Row], edges: Seq[Row]): Cfg = {
    val g = new Cfg
    Option(nodes).getOrElse(Nil).foreach { n =>
      val addr = n.getLong(0)
      g.addNode(addr)
      val ins = Option(n.getSeq[Row](1)).getOrElse(Nil).map { i =>
        CfgInstruction(i.getString(0),
          Option(i.getSeq[String](1)).getOrElse(Nil))
      }
      g.setInstructions(addr, ins)
    }
    Option(edges).getOrElse(Nil).foreach(e => g.addEdge(e.getLong(0), e.getLong(1)))
    g
  }

  /** JSON lines of CFGs → (name, n_nodes, branching_nodes, passes_min_size,
    * simhash_hex). `passes_min_size` is filter F1 (`branching_nodes >
    * minimum_function_size`, default 5, `addfunctionstoindex.cpp:103-111`). */
  def fromJson(jsonLines: DataFrame, minSize: Int = 5): DataFrame = {
    val kernel = udf((name: String, nodes: Seq[Row], edges: Seq[Row]) => {
      val g = toCfg(nodes, edges)
      val (hi, lo) = SimHash.simhash128(CfgFeaturizer.features(g), SimHashConfig())
      (if (name == null) "" else name, g.size, g.branchingNodeCount,
        f"$hi%016x$lo%016x")
    })
    jsonLines
      .select(from_json(col("value"), cfgJsonSchema).as("g"))
      .select(kernel(col("g.name"), col("g.nodes"), col("g.edges")).as("r"))
      .select(col("r._1").as("name"), col("r._2").as("n_nodes"),
        col("r._3").as("branching_nodes"),
        (col("r._3") > minSize).as("passes_min_size"),
        col("r._4").as("simhash_hex"))
  }

  /** Occurrence/weight-resolved feature table of each JSON CFG — the oracle
    * evidence for `fromJson`'s SimHash half: same `from_json` parse, same
    * featurizer, same `SimHash.resolvedFeatures` resolution the fold
    * consumes, so a SQL engine can re-derive `simhash_hex` from this table
    * with pure bit arithmetic (per-bit ±weight accumulate, `>= 0` rule). */
  def featureTableFromJson(jsonLines: DataFrame): DataFrame = {
    val featUdf = udf((name: String, nodes: Seq[Row], edges: Seq[Row]) => {
      val g = toCfg(nodes, edges)
      SimHash.resolvedFeatures(CfgFeaturizer.features(g), SimHashConfig())
        .map { case (h0, h1, w) =>
          (if (name == null) "" else name, h0, h1, w) }
    })
    jsonLines
      .select(from_json(col("value"), cfgJsonSchema).as("g"))
      .select(explode(
        featUdf(col("g.name"), col("g.nodes"), col("g.edges"))).as("r"))
      .select(col("r._1").as("name"), col("r._2").as("feature_hi"),
        col("r._3").as("feature_lo"), col("r._4").as("weight"))
  }

  /** K3 — DOT graph sink (`Flowgraph::WriteDot`, `flowgraph.cpp:63-74`;
    * tool `tools/dotgraphs.cpp`): per CFG, `digraph G` with one
    * `blk_<hex> -> blk_<hex>;` line per edge, sources in ascending address
    * order (the reference iterates its ordered edge map). Diagnostics sink:
    * one small .dot file per graph under `dir`. The DOT strings are built on
    * the executors; the tiny per-graph files are streamed to the DRIVER and
    * written through the Hadoop FS API — executor-local java.nio writes
    * would scatter files across worker disks (or fail on a missing dir) on
    * any non-local deployment. Graph names are sanitized to a single path
    * component so a hostile name cannot escape `dir`; names the
    * sanitization would collide ("a/b" vs "a:b" both → "a_b") get a short
    * hash of the ORIGINAL name appended, so no graph's output is silently
    * overwritten. */
  def writeDotGraphs(cfgs: DataFrame, dir: String): Unit = {
    val dotUdf = udf((edges: Seq[Row]) => {
      val sb = new StringBuilder("digraph G {\n")
      Option(edges).getOrElse(Nil)
        .map(e => (e.getLong(0), e.getLong(1)))
        .sorted // the reference's ordered edge map iterates (source, dest)
        .foreach { case (s, d) =>
          sb.append(f"\tblk_$s%x -> blk_$d%x;\n")
        }
      sb.append("}\n").toString
    })
    val spark = cfgs.sparkSession
    val base = new org.apache.hadoop.fs.Path(dir)
    val fs = base.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(base)
    cfgs.select(col("g.name").as("name"), dotUdf(col("g.edges")).as("dot"))
      .toLocalIterator().forEachRemaining { r =>
        val orig = Option(r.getString(0)).getOrElse("unnamed")
        val sanitized = orig.replaceAll("[^A-Za-z0-9._-]", "_")
        // a lossy sanitization can collide distinct names; disambiguate
        // with a hash of the original (deterministic, order-independent)
        val safe =
          if (sanitized == orig) sanitized
          else f"${sanitized}_${graft.core.HashFamily.stringHash(orig) & 0xFFFFFFFFL}%08x"
        val out = fs.create(new org.apache.hadoop.fs.Path(base, s"$safe.dot"),
          true)
        try out.write(r.getString(1).getBytes(
          java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
      }
  }

  /** K3 — JSON graph sink (`Flowgraph::WriteJSON`, `flowgraph.cpp:76-115`):
    * the same wire format the S2 scan parses, so sink∘scan round-trips. */
  def writeJsonGraphs(cfgs: DataFrame, path: String): Unit =
    cfgs.select(to_json(col("g")).as("value")).write.mode("overwrite").text(path)

  /** F4 — `no_shared_blocks` (`disassembly.cpp:248-263`,
    * `addfunctionstoindex.cpp:34,90-93`): drop records that share a basic
    * block with any other record (disassembler artifacts). Relationally: an
    * anti-join against the multiply-owned block addresses. `cfgs` must have
    * a unique `name` column and the parsed `g` struct (see `cfgJsonSchema`).
    */
  def dropSharedBlocks(cfgs: DataFrame): DataFrame = {
    val ownership = cfgs.select(col("g.name").as("name"),
      explode(col("g.nodes.address")).as("address"))
    val shared = ownership.groupBy("address")
      .agg(countDistinct("name").as("owners"))
      .filter(col("owners") > 1)
      .select("address")
    val dropNames = ownership.join(shared, "address").select("name").distinct()
    cfgs.join(dropNames, cfgs("g.name") === dropNames("name"), "left_anti")
  }
}
