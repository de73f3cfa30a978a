package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared-evidence dumps for the DuckDB correctness oracle.
  *
  * Hash-kernel outputs (SimHash bits, LSH band keys, MinHash slots) have no
  * ANSI-SQL derivation — but everything DOWNSTREAM of them (band equi-joins,
  * sorted-neighbor windows, Hamming `bit_count(xor)` verification, Jaccard
  * slot agreement, connected components, recall joins) is pure relational
  * algebra. Queries dump the kernel outputs to a per-run path; the paired
  * `oracleSql` re-derives the final result from that dump in DuckDB, so the
  * driver's oracle gate covers the relational half of every pipeline while
  * ScalaTest goldens (bit-exact reference parity, recall gates) cover the
  * kernels themselves.
  */
object OracleDump {

  /** Evidence root — keyed by PID so concurrent sessions cannot overwrite
    * each other's evidence mid-read. Consistency with the DuckDB side is
    * free: `oracleSql` interpolates `glob(...)` in the SAME JVM that wrote
    * the dumps, so the paths serialized into oracle_sql.json always point at
    * this run's evidence. Override with SPARK_GRAFT_ORACLE_ROOT when a
    * stable path is wanted. */
  val Root: String = sys.env.getOrElse("SPARK_GRAFT_ORACLE_ROOT",
    s"/tmp/graft_oracle_${ProcessHandle.current().pid()}")

  /** Corpus cache root — deliberately STABLE across processes (unlike
    * `Root`): the synthetic corpus for a given (generator version,
    * parameters) is deterministic, so bench and verify runs share bytes
    * instead of regenerating. */
  private val CorpusRoot = "/tmp/graft_corpus"

  /** Set by Bench before timing queries: evidence parquet round-trips are
    * correctness plumbing, not pipeline work, and must stay out of timed
    * wall-clock. `localCheckpoint` preserves the materialize-once semantics
    * queries rely on (dumped frames are consumed by multiple downstream
    * branches) without the write+read I/O. */
  @volatile var benchMode: Boolean = false

  /** Write `df` under the evidence root and read it back, so both engines
    * consume byte-identical parquet evidence (bench mode: materialize only). */
  def dump(name: String, df: DataFrame): DataFrame = {
    if (benchMode) {
      // already-materialized frames (operators checkpoint their dumpable
      // intermediates) are passed through — a second checkpoint would just
      // double the block storage the per-query sweep has to release
      if (graft.core.Checkpoints.checkpointRddId(df).isDefined) df
      else df.localCheckpoint()
    } else {
      val p = s"$Root/$name"
      df.write.mode("overwrite").parquet(p)
      df.sparkSession.read.parquet(p)
    }
  }

  /** Glob for `read_parquet` in oracle SQL. */
  def glob(name: String): String = s"$Root/$name/*.parquet"

  private val corpusLock = new Object

  /** Materialize the deterministic synthetic image corpus ONCE per parameter
    * set and serve it from parquet: queries measure pipeline work, not
    * corpus synthesis (generation cost was 80+% of q23/q25 wall time when
    * inlined), and all queries over the same parameters share bytes. */
  def sharedCorpus(spark: SparkSession, nGroups: Int, variants: Int,
      distractors: Int): (DataFrame, DataFrame) = corpusLock.synchronized {
    // keyed by generator version too: a code change to SyntheticCorpus
    // must invalidate cached corpus bytes, not silently serve stale ones
    val v = graft.images.SyntheticCorpus.GeneratorVersion
    val dir = s"$CorpusRoot/corpus_v${v}_${nGroups}_${variants}_$distractors"
    if (!new java.io.File(s"$dir/_done").exists) {
      val (images, truth) = graft.images.SyntheticCorpus.generate(
        spark, nGroups, variants, distractors)
      images.write.mode("overwrite").parquet(s"$dir/images")
      truth.write.mode("overwrite").parquet(s"$dir/truth")
      new java.io.File(s"$dir/_done").createNewFile()
    }
    (spark.read.parquet(s"$dir/images"), spark.read.parquet(s"$dir/truth"))
  }
}
