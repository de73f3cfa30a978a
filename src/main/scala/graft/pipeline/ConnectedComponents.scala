package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components over a pair table via iterative DataFrame self-joins
  * (min-label propagation), the explicit clustering step the north rule adds
  * on top of the reference's implicit top-N clusters (SURVEY.md §2.5 J6).
  *
  * Cost shape matters more than data volume here: at dedup workloads the
  * edge set is a small fraction of the vertex set, and clusters are
  * near-cliques (diameter 2-3). Two paths, one contract: small edge sets
  * (post-symmetrize count <= `localEdgeThreshold`) collapse via a
  * driver-local union-find — a distributed fixpoint on kilobytes is pure
  * scheduling overhead — while large ones run the iterative loop. For the
  * loop:
  *  - propagation runs ONLY over vertices incident to an edge; the (vast)
  *    singleton majority never enters the loop and is unioned back at the end;
  *  - each round combines one-hop neighbor propagation with pointer
  *    doubling (label := label's label), so convergence takes O(log D)
  *    rounds, not O(D) — long chains cannot outrun the iteration budget;
  *  - convergence is detected with a single partial-aggregable hash-sum over
  *    the label table (one narrow job) instead of a join against the
  *    previous iteration (a shuffle per iteration);
  *  - `localCheckpoint` after every round truncates lineage so the plan does
  *    not grow exponentially (the classic iterative-join failure mode).
  * Labels are the vertex keys themselves (min in the key type's order:
  * lexicographic for strings, numeric for longs), so the result is
  * deterministic and partitioning-independent. The operator is generic
  * over the key column type — every distributed step is min/least/equi-join
  * algebra — with a dedicated driver-local union-find kernel per key shape
  * (long keys are the production shape at 10^12 rows: an 8-byte shuffle
  * key where a padded string costs 2.5x the bytes for pure ceremony).
  */
object ConnectedComponents {

  /** Measured driver-heap retention of the local path (UnionFindProbe,
    * 36-char ids, forced-GC diff): ~225 B per symmetrized edge — 113 MB at
    * 0.5M, 227 MB at 1M, 450 MB at 2M edges (the collected tuple array is
    * ~5/6 of it, the union-find tables ~1/6). The default threshold spends
    * at most a quarter of the driver heap on it, capped at 16M edges
    * (3.6 GB — the cap binds only above ~14 GB of driver heap; below
    * that the heap/4 term governs). The cap was 2M through round 4, tuned
    * for a small driver: the round-5 735k-image scaling run crossed it at
    * 2.5M edges, fell into the distributed fixpoint, and its per-round
    * scheduling floor showed up as a ~50 s Amdahl tail at BOTH 2 and 8
    * cores (2→8 efficiency 0.720) — the loop's per-iteration cost is
    * fixed shuffle/scheduling until edge volume is orders of magnitude
    * larger, which is precisely when the driver no longer fits it. */
  val MeasuredBytesPerEdge = 225L

  def defaultLocalEdgeThreshold: Long =
    math.min(16000000L, Runtime.getRuntime.maxMemory / 4 / MeasuredBytesPerEdge)

  /** @param edges two string columns `a`, `b` (undirected pairs)
    * @param vertices one string column `id` (all vertices, incl. singletons)
    * @param localEdgeThreshold symmetrized-edge count at or below which the
    *   component labels are computed by a driver-local union-find instead of
    *   the iterative join loop. The loop's per-iteration cost is dominated
    *   by fixed shuffle/scheduling, not data (measured: ~6 s for a
    *   3.7k-image corpus whose union-find takes milliseconds; ~36 s for a
    *   418k-image corpus's 1.5M edges, an Amdahl tail that caps measured
    *   N->4N efficiency), so small edge sets belong on the driver. The
    *   default is `defaultLocalEdgeThreshold`: at the measured ~225 B/edge
    *   (see above — NOT the ~100 B a naive estimate gives; tuple + boxed
    *   HashMap overhead dominate), 2M edges retain ~450 MB, and the
    *   heap-derived cap keeps the path under 25% of a smaller driver. The
    *   switch is on EDGE volume: dup edges are a small fraction of rows,
    *   and the (vast) singleton majority never enters either path. Results
    *   are bit-identical (same min-id-per-component contract, asserted in
    *   the spec); past the threshold the pointer-doubling loop is the
    *   scale path.
    * @return (id, cluster_id) with cluster_id = min id in the component
    */
  def run(spark: SparkSession, edges: DataFrame, vertices: DataFrame,
      maxIters: Int = 25,
      localEdgeThreshold: Long = defaultLocalEdgeThreshold): DataFrame = {
    // symmetrize once; checkpoint — reused every iteration
    val sym = graft.core.Checkpoints.ckpt(
      edges.select(col("a").as("src"), col("b").as("dst"))
        .union(edges.select(col("b").as("src"), col("a").as("dst")))
        .distinct())

    if (sym.count() <= localEdgeThreshold) {
      val labels = sym.schema("src").dataType match {
        case org.apache.spark.sql.types.LongType => localUnionFindLong(spark, sym)
        case _ => localUnionFind(spark, sym)
      }
      unpersistCheckpoint(sym) // collected — nothing references it anymore
      val singletons = vertices.join(labels.select("id"), Seq("id"), "left_anti")
        .select(col("id"), col("id").as("cluster_id"))
      return labels.union(singletons)
    }

    // only edge-incident vertices propagate
    var labels = graft.core.Checkpoints.ckpt(
      sym.select(col("src").as("id")).distinct()
        .select(col("id"), col("id").as("cluster_id")))

    def labelFingerprint(df: DataFrame): Long =
      // bit_xor: overflow-free under ANSI mode; rows are unique (id keyed) so
      // xor cancellation needs a 2^-64 hash coincidence
      df.agg(coalesce(bit_xor(xxhash64(col("id"), col("cluster_id"))), lit(0L)))
        .collect()(0).getLong(0)

    var fp = labelFingerprint(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      // (1) neighbor propagation: pull the minimum label one hop
      val fromNeighbors = sym
        .join(labels, sym("src") === labels("id"))
        .select(col("dst").as("id"), col("cluster_id"))
      val hop = labels.select(col("id"), col("cluster_id"))
        .union(fromNeighbors)
        .groupBy("id").agg(min("cluster_id").as("cluster_id"))
      // (2) pointer doubling: replace each label by its label's label, so a
      // chain of length D collapses in O(log D) rounds instead of O(D) —
      // degenerate identical-signature runs (sorted-neighbor W-chains) have
      // diameter ~run_length/W and would otherwise outrun any fixed budget
      val parents = hop.select(col("id").as("p_id"), col("cluster_id").as("p_cluster"))
      val next0 = hop
        .join(parents, hop("cluster_id") === parents("p_id"), "left")
        .select(hop("id"),
          least(hop("cluster_id"), coalesce(col("p_cluster"), hop("cluster_id")))
            .as("cluster_id"))
      val next = graft.core.Checkpoints.ckpt(next0)
      val nextFp = labelFingerprint(next)
      // `next` is eagerly materialized, so the SUPERSEDED label checkpoint
      // can be released now — without this each round's copy of the label
      // table stays persisted until a GC lets the ContextCleaner find it,
      // and a long-lived session running CC repeatedly (streaming batches,
      // tiered cascades) accumulates O(iterations) copies in block storage
      unpersistCheckpoint(labels)
      labels = next
      converged = nextFp == fp
      fp = nextFp
      iter += 1
    }
    require(converged,
      s"connected components did not converge after $maxIters doubling rounds" +
        " (diameter > 2^maxIters is impossible for any physical edge set —" +
        " this indicates a fingerprint collision or a bug)")
    // the final labels are their own checkpoint; the edge table is done
    unpersistCheckpoint(sym)
    // singletons (no incident edge) are their own cluster
    val singletons = vertices.join(labels.select("id"), Seq("id"), "left_anti")
      .select(col("id"), col("id").as("cluster_id"))
    labels.union(singletons)
  }

  /** Release a `localCheckpoint`'s persisted RDD explicitly (see
    * [[graft.core.Checkpoints]] — this loop supersedes one checkpoint per
    * round, far too fast for the GC-driven ContextCleaner). */
  private def unpersistCheckpoint(df: DataFrame): Unit =
    graft.core.Checkpoints.release(df)

  /** Driver-local path for small edge sets: classic union-find with path
    * compression + union by rank, then min id per root — exactly the
    * min-label fixpoint the loop computes, in one collect and zero
    * iterations. */
  private def localUnionFind(spark: SparkSession, sym: DataFrame): DataFrame = {
    import spark.implicits._
    // typed collect: tuples of interned-free strings, no Row wrappers
    val e = sym.as[(String, String)].collect()
    labelsOf(e).toSeq.toDF("id", "cluster_id")
  }

  /** Long-keyed twin of [[localUnionFind]] — same contract (min id per
    * component, numeric order), primitive arrays end to end. */
  private def localUnionFindLong(spark: SparkSession, sym: DataFrame): DataFrame = {
    import spark.implicits._
    val e = sym.as[(Long, Long)].collect()
    labelsOfLong(e).toSeq.toDF("id", "cluster_id")
  }

  /** The driver-side kernel, separated so UnionFindProbe can measure its
    * real heap retention (see `localEdgeThreshold` scaladoc). */
  private[graft] def labelsOf(e: Array[(String, String)]): Array[(String, String)] = {
    val index = new java.util.HashMap[String, Integer]()
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    def idOf(s: String): Int = {
      val got = index.get(s)
      if (got ne null) got.intValue()
      else {
        val i = names.length
        index.put(s, Integer.valueOf(i)); names += s; i
      }
    }
    val parent = scala.collection.mutable.ArrayBuffer.empty[Int]
    val rank = scala.collection.mutable.ArrayBuffer.empty[Byte]
    def find(x0: Int): Int = {
      var x = x0
      while (parent(x) != x) { parent(x) = parent(parent(x)); x = parent(x) }
      x
    }
    e.foreach { case (as, bs) =>
      val a = idOf(as); val b = idOf(bs)
      while (parent.length < names.length) {
        parent += parent.length; rank += 0
      }
      val ra = find(a); val rb = find(b)
      if (ra != rb) {
        if (rank(ra) < rank(rb)) parent(ra) = rb
        else if (rank(ra) > rank(rb)) parent(rb) = ra
        else { parent(rb) = ra; rank(ra) = (rank(ra) + 1).toByte }
      }
    }
    val minOf = new java.util.HashMap[Int, String]()
    names.indices.foreach { i =>
      val r = find(i)
      val cur = minOf.get(r)
      if (cur == null || names(i) < cur) minOf.put(r, names(i))
    }
    Array.tabulate(names.length)(i => (names(i), minOf.get(find(i))))
  }

  /** Long-keyed union-find kernel — identical structure to [[labelsOf]]
    * with numeric min election; boxed only at the id-interning map. */
  private[graft] def labelsOfLong(e: Array[(Long, Long)]): Array[(Long, Long)] = {
    val index = new java.util.HashMap[java.lang.Long, Integer]()
    val names = scala.collection.mutable.ArrayBuffer.empty[Long]
    def idOf(s: Long): Int = {
      val got = index.get(s)
      if (got ne null) got.intValue()
      else {
        val i = names.length
        index.put(s, Integer.valueOf(i)); names += s; i
      }
    }
    val parent = scala.collection.mutable.ArrayBuffer.empty[Int]
    val rank = scala.collection.mutable.ArrayBuffer.empty[Byte]
    def find(x0: Int): Int = {
      var x = x0
      while (parent(x) != x) { parent(x) = parent(parent(x)); x = parent(x) }
      x
    }
    e.foreach { case (as, bs) =>
      val a = idOf(as); val b = idOf(bs)
      while (parent.length < names.length) {
        parent += parent.length; rank += 0
      }
      val ra = find(a); val rb = find(b)
      if (ra != rb) {
        if (rank(ra) < rank(rb)) parent(ra) = rb
        else if (rank(ra) > rank(rb)) parent(rb) = ra
        else { parent(rb) = ra; rank(ra) = (rank(ra) + 1).toByte }
      }
    }
    val minOf = new java.util.HashMap[Int, java.lang.Long]()
    names.indices.foreach { i =>
      val r = find(i)
      val cur = minOf.get(r)
      if (cur == null || names(i) < cur) minOf.put(r, java.lang.Long.valueOf(names(i)))
    }
    Array.tabulate(names.length)(i => (names(i), minOf.get(find(i)).longValue()))
  }
}
