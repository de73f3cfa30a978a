package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over the `embeddings` table (`vec_id`, `embedding:
  * array<float>`, `label`).
  *
  * Brute-force cosine top-k is the exact baseline (the reference's own
  * conclusion for sub-hundreds-of-millions scale: a linear XOR+POPCNT sweep
  * beats the index, `doc/01-motivation-and-overview.md:801-814` — same
  * economics apply to a vectorized dot-product sweep). The scale path is
  * random-hyperplane LSH bucketing, which is exactly the SimHash machinery:
  * sign-of-projection bits, Hamming banding, verify by true cosine.
  *
  * Dot products run in a native codegen Catalyst expression
  * (`graft.expr.DotProductF`: left-to-right double accumulation,
  * arithmetic-identical to the DuckDB oracle's `list_dot_product`):
  * Catalyst's `aggregate` higher-order function is CodegenFallback and
  * ~100x slower in the O(n²) verify loop, and even a compiled Scala UDF
  * pays a per-row ArrayData->Seq conversion and breaks the whole-stage
  * codegen span. Norms are computed once per row BEFORE the pair join,
  * not per pair.
  */
object EmbeddingOps {

  /** Left-to-right double-precision dot product — whole-stage-codegen
    * Catalyst expression; bit-identical to `dotUdfLegacy`. */
  def dotCol(a: Column, b: Column): Column = graft.expr.VectorExprs.dot(a, b)

  /** The pre-expression compiled-closure implementation, kept ONLY for the
    * equivalence spec and A/B measurement (VectorExprsSpec). */
  val dotUdfLegacy = udf((a: Seq[Float], b: Seq[Float]) => {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  })

  def normCol(a: Column): Column = sqrt(dotCol(a, a))

  /** Tiny inputs arrive as one parquet split; fan the compute-heavy side
    * out to the session's parallelism before the projection/join — but
    * ONLY when the scan is genuinely starved (the `Dedup.signatures`
    * rule): at scale the input already covers the cores and an
    * unconditional repartition would be a corpus-wide shuffle of the
    * embedding vectors for nothing. */
  private def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val parts = df.queryExecution.logical match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.getNumPartitions
      case _ => df.rdd.getNumPartitions
    }
    if (parts < target) df.repartition(target) else df
  }

  /** Exact top-k neighbors by cosine for the query set `vec_id < nQueries`.
    * The query side is tiny → broadcast; the corpus side streams through one
    * compiled projection — no shuffle until the per-query top-k window. */
  def knnBrute(emb: DataFrame, nQueries: Int = 10, k: Int = 5): DataFrame = {
    val withNorm = emb.select(col("vec_id"), col("embedding"),
      normCol(col("embedding")).as("nrm"))
    val queries = withNorm.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))
    val corpus = fanOut(withNorm)
      .select(col("vec_id").as("n_id"), col("embedding").as("n_emb"),
        col("nrm").as("n_nrm"))
    val scored = broadcast(queries).join(corpus, col("q_id") =!= col("n_id"))
      .withColumn("cos",
        dotCol(col("q_emb"), col("n_emb")) / (col("q_nrm") * col("n_nrm")))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("rank"), round(col("cos"), 4).as("cos"))
      .orderBy("q_id", "rank")
  }

  /** All pairs with cosine >= `minCos` — embedding near-duplicate detection.
    * Exact (block-nested-loop self-join); the LSH variant below is the
    * 100×-scale path. */
  def cosinePairs(emb: DataFrame, minCos: Double): DataFrame = {
    val withNorm = emb.select(col("vec_id"), col("embedding"),
      normCol(col("embedding")).as("nrm"))
    val a = fanOut(withNorm).select(col("vec_id").as("a"),
      col("embedding").as("a_emb"), col("nrm").as("a_nrm"))
    val b = withNorm.select(col("vec_id").as("b"),
      col("embedding").as("b_emb"), col("nrm").as("b_nrm"))
    a.join(broadcast(b), col("a") < col("b"))
      .withColumn("cos",
        dotCol(col("a_emb"), col("b_emb")) / (col("a_nrm") * col("b_nrm")))
      .filter(col("cos") >= minCos)
      .select(col("a").as("vec_a"), col("b").as("vec_b"),
        round(col("cos"), 4).as("cos"))
      .orderBy("vec_a", "vec_b")
  }

  /** Cross-corpus semantic contamination: every (corpus doc, benchmark
    * doc) pair with embedding cosine >= `minCos` — the third rung of the
    * decontamination family after exact grams (`TextOps.decontaminate`)
    * and lexical near-match (`TextOps.fuzzyDecontaminate`): a PARAPHRASED
    * eval answer shares no 13-grams and little shingle Jaccard, but its
    * embedding stays close (the SemDeDup observation applied across
    * corpora).
    *
    * Scale shape: benchmark embeddings are a broadcast dim (thousands of
    * eval rows × dims floats); the corpus side is a MAP-ONLY scan — each
    * row computes |bench| codegen dot products and emits only matches, so
    * the plan is a BroadcastNestedLoopJoin with no corpus-side shuffle and
    * no candidate materialization at all: O(N·B) work fully distributed,
    * the honest shape while B is broadcast-sized. If the bench side ever
    * outgrew the broadcast budget, the banded multi-probe machinery above
    * is the same-semantics fallback (the q38 path with the bench as the
    * stored side). */
  def crossCosineContaminated(corpus: DataFrame, bench: DataFrame,
      minCos: Double): DataFrame = {
    val c = fanOut(corpus).select(col("vec_id").as("doc_id"),
      col("embedding").as("c_emb"), normCol(col("embedding")).as("c_nrm"))
    val b = bench.select(col("vec_id").as("bench_id"),
      col("embedding").as("b_emb"), normCol(col("embedding")).as("b_nrm"))
    c.join(broadcast(b), lit(true))
      .withColumn("cos",
        dotCol(col("c_emb"), col("b_emb")) / (col("c_nrm") * col("b_nrm")))
      .filter(col("cos") >= minCos)
      .select(col("doc_id"), col("bench_id"), round(col("cos"), 4).as("cos"))
      .orderBy("doc_id", "bench_id")
  }

  /** Per-label centroid stats (count, mean norm) — the cheap clustering
    * sanity aggregate. */
  def labelStats(emb: DataFrame): DataFrame =
    emb.select(col("label"), normCol(col("embedding")).as("nrm"))
      .groupBy("label")
      .agg(count(lit(1)).as("n"), round(avg("nrm"), 4).as("mean_norm"))
      .orderBy("label")

  /** Deterministic pseudo-random hyperplane component for (plane, dim) —
    * splitmix-derived, centered on 0. */
  private def hyperplane(planes: Int, dims: Int): Array[Array[Double]] =
    Array.tabulate(planes, dims) { (p, d) =>
      val h = graft.images.SyntheticCorpus.mix64(0x5EEDL + p * 131L + d * 7919L)
      (h >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
    }

  /** Per-JVM hyperplane cache: the band UDFs reference the table by its
    * (planes, dims) KEY instead of capturing the materialized array in the
    * closure — a 96×8-band table is ~400 KB of doubles, serialized and
    * re-deserialized with EVERY task otherwise (guide §2: shuffle/ship
    * metadata, derive the heavy deterministic table where it is used).
    * Values are bit-identical: the generator is a pure function of the
    * absolute (plane, dim) index. */
  private val hyperplaneCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()
  private def cachedHyperplane(planes: Int, dims: Int): Array[Array[Double]] =
    hyperplaneCache.computeIfAbsent((planes, dims),
      k => hyperplane(k._1, k._2))

  /** Random-hyperplane LSH ANN, structured exactly like the SimHash index:
    * `planes` sign-of-projection bits form an embedding SimHash, banded into
    * (bands × rowsPerBand) single-Long bucket keys (band id packed into the
    * high bits); candidates collide in >= 1 band and are verified by exact
    * cosine over a bare-id pair set.
    *
    * Tuning is governed by the LSH exponent ρ = ln(1/p1)/ln(1/p2) with
    * p = 1-θ/π the per-bit agreement probability: at the demo threshold
    * cos 0.4 (θ≈66°, p1≈0.63 vs p2≈0.5 for random pairs) ρ≈0.66, so NO
    * parameter choice prunes below ~N^1.66 total candidates at recall 0.9 —
    * the defaults (r=8, b=96) hit measured recall 0.92/0.90 on the sf
    * fixtures while touching ~1/3 of all pairs, the honest optimum for this
    * regime. Production embedding dedup runs at cos >= 0.8 (p1≈0.80,
    * ρ≈0.32), where the SAME code with r=16, b=32 touches ~N^1.32 — real
    * pruning; parameters are per-threshold by design.
    *
    * Scale shape: the join ships only (key, vec_id) longs; the quadratic
    * verify cost materializes as bare (a, b) id pairs deduped BEFORE the
    * 64-float embeddings are joined back (once per side) — never shuffles
    * vectors through the candidate dedup. Approximate by construction →
    * recall measured against `cosinePairs` in tests; the relational half
    * (band join + cos verify) is oracle-checkable from the dumped band
    * table (q22). */
  def lshCosinePairs(emb: DataFrame, minCos: Double, planes: Int = 768,
      bands: Int = 96, rowsPerBand: Int = 8, dims: Int = 64,
      maxBucket: Int = 1000): DataFrame =
    graft.core.Checkpoints.scoped(emb.sparkSession) {
      // band table feeds the occupancy split plus both join sides →
      // materialized once; skew handling lives in lshCandidates
      val banded = graft.core.Checkpoints.ckpt(
        lshBands(emb, planes, bands, rowsPerBand, dims))
      verifyCosPairs(lshCandidates(banded, maxBucket), emb, minCos)
    }

  /** The relational half of single-probe LSH search, from a materialized
    * (vec_id, bk) band table (dumpable as oracle evidence — q22 reuses
    * this exact implementation on its dumped table). Skewed-LSH-bucket
    * guard: a degenerate direction shared by m vectors puts all m in ONE
    * bucket per band — m² join rows × bands with no cap. Buckets with
    * occupancy > `maxBucket` are split off (LOGGED, never silent) and
    * contribute a sorted-adjacent CHAIN of pairs instead of all pairs:
    * O(m) edges that keep every hot-bucket member connected for the
    * downstream connected-components clustering. Since chain edges still
    * pass the exact-cosine verify, the no-recall-cliff guarantee holds when
    * a hot bucket is one true-dup cluster (the identical-content case the
    * spec pins — adjacent members then verify); a hot bucket containing
    * SEVERAL distinct clusters interleaved by vec_id degrades gracefully
    * but can split components the full m² join would have connected. */
  def lshCandidates(banded: DataFrame, maxBucket: Int = 1000): DataFrame = {
    val (kept, hot) =
      TextOps.splitHotKeys(banded, "bk", maxBucket, "lshCandidates")
    val cold = kept.select(col("bk"), col("vec_id").as("a"))
      .join(kept.select(col("bk"), col("vec_id").as("b")), "bk")
      .filter(col("a") < col("b"))
      .select("a", "b")
    cold.union(hotChain(hot)).distinct()
  }

  /** Sorted-adjacent pairs within each hot bucket: (i-th, i+1-th) member
    * by vec_id order — the linear connectivity skeleton of the bucket
    * (same idea as the image pipeline's sorted-neighbor candidates). The
    * per-bucket window sorts each hot bucket on one task — O(m log m)
    * where the join it replaces was O(m²); emitted edges are O(m). */
  private def hotChain(hot: DataFrame): DataFrame = {
    val w = Window.partitionBy("bk").orderBy("vec_id")
    val rn = hot.select(col("bk"), col("vec_id"),
      row_number().over(w).as("rn"))
    rn.select(col("bk"), col("rn"), col("vec_id").as("a"))
      .join(rn.select(col("bk"), (col("rn") - 1).as("rn"),
        col("vec_id").as("b")), Seq("bk", "rn"))
      .select("a", "b")
  }

  /** Band-id bits sit ABOVE the sign bits: the key starts at
    * `band_id << rowsPerBand` and is then shifted left once per sign bit,
    * so the band id lands at bit 2·rowsPerBand — the guard must count
    * both shifts plus the id width (the old `rowsPerBand < 56` check
    * let legal-looking parameters shift the band id off the Long and
    * merge all bands into one key space). */
  private def requireKeyFits(bands: Int, rowsPerBand: Int): Unit = {
    val bandIdBits =
      64 - java.lang.Long.numberOfLeadingZeros(math.max(bands - 1, 1).toLong)
    require(2 * rowsPerBand + bandIdBits <= 63,
      s"band key overflow: 2*$rowsPerBand sign-bit shifts + $bandIdBits " +
        s"band-id bits exceed 63 — lower rowsPerBand or bands")
  }

  /** Sign-of-projection band keys: one row per (vector, band), key =
    * (band_id << 2·rowsPerBand) | r sign bits — a single Long equi-join /
    * partition key. Deterministic hyperplanes → reproducible across runs
    * and partitionings. */
  def lshBands(emb: DataFrame, planes: Int = 768, bands: Int = 96,
      rowsPerBand: Int = 8, dims: Int = 64): DataFrame = {
    require(bands * rowsPerBand <= planes)
    requireKeyFits(bands, rowsPerBand)
    // only plane indices < bands·rowsPerBand are ever read, and the
    // generator depends on the absolute index only — sizing the table to
    // the used prefix keeps identical keys at a fraction of the closure;
    // the closure captures the (nPlanes, dims) KEY, the table itself is
    // computed once per JVM (cachedHyperplane)
    val nPlanes = bands * rowsPerBand
    val keysUdf = udf((v: Seq[Float]) => {
      val H = cachedHyperplane(nPlanes, dims)
      // fail fast, don't truncate: projecting a wider embedding onto the
      // first `dims` components silently uncorrelates the band keys from
      // the full-vector cosine the verify step (and the exact baseline)
      // computes, degrading recall with no error
      require(v.length == dims,
        s"embedding dim ${v.length} != hyperplane dims $dims — pass dims=" +
          s"${v.length} to lshBands/lshCosinePairs")
      val out = new Array[Long](bands)
      var b = 0
      while (b < bands) {
        var key = b.toLong << rowsPerBand
        var r = 0
        while (r < rowsPerBand) {
          val p = b * rowsPerBand + r
          var s = 0.0
          var d = 0
          while (d < dims) { s += H(p)(d) * v(d); d += 1 }
          key = (key << 1) | (if (s >= 0) 1L else 0L)
          r += 1
        }
        out(b) = key
        b += 1
      }
      out
    })
    fanOut(emb).select(col("vec_id"), explode(keysUdf(col("embedding"))).as("bk"))
  }

  /** Multi-probe band keys (Lv et al., VLDB 2007, adapted to
    * sign-random-projection LSH): per band, besides the exact key
    * (`is_exact = true`), emit `extraProbes` probe keys, each flipping ONE
    * of the band's lowest-|projection| sign bits — the bits most likely to
    * have landed on the wrong side of their hyperplane for a true
    * near-neighbor. Probing trades a little per-query join fan-out for a
    * proportional cut in the number of bands needed at a given recall —
    * i.e. at 10^12 rows, (1+extraProbes)× probe rows on the QUERY side
    * buys a ~T× smaller persisted index (the base stores exact keys only),
    * which is the side that dominates state at scale.
    *
    * The exact key computed here is arithmetic-identical to `lshBands`
    * (same hyperplanes, same left-to-right accumulation), spec-asserted by
    * the `extraProbes = 0` equivalence test. Margin ties break by bit
    * index — fully deterministic. */
  def lshProbeBands(emb: DataFrame, planes: Int = 768, bands: Int = 24,
      rowsPerBand: Int = 8, dims: Int = 64, extraProbes: Int = 2): DataFrame = {
    require(bands * rowsPerBand <= planes)
    requireKeyFits(bands, rowsPerBand)
    require(extraProbes >= 0 && extraProbes <= rowsPerBand,
      s"extraProbes $extraProbes must be in [0, rowsPerBand=$rowsPerBand]")
    val nPlanes = bands * rowsPerBand
    val probesUdf = udf((v: Seq[Float]) => {
      val H = cachedHyperplane(nPlanes, dims)
      require(v.length == dims,
        s"embedding dim ${v.length} != hyperplane dims $dims — pass dims=" +
          s"${v.length} to lshProbeBands")
      val out = new Array[(Long, Boolean)](bands * (1 + extraProbes))
      val margins = new Array[Double](rowsPerBand)
      val order = new Array[Int](rowsPerBand)
      var o = 0
      var b = 0
      while (b < bands) {
        var key = b.toLong << rowsPerBand
        var r = 0
        while (r < rowsPerBand) {
          val p = b * rowsPerBand + r
          var s = 0.0
          var d = 0
          while (d < dims) { s += H(p)(d) * v(d); d += 1 }
          key = (key << 1) | (if (s >= 0) 1L else 0L)
          margins(r) = math.abs(s)
          r += 1
        }
        out(o) = (key, true); o += 1
        // flip the extraProbes bits of smallest |projection| (ties break
        // by bit index), one per probe key; bit for round r sits at shift
        // (rowsPerBand - 1 - r). Partial selection sort — no per-row
        // Range/tuple allocation in the hot loop.
        var i = 0
        while (i < rowsPerBand) { order(i) = i; i += 1 }
        var e = 0
        while (e < extraProbes) {
          var m = e
          var j = e + 1
          while (j < rowsPerBand) {
            val oj = order(j); val om = order(m)
            if (margins(oj) < margins(om) ||
                (margins(oj) == margins(om) && oj < om)) m = j
            j += 1
          }
          val t = order(e); order(e) = order(m); order(m) = t
          out(o) = (key ^ (1L << (rowsPerBand - 1 - order(e))), false); o += 1
          e += 1
        }
        b += 1
      }
      out
    })
    fanOut(emb).select(col("vec_id"), explode(probesUdf(col("embedding"))).as("p"))
      .select(col("vec_id"), col("p._1").as("bk"), col("p._2").as("is_exact"))
  }

  /** Multi-probe LSH near-duplicate pairs: candidates collide when ANY
    * probe key of one side equals an EXACT key of the other (the exact key
    * is itself in the probe set, so the single-probe candidate set is a
    * subset by construction — spec-asserted). Join ships only (key, id)
    * rows; vectors join back once per side inside `verifyCosPairs`. The
    * probe table feeds both sides of the self-join, so it is materialized
    * once (`localCheckpoint`) instead of recomputing the fan-out UDF per
    * side. Same output shape as `cosinePairs` / `lshCosinePairs`; recall
    * is measured against the exact baseline in OpsSpec. */
  def multiProbeCosinePairs(emb: DataFrame, minCos: Double,
      planes: Int = 768, bands: Int = 24, rowsPerBand: Int = 8,
      dims: Int = 64, extraProbes: Int = 2,
      maxBucket: Int = 1000): DataFrame =
    graft.core.Checkpoints.scoped(emb.sparkSession) {
      val probes = graft.core.Checkpoints.ckpt(
        lshProbeBands(emb, planes, bands, rowsPerBand, dims, extraProbes))
      verifyCosPairs(multiProbeCandidates(probes, maxBucket), emb, minCos)
    }

  /** The relational half of multi-probe search, from a materialized
    * (vec_id, bk, is_exact) probe table (dumpable as oracle evidence):
    * probe keys join exact keys, unordered-pair normalize, dedup.
    *
    * Skew guard, both sides bounded (q38's oracle mirrors all of it):
    *  - EXACT buckets with occupancy > `maxBucket` contribute a
    *    sorted-adjacent chain (O(m) verified edges keeping every member
    *    connected — see `lshCandidates`) instead of m² pairs.
    *  - The NON-EXACT probe rows get their own per-bucket cap: a hot
    *    foreign probe flood (m vectors one flip away from a kept bucket)
    *    would otherwise multiply m × maxBucket join rows per band. A
    *    bucket's own exact rows always participate, so the per-bucket
    *    join bound is 2·maxBucket² — same order as single-probe.
    *  - Kept probe rows aimed at a hot EXACT bucket get one anchor edge
    *    each (to the bucket's min member), so probe-side neighbors of a
    *    capped cluster stay connected instead of silently losing the band.
    * All drops are logged (`TextOps.splitHotKeys`). */
  def multiProbeCandidates(probes: DataFrame,
      maxBucket: Int = 1000): DataFrame = {
    val exactRows = probes.filter(col("is_exact")).select("bk", "vec_id")
    val prRows = probes.filter(!col("is_exact")).select("bk", "vec_id")
    // ONE occupancy job for both sides: the exact-row and probe-row hot
    // sets are per-(bk, side) counts, so a single groupBy(bk, is_exact)
    // replaces the two separate splitHotKeys aggregate+collect jobs (the
    // hot criterion per side is unchanged — each side's occupancy counts
    // only its own rows, exactly as before)
    val hotRows = probes.groupBy("bk", "is_exact")
      .agg(count(lit(1)).as("df")).filter(col("df") > maxBucket)
      .select("bk", "is_exact").collect()
    def hotDf(keys: Array[Long]): DataFrame = {
      import scala.jdk.CollectionConverters._
      broadcast(probes.sparkSession.createDataFrame(
        keys.toList.map(k => org.apache.spark.sql.Row(k)).asJava,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("bk",
            org.apache.spark.sql.types.LongType, nullable = false)))))
    }
    def splitBy(rows: DataFrame, keys: Array[Long],
        label: String): (DataFrame, DataFrame) =
      if (keys.isEmpty) (rows, rows.limit(0))
      else {
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"$label: split off ${keys.length} keys with occupancy > " +
            s"$maxBucket (hot-key guard)")
        val h = hotDf(keys)
        (rows.join(h, Seq("bk"), "left_anti"),
          rows.join(h, Seq("bk"), "left_semi"))
      }
    val (keptEx, hotEx) = splitBy(exactRows,
      hotRows.filter(_.getBoolean(1)).map(_.getLong(0)),
      "multiProbeCandidates.exact")
    val keptPr = splitBy(prRows,
      hotRows.filter(r => !r.getBoolean(1)).map(_.getLong(0)),
      "multiProbeCandidates.probe")._1
    // exact-vs-exact pairs are symmetric, so a < b produces each unordered
    // pair ONCE; probe-vs-exact is not (only one side's key flipped), so it
    // keeps x =!= y + normalize. The split halves the dominant exact-exact
    // join/shuffle output vs a single x =!= y join over the union (the
    // candidate SET is unchanged — distinct collapses orientation).
    val exEx = keptEx.select(col("bk"), col("vec_id").as("a"))
      .join(keptEx.select(col("bk"), col("vec_id").as("b")), "bk")
      .filter(col("a") < col("b"))
      .select("a", "b")
    val prEx = keptPr.select(col("bk"), col("vec_id").as("x"))
      .join(keptEx.select(col("bk"), col("vec_id").as("y")), "bk")
      .filter(col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("a"),
        greatest(col("x"), col("y")).as("b"))
    // a kept probe row pointing INTO a hot EXACT bucket joins nothing above
    // (keptEx excludes that bk, hotChain covers only the bucket's own
    // members) — a query vector one bit-flip from a >maxBucket cluster
    // would silently lose that band's candidate. Anchor each such probe
    // row to the bucket's MINIMUM member: one bounded edge per probe row,
    // connecting it to the bucket's chain skeleton. Few hot buckets by
    // construction → broadcast.
    val hotAnchor =
      broadcast(hotEx.groupBy("bk").agg(min("vec_id").as("anchor")))
    val prHot = keptPr.join(hotAnchor, "bk")
      .filter(col("vec_id") =!= col("anchor"))
      .select(least(col("vec_id"), col("anchor")).as("a"),
        greatest(col("vec_id"), col("anchor")).as("b"))
    exEx.union(prEx).union(prHot).union(hotChain(hotEx)).distinct()
  }

  // --------------------------------------------------------------------
  // IVF (inverted-file) ANN — the coarse-quantizer scale path.
  //
  // Spherical k-means centroids are trained driver-side on a bounded,
  // deterministic sample (FAISS's own recipe: training needs only
  // ~256·k vectors regardless of corpus size), then broadcast; cell
  // assignment and search are fully distributed. Per-query work is
  // sum(probed cell sizes) ≈ (nprobe/nCells)·N instead of N — and unlike
  // the hyperplane LSH above, the pruning factor is data-adaptive (cells
  // follow the actual density), which is why IVF is the production
  // default for embedding retrieval. At cluster scale the assignment
  // table is written partitioned BY cell, so a probe reads only its
  // cells' files (partition pruning); here it stays a cell equi-join.
  // --------------------------------------------------------------------

  /** Unit-normalize a vector; zero vectors stay zero. */
  private def normalize(v: Array[Double]): Array[Double] = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    val n = math.sqrt(s)
    if (n == 0) v else v.map(_ / n)
  }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Cell of maximum centroid dot product (ties → lowest cell id). */
  private def nearestCell(cents: Array[Array[Double]], v: Array[Double]): Int = {
    var best = 0; var bestDot = Double.NegativeInfinity
    var c = 0
    while (c < cents.length) {
      val d = dot(cents(c), v)
      if (d > bestDot) { bestDot = d; best = c }
      c += 1
    }
    best
  }

  /** Spherical-k-means centroids from a deterministic sample: vectors are
    * unit-normalized, init is evenly-spaced sample vectors, Lloyd rounds
    * re-normalize the mean; an emptied cell keeps its previous centroid.
    * Fully deterministic — no RNG, sample = first `trainN` by `vec_id`
    * (a distributed top-k at any corpus size). */
  def ivfCentroids(emb: DataFrame, nCells: Int, iters: Int = 20,
      trainN: Int = 4096): Array[Array[Double]] = {
    val sample = emb.orderBy("vec_id").limit(trainN)
      .select("embedding").collect()
      .map(r => normalize(r.getSeq[Float](0).toArray.map(_.toDouble)))
    require(sample.length >= nCells, s"need >= $nCells training vectors")
    var cents = Array.tabulate(nCells)(c =>
      sample((c.toLong * sample.length / nCells).toInt).clone())
    var it = 0
    while (it < iters) {
      val sums = Array.fill(nCells)(new Array[Double](cents(0).length))
      val counts = new Array[Long](nCells)
      sample.foreach { v =>
        val c = nearestCell(cents, v)
        val s = sums(c); var i = 0
        while (i < v.length) { s(i) += v(i); i += 1 }
        counts(c) += 1
      }
      cents = Array.tabulate(nCells)(c =>
        if (counts(c) == 0) cents(c) else normalize(sums(c)))
      it += 1
    }
    cents
  }

  /** Distributed cell assignment: (vec_id, cell) under broadcast centroids. */
  def ivfAssign(emb: DataFrame, cents: Array[Array[Double]]): DataFrame = {
    val assignUdf = udf((v: Seq[Float]) =>
      nearestCell(cents, normalize(v.toArray.map(_.toDouble))))
    fanOut(emb).select(col("vec_id"), assignUdf(col("embedding")).as("cell"))
  }

  /** Per-query probe list: the `nprobe` cells of highest centroid dot
    * product — (q_id, cell), one row per probed cell. */
  def ivfProbes(queries: DataFrame, cents: Array[Array[Double]],
      nprobe: Int): DataFrame = {
    val probesUdf = udf((v: Seq[Float]) => {
      val nv = normalize(v.toArray.map(_.toDouble))
      cents.indices.map(c => (dot(cents(c), nv), c))
        .sortBy { case (d, c) => (-d, c) }.take(nprobe).map(_._2)
    })
    queries.select(col("vec_id").as("q_id"),
      explode(probesUdf(col("embedding"))).as("cell"))
  }

  /** IVF top-k: probe the `nprobe` nearest cells per query, brute-force
    * exact cosine within them. Same query set / ranking / output shape as
    * `knnBrute`, so recall is directly measurable against it. The probe
    * list is tiny → broadcast against the assignment table; embeddings are
    * joined back only for rows inside probed cells. */
  def ivfTopK(emb: DataFrame, nQueries: Int = 10, k: Int = 5,
      nCells: Int = 16, nprobe: Int = 4, iters: Int = 20): DataFrame = {
    val cents = ivfCentroids(emb, nCells, iters)
    val queries = emb.filter(col("vec_id") < nQueries)
    ivfTopKFrom(emb, ivfAssign(emb, cents),
      ivfProbes(queries, cents, nprobe), queries, k)
  }

  /** The relational half of IVF search, from materialized assignment and
    * probe tables (dumpable as oracle evidence): corpus restricted to
    * probed cells, exact cosine, per-query top-k. */
  def ivfTopKFrom(emb: DataFrame, assign: DataFrame, probes: DataFrame,
      queries: DataFrame, k: Int): DataFrame = {
    val withNorm = emb.select(col("vec_id"), col("embedding"),
      normCol(col("embedding")).as("nrm"))
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
      normCol(col("embedding")).as("q_nrm"))
    val scored = assign.join(broadcast(probes), "cell")
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"))
      .join(broadcast(q), "q_id")
      .join(withNorm.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"),
        col("nrm").as("n_nrm")), "n_id")
      .withColumn("cos",
        dotCol(col("q_emb"), col("n_emb")) / (col("q_nrm") * col("n_nrm")))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("rank"), round(col("cos"), 4).as("cos"))
      .orderBy("q_id", "rank")
  }

  /** IVF-bucketed near-duplicate pairs — the coarse-quantizer analog of
    * `lshCosinePairs` and the third embedding-pair generator (SemDeDup,
    * Abbas et al. 2023: k-means cells, pairwise cosine INSIDE each cell
    * only). Assignment is map-only under broadcast centroids; candidates
    * are the intra-cell self-join of bare (vec_id, cell) rows through the
    * SAME skew-guarded [[lshCandidates]] machinery (occupancy > `maxBucket`
    * cells collapse to the sorted-adjacent chain, logged), and survivors
    * are verified by exact cosine with the vectors joined back late — ids
    * only through the candidate shuffle.
    *
    * Approximation contract: output ⊆ `cosinePairs(emb, minCos)` by
    * construction (every candidate passes the exact verify); pairs whose
    * members quantize into DIFFERENT cells are the misses, so recall is
    * governed by `nCells` vs cluster granularity (measured against the
    * exact baseline in OpsSpec, and the assignment table is dumped oracle
    * evidence — q44). `nAssign` is the recall lever: each vector lands in
    * its top-`nAssign` cells (the index-side analog of `nprobe` — boundary
    * pairs split by the quantizer still meet in the runner-up cell) at
    * `nAssign`× candidate volume. Scale shape: at 10^12 rows pick
    * nCells ≈ N·nAssign/B for a target cell occupancy B — the self-join is
    * then cell-partitioned with B² bounded work per cell and no
    * corpus-wide quadratic term; the centroid table (nCells × dims floats)
    * stays a broadcast dim. */
  def ivfCosinePairs(emb: DataFrame, minCos: Double, nCells: Int = 16,
      iters: Int = 20, maxBucket: Int = 1000, nAssign: Int = 1): DataFrame =
    graft.core.Checkpoints.scoped(emb.sparkSession) {
      val cents = ivfCentroids(emb, nCells, iters)
      val cells = graft.core.Checkpoints.ckpt(ivfCells(emb, cents, nAssign))
      verifyCosPairs(lshCandidates(cells, maxBucket), emb, minCos)
    }

  /** (vec_id, bk) cell-bucket table for [[ivfCosinePairs]] — the
    * top-`nAssign` cells per vector ([[ivfProbes]] applied to the index
    * side) in the band-table shape `lshCandidates` consumes (and q44
    * dumps). */
  def ivfCells(emb: DataFrame, cents: Array[Array[Double]],
      nAssign: Int = 1): DataFrame =
    ivfProbes(fanOut(emb), cents, nAssign)
      .select(col("q_id").as("vec_id"), col("cell").cast("long").as("bk"))

  /** Exact-cosine verification of a bare (a, b) id pair set: join the
    * embeddings back once per side, keep pairs with cos >= `minCos`. */
  def verifyCosPairs(pairs: DataFrame, emb: DataFrame,
      minCos: Double): DataFrame = {
    val withNorm = emb.select(col("vec_id"), col("embedding"),
      normCol(col("embedding")).as("nrm"))
    pairs
      .join(withNorm.select(col("vec_id").as("a"), col("embedding").as("a_emb"),
        col("nrm").as("a_nrm")), "a")
      .join(withNorm.select(col("vec_id").as("b"), col("embedding").as("b_emb"),
        col("nrm").as("b_nrm")), "b")
      .withColumn("cos",
        dotCol(col("a_emb"), col("b_emb")) / (col("a_nrm") * col("b_nrm")))
      .filter(col("cos") >= minCos)
      .select(col("a").as("vec_a"), col("b").as("vec_b"),
        round(col("cos"), 4).as("cos"))
      .orderBy("vec_a", "vec_b")
  }
}
