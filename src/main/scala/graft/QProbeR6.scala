package graft

import org.apache.spark.sql.functions._

/** Round-6 optimization probe: sub-stage wall-clock attribution for the
  * heavy non-streaming bench queries (q22/q38 LSH ANN, q29 trainer, q39
  * approx cascade, q23-family image pipeline). Measurement-only main —
  * never on the bench path; numbers cited in OPTIMIZATION_r06.md.
  *
  *   runMain graft.QProbeR6 <sfDir> [probe...]
  */
object QProbeR6 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val which = args.drop(1).toSet
    def on(name: String): Boolean = which.isEmpty || which.contains(name)
    val spark = Bench.makeSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    OracleDump.benchMode = true
    import graft.ops.{DedupOps, EmbeddingOps}

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"QPROBE $name%-40s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    // warmup: JIT + parquet reader init
    spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    spark.read.parquet(s"$sfDir/documents.parquet").count()

    if (on("q22")) {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      println(s"QPROBE emb_rows ${emb.count()}")
      val banded = t("q22.lshBands+ckpt") {
        EmbeddingOps.lshBands(emb).localCheckpoint()
      }
      println(s"QPROBE band_rows ${banded.count()}")
      val cands = t("q22.lshCandidates+ckpt") {
        EmbeddingOps.lshCandidates(banded, 1000).localCheckpoint()
      }
      println(s"QPROBE cand_rows ${cands.count()}")
      t("q22.verifyCosPairs+count") {
        EmbeddingOps.verifyCosPairs(cands, emb, 0.4).count()
      }
      graft.core.Checkpoints.release(banded, cands)
    }

    if (on("q39")) {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      // tier pieces timed separately (mirrors TieredDedup.run approxSem)
      val keyed = t("q39.t1.sha+ckpt") {
        docs.select(col("doc_id"),
          when(col("text").isNull, lit("nulltext"))
            .otherwise(sha2(encode(col("text"), "UTF-8"), 256)).as("text_sha"))
          .localCheckpoint()
      }
      val canon1 = keyed.groupBy(col("text_sha"))
        .agg(min("doc_id").as("canonical_id"))
      val labeled1 = t("q39.t1.label+ckpt") {
        keyed.join(canon1, "text_sha")
          .select(col("doc_id"), col("canonical_id")).localCheckpoint()
      }
      val surv1 = docs.join(
        labeled1.filter(col("doc_id") === col("canonical_id"))
          .select("doc_id"), Seq("doc_id"), "left_semi")
      val nearP = t("q39.t2.minhashLshDedup") {
        DedupOps.minhashLshDedup(surv1, 0.5)
      }
      val lab2 = t("q39.t2.CC") {
        graft.pipeline.ConnectedComponents.run(spark,
          nearP.select(col("doc_a").as("a"), col("doc_b").as("b")),
          surv1.select(col("doc_id").as("id")))
      }
      val surv2 = lab2.filter(col("id") === col("cluster_id")).select(col("id").as("doc_id"))
      val embSub = emb.join(surv2.select(col("doc_id").as("vec_id")),
        Seq("vec_id"), "left_semi")
      val probes = t("q39.t3.lshProbeBands+ckpt") {
        EmbeddingOps.lshProbeBands(embSub, dims = 64).localCheckpoint()
      }
      val cands3 = t("q39.t3.multiProbeCandidates") {
        EmbeddingOps.multiProbeCandidates(probes).localCheckpoint()
      }
      t("q39.t3.verify+count") {
        EmbeddingOps.verifyCosPairs(cands3, embSub, 0.4).count()
      }
      t("q39.t3.CC") {
        graft.pipeline.ConnectedComponents.run(spark,
          cands3.select(col("a"), col("b")),
          surv2.select(col("doc_id").as("id"))).count()
      }
    }

    if (on("q29")) {
      import spark.implicits._
      import graft.learning.SimHashTrainer
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val shingleUdf = udf((text: String) => {
        val toks = text.split("\\s+").filter(_.nonEmpty)
        toks.sliding(3).filter(_.size == 3)
          .map(w => graft.core.HashFamily.tuple3Hash128(w(0), w(1), w(2), 0L))
          .toArray.distinct
      })
      val feats = docs
        .select(col("doc_id").as("function_key"),
          explode(shingleUdf(col("text"))).as("h"))
        .select(col("function_key"), col("h._1").as("feature_hi"),
          col("h._2").as("feature_lo"))
      val (byDoc0, hashes) = t("q29.featureTable") {
        SimHashTrainer.featureTable(spark, feats)
      }
      val byDoc = t("q29.byDoc.ckpt") { byDoc0.localCheckpoint() }
      val attract = t("q29.attract(minhashLshDedup)+ckpt") {
        DedupOps.minhashLshDedup(docs, 0.5)
          .select(col("doc_a").as("a"), col("doc_b").as("b"))
          .localCheckpoint()
      }
      val nDocs = t("q29.docs.count") { docs.count() }
      val ranked = t("q29.ranked.zipWithIndex") {
        docs.select("doc_id").orderBy("doc_id")
          .rdd.zipWithIndex.map { case (r, i) => (r.getLong(0), i) }
          .toDF("rid", "rank").localCheckpoint()
      }
      val attractIdx = t("q29.attractIdx.zipWithIndex") {
        attract.orderBy("a", "b")
          .rdd.zipWithIndex.map { case (r, i) => (r.getLong(0), r.getLong(1), i) }
          .toDF("a", "b", "i").localCheckpoint()
      }
      val repulse = attractIdx
        .join(ranked.select(col("rank").as("r1"), col("rid").as("ra")),
          pmod(col("i"), lit(nDocs)) === col("r1"))
        .join(ranked.select(col("rank").as("r2"), col("rid").as("rb")),
          pmod(col("i") + lit(nDocs / 2), lit(nDocs)) === col("r2"))
        .filter(col("ra") =!= col("rb"))
        .select(col("ra").as("a"), col("rb").as("b"))
      val pairDf = t("q29.pairDf.ckpt") {
        attract.withColumn("pair_set", lit("attract"))
          .unionByName(repulse.withColumn("pair_set", lit("repulse")))
          .localCheckpoint()
      }
      val resolved = SimHashTrainer.resolvePairs(byDoc,
        pairDf.withColumn("attract", col("pair_set") === "attract")
          .select("a", "b", "attract"))
      val hi = hashes.map(_._1); val lo = hashes.map(_._2)
      println(s"QPROBE q29.distinct_features ${hashes.length}")
      val stats = t("q29.train") {
        SimHashTrainer.trainWithStats(spark, Right(resolved), hi, lo,
          maxIters = 50)
      }
      println(s"QPROBE q29.train_evals ${stats.evals} loss ${stats.loss}")
      val w = stats.weights
      val wm = SimHashTrainer.weightMap(hashes, w)
      val bHashes = spark.sparkContext.broadcast(hashes)
      def sigFor(phase: String, weights: Map[Long, Double]) = {
        val bW = spark.sparkContext.broadcast(weights)
        val sigUdf = udf((fs: Seq[Int]) => {
          val hs = fs.map(f => bHashes.value(f))
          graft.core.SimHash.simhashOfHashes(hs, bW.value)
        })
        byDoc.select(col("function_key").as("doc_id"), lit(phase).as("phase"),
            sigUdf(col("feats")).as("sg"))
          .select(col("doc_id"), col("phase"),
            col("sg._1").as("sim_hi"), col("sg._2").as("sim_lo"))
      }
      val sigs = t("q29.sigs.both+ckpt") {
        sigFor("untrained", Map.empty).unionByName(sigFor("trained", wm))
          .localCheckpoint()
      }
      t("q29.final.joins+count") {
        pairDf
          .join(sigs.select(col("doc_id").as("a"), col("phase"),
            col("sim_hi").as("a_hi"), col("sim_lo").as("a_lo")), "a")
          .join(sigs.select(col("doc_id").as("b"), col("phase"),
            col("sim_hi").as("b_hi"), col("sim_lo").as("b_lo")), Seq("b", "phase"))
          .select(col("pair_set"), col("phase"),
            graft.pipeline.Dedup.hamming128Col(col("a_hi"), col("a_lo"),
              col("b_hi"), col("b_lo")).as("dist"))
          .groupBy("pair_set", "phase")
          .agg(count(lit(1)).as("n_pairs"), round(avg("dist"), 4).as("mean_dist"),
            min("dist").as("min_dist"), max("dist").as("max_dist"))
          .count()
      }
    }

    if (on("img")) {
      val cfg = graft.pipeline.DedupConfig()
      val (images, _) = OracleDump.sharedCorpus(spark, 40, 3, 30)
      println(s"QPROBE img_rows ${images.count()}")
      val sigs = t("img.signatures+ckpt") {
        graft.pipeline.Dedup.signatures(images, cfg).localCheckpoint()
      }
      val cands = t("img.candidates+ckpt") {
        graft.pipeline.Dedup.candidatesMaterialized(
          graft.pipeline.Dedup.bands(sigs, cfg), cfg)
      }
      val pairs = t("img.verified+substring+ckpt") {
        graft.pipeline.Dedup.verified(cands, sigs, cfg)
          .union(graft.pipeline.Dedup.substringPairs(sigs, cfg)).distinct()
          .localCheckpoint()
      }
      t("img.clusters(CC)+count") {
        graft.pipeline.Dedup.clusters(images, pairs).count()
      }
    }
    spark.stop()
  }
}
