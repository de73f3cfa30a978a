package graft

/** Dev utility: print formatted physical plans for the load-bearing queries,
  * to verify pushdown / pruning / codegen / join strategy choices
  * (the `.explain("formatted")` loop the scale design is iterated against).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Bench.makeSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    def dump(name: String): Unit = {
      println(s"\n===== $name =====")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    // pushdown + pruning
    dump("q01_agg")
    // broadcast choice
    dump("q02_join_broadcast")
    // shingle-join jaccard (the scalable near-dup verify)
    dump("q15_ngram_jaccard")
    // the LSH band self-join path on documents
    dump("q18_simhash_dedup")
    // IVF ANN: broadcast probe list, cell-restricted scan, top-k window
    dump("q31_ann_ivf")
    // tiered cascade: exact tier must stay one hash shuffle + semi-joins;
    // the embedding tier's input must already be frontier-pruned
    dump("q35_tiered_dedup")
    // multi-probe ANN: the probe-vs-exact join must ship only (bk, id)
    // longs, with the hot-set anti-join broadcast, never a vector shuffle
    dump("q38_multiprobe_lsh")
    // decontamination: the benchmark gram side must be a BroadcastExchange
    // (training grams never shuffle); the training scan must read only
    // (doc_id, text)
    dump("q41_decontaminate")
    // fuzzy decontamination: BOTH benchmark sides (band table, shingle
    // sets) must be BroadcastExchanges — the training side streams
    // scan -> sketch -> band explode with no training-side shuffle; only
    // matched candidates reach an exchange. The unscoped body is dumped
    // (the scope's eager checkpoint reduces explain() to an RDD scan).
    println("\n===== q51_fuzzy_decontaminate (unscoped body) =====")
    locally {
      import org.apache.spark.sql.functions._
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      graft.ops.TextOps.fuzzyDecontaminateUnscoped(
        docs.filter(pmod(col("doc_id"), lit(10L)) =!= 0),
        docs.filter(pmod(col("doc_id"), lit(10L)) === 0), 0.5)
        .explain("formatted")
    }
    // semantic decontamination: a BroadcastNestedLoopJoin under a broadcast
    // bench — MAP-ONLY over the corpus (no corpus-side exchange at all),
    // the codegen dot product inside the join's filter
    dump("q52_semantic_decontaminate")
    // domain mixing: map-only — one broadcast hash join on the threshold
    // dim, the keep predicate inside the scan's codegen stage, no shuffle
    // before the per-source aggregate
    dump("q43_domain_mix")
    // IVF semantic pairs: cell assignment map-only under broadcast
    // centroids; the intra-cell self-join must ship only (bk, vec_id)
    // rows, vectors joined back late for the codegen-cosine verify
    dump("q44_ivf_pairs")
    // cluster-aware split: label assignment must be map-only (positional
    // hash of the label string — no rank/window over labels), the pair
    // log joined once, no vector or bytes columns anywhere
    dump("q45_cluster_split")
    // stratified quota sample: ONE shuffle on the stratum key, the
    // per-stratum top-k window inside that exchange, quota dim broadcast
    dump("q46_stratified_sample")
    // end-to-end corpus build: decontamination grams broadcast, caption
    // hygiene map-only, all joins on ids — the composed plan must not
    // re-shuffle the pair log between stages
    dump("q48_corpus_build")
    // modality audit: the pair log joins captions on ids (no bytes, no
    // vectors); the token-set Jaccard is arithmetic inside the projection
    dump("q49_caption_rewrite")
    // image pipeline stages
    println("\n===== image signatures -> bands -> candidates =====")
    val (images, _) = graft.images.SyntheticCorpus.generate(spark, 5, 2, 5)
    val cfg = graft.pipeline.DedupConfig()
    val sigs = graft.pipeline.Dedup.signatures(images, cfg)
    val cands = graft.pipeline.Dedup.candidates(
      graft.pipeline.Dedup.bands(sigs, cfg), cfg)
    cands.explain("formatted")
    // image cascade tier 1: the sha groupBy + the survivor semi-join —
    // `bytes` must appear ONLY in the scan feeding sha/signatures, never
    // in a shuffle
    println("\n===== tiered image cascade (verdicts) =====")
    graft.pipeline.TieredImageDedup.run(images, cfg).verdicts
      .explain("formatted")
    spark.stop()
  }
}
