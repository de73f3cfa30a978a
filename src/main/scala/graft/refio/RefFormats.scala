package graft.refio

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.BitOps

/** Readers/writers for the reference's flat text formats (SURVEY.md §1.5,
  * §2.1 S5-S7 / K2, K4) — the interop seams a user of the reference would
  * migrate through.
  */
object RefFormats {

  /** S5 — weights file: `hexkey weight` lines, keys of 16, 32 or 35 chars
    * (32/35 = full 128-bit feature hash, optionally `ID.`-prefixed; only the
    * high 64 bits key the weight map) — `functionsimhash.cpp:402-434`.
    * Small file → collect → broadcast-able Map (the reference holds it
    * in-process, `functionsimhash.hpp:217`). */
  def readWeights(spark: SparkSession, path: String): Map[Long, Double] = {
    spark.read.text(path).collect().iterator
      .map(_.getString(0).trim)
      .filter(_.nonEmpty)
      .flatMap { line =>
        val parts = line.split("\\s+")
        if (parts.length < 2) None
        else parseFeatureHash(parts(0)).map { case (hi, _) =>
          hi -> parts(1).toDouble
        }
      }.toMap
  }

  /** C10 — `StringToFeatureHash` (`util/util.cpp:98-120`): 16-char hex →
    * (hi, 0); 32/35-char (with optional `xx.` file-id prefix) → (hi, lo). */
  def parseFeatureHash(s0: String): Option[(Long, Long)] = {
    val s = if (s0.length == 35 && s0.charAt(2) == '.') s0.substring(3) else s0
    try {
      if (s.length == 16) Some((java.lang.Long.parseUnsignedLong(s, 16), 0L))
      else if (s.length == 32)
        Some((java.lang.Long.parseUnsignedLong(s.substring(0, 16), 16),
          java.lang.Long.parseUnsignedLong(s.substring(16), 16)))
      else None
    } catch { case _: NumberFormatException => None }
  }

  /** S6 — metadata file: `file_id filename address base64(symbol) true|false`
    * (`functionmetadata.cpp:47-72`; README.md:350-355). Base64 decode is the
    * built-in `unbase64` — no UDF. */
  def readMetadata(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(split(col("value"), " ").as("f"))
      .filter(size(col("f")) >= 5)
      .select(
        element_at(col("f"), 1).as("file_id"),
        element_at(col("f"), 2).as("file_name"),
        element_at(col("f"), 3).as("address"),
        unbase64(element_at(col("f"), 4)).cast("string").as("symbol"),
        (element_at(col("f"), 5) === "true").as("vulnerable"))

  /** S7 — training corpus: `functions.txt` lines `fileid:addr hex128 ...`
    * (`learning/trainingdata.hpp:25-31`). Returns
    * (function_key, feature_hi, feature_lo) exploded rows; the reference's
    * two-pass global feature dedup (U2, `trainingdata.cpp:77-89`) becomes
    * `featureIds` below. */
  def readFunctionFeatures(spark: SparkSession, path: String): DataFrame = {
    val parse = udf((tok: String) => parseFeatureHash(tok))
    spark.read.text(path)
      .select(split(col("value"), "\\s+").as("f"))
      .filter(size(col("f")) >= 2)
      .select(element_at(col("f"), 1).as("function_key"),
        explode(slice(col("f"), 2, Int.MaxValue)).as("tok"))
      .select(col("function_key"), parse(col("tok")).as("h"))
      .filter(col("h").isNotNull)
      .select(col("function_key"), col("h._1").as("feature_hi"),
        col("h._2").as("feature_lo"))
  }

  /** U2 — global deduplicated feature ids: distinct features numbered
    * deterministically in hash order (stands in for the reference's
    * insertion-order vector index, `trainingdata.cpp:77-89`). Ids come from
    * `zipWithIndex` over the range-sorted distinct set — every partition
    * stays parallel (an `orderBy` is a range shuffle), unlike a global
    * un-partitioned window which funnels all features through one task. */
  def featureIds(features: DataFrame): DataFrame = {
    val spark = features.sparkSession
    val sorted = features.select("feature_hi", "feature_lo").distinct()
      .orderBy("feature_hi", "feature_lo")
    val indexed = sorted.rdd.zipWithIndex.map { case (r, i) =>
      org.apache.spark.sql.Row(r.getLong(0), r.getLong(1), i)
    }
    spark.createDataFrame(indexed, org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+ org.apache.spark.sql.types.StructField(
        "feature_id", org.apache.spark.sql.types.LongType, nullable = false)))
  }

  /** S7 — attract.txt / repulse.txt: `fileid:addr fileid:addr` pairs
    * (`learning/trainingdata.hpp:32-40`). */
  def readPairs(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(split(col("value"), "\\s+").as("f"))
      .filter(size(col("f")) >= 2)
      .select(element_at(col("f"), 1).as("a"), element_at(col("f"), 2).as("b"))

  /** A4 — the evaluation aggregate of `evalsimhashweights.cpp:52-99`: mean
    * Hamming distance over a labeled pair set, given per-function simhashes
    * `(function_key, sim_hi, sim_lo)`. J4: pairs resolve through two joins. */
  def pairDistanceStats(pairs: DataFrame, sims: DataFrame): DataFrame = {
    val d = pairs
      .join(sims.select(col("function_key").as("a"), col("sim_hi").as("a_hi"),
        col("sim_lo").as("a_lo")), "a")
      .join(sims.select(col("function_key").as("b"), col("sim_hi").as("b_hi"),
        col("sim_lo").as("b_lo")), "b")
      .select(graft.pipeline.Dedup.hamming128Col(col("a_hi"), col("a_lo"),
        col("b_hi"), col("b_lo")).as("dist"))
    d.agg(count(lit(1)).as("n_pairs"),
      round(avg("dist"), 4).as("mean_dist"),
      min("dist").as("min_dist"), max("dist").as("max_dist"))
  }

  /** K2 — index dump sink: sorted text mirroring `DumpIndexToStdout`
    * (`simhashsearchindex.cpp:213-229`): per index entry the permutation id
    * and the STORED (permuted) hash words as `%16.16lx` (zero-padded
    * lowercase), then the record id — ordered like the reference's
    * `std::set<IndexEntry>`, i.e. by (perm, hashA, hashB, id) with the hash
    * words compared as unsigned 64-bit values. */
  def dumpIndex(index: DataFrame, path: String): Unit = {
    def unsigned(c: org.apache.spark.sql.Column) =
      c.bitwiseXOR(lit(Long.MinValue))
    def hex16(c: org.apache.spark.sql.Column) =
      lower(lpad(hex(c), 16, "0"))
    index.orderBy(col("band_id"), unsigned(col("sort_hi")),
        unsigned(col("sort_lo")), col("id"))
      .select(concat_ws(" ", col("band_id"), hex16(col("sort_hi")),
        hex16(col("sort_lo")), col("id")).as("value"))
      .write.mode("overwrite").text(path)
  }

  /** K4 — fingerprint sink: `key hex128` lines
    * (`tools/functionfingerprints.cpp:117-141`). */
  def writeFingerprints(sigs: DataFrame, path: String): Unit =
    sigs.select(concat_ws(" ", col("id"),
        lower(concat(lpad(hex(col("sim_hi")), 16, "0"),
          lpad(hex(col("sim_lo")), 16, "0")))).as("value"))
      .write.mode("overwrite").text(path)

  /** C9 — `GenerateExecutableID` (`util/util.cpp:25-40`): the first 8 bytes
    * of the content's SHA-256, little-endian-read then bswap64'd — i.e. the
    * big-endian interpretation of sha[0..7]. */
  def executableId(bytes: Array[Byte]): Long = {
    val sha = java.security.MessageDigest.getInstance("SHA-256").digest(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (sha(i) & 0xffL); i += 1 }
    v
  }
}
