package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Explicit lifetime management for `localCheckpoint` blocks.
  *
  * `Dataset.localCheckpoint()` persists the materialized partitions in the
  * block manager and TRUNCATES lineage — the blocks are not recomputable, and
  * `Dataset.unpersist` does not release them (it only talks to the cache
  * manager). The ContextCleaner frees a checkpoint only after a driver GC
  * notices the RDD is unreachable, which in a long-lived session (a bench
  * sweep, a streaming job, a notebook) means every operator's checkpointed
  * intermediates accumulate in storage until memory pressure degrades
  * unrelated queries (round-4 verdict #1: 17-25× slowdowns on
  * broadcast-heavy queries after 30+ queries' blocks piled up).
  *
  * Contract used across the library:
  *  - operators that checkpoint INTERMEDIATES materialize their result
  *    eagerly ([[scoped]]) and release everything else they created;
  *  - drivers that run many queries in one session ([[graft.Bench]],
  *    [[graft.Verify]]) additionally [[sweep]] after each query's action, so
  *    even result checkpoints never outlive the query that produced them.
  */
object Checkpoints {

  /** Ids of the persistent RDDs currently registered with the context. */
  def snapshot(spark: SparkSession): Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  /** The persisted RDD id backing `df` when its plan IS a local checkpoint
    * (a `LogicalRDD` over a persisted RDD); None for any other plan. */
  def checkpointRddId(df: DataFrame): Option[Int] =
    df.queryExecution.logical match {
      case lr: org.apache.spark.sql.execution.LogicalRDD
          if lr.rdd.getStorageLevel.isValid => Some(lr.rdd.id)
      case _ => None
    }

  /** Release the persisted blocks behind local-checkpoint frames. No-op for
    * non-checkpoint plans. Callers must not evaluate a released frame again:
    * checkpoint lineage is truncated, so the blocks are gone for good. */
  def release(dfs: DataFrame*): Unit =
    dfs.foreach { df =>
      df.queryExecution.logical match {
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          lr.rdd.unpersist(blocking = false); ()
        case _ => ()
      }
    }

  /** Unpersist every persistent RDD registered since `before`, except
    * `keep`. Returns how many were released. Only safe once everything the
    * caller still needs from that window is materialized elsewhere. */
  def sweep(spark: SparkSession, before: Set[Int],
      keep: Set[Int] = Set.empty): Int = {
    val now = spark.sparkContext.getPersistentRDDs
    var n = 0
    now.foreach { case (id, rdd) =>
      if (!before.contains(id) && !keep.contains(id)) {
        rdd.unpersist(blocking = false)
        n += 1
      }
    }
    n
  }

  /** Run `body`, eagerly materialize its result as a local checkpoint, then
    * release every OTHER persistent RDD `body` created — the scoped-release
    * pattern every intermediate-checkpointing operator uses. The returned
    * frame owns exactly one persisted block set; a long-lived caller
    * releases it via [[release]] (or a driver-level [[sweep]]) when done. */
  def scoped(spark: SparkSession)(body: => DataFrame): DataFrame = {
    val before = snapshot(spark)
    val out0 = body
    val out =
      if (checkpointRddId(out0).isDefined) out0 else out0.localCheckpoint()
    sweep(spark, before, keep = checkpointRddId(out).toSet)
    out
  }

  /** [[scoped]] for operators returning several result frames: `body` runs,
    * `results` names the frames to keep (each is materialized if not already
    * a checkpoint), everything else created inside is released. */
  def scopedMany[T](spark: SparkSession)(body: => T)(
      results: T => Seq[DataFrame], rebuild: Seq[DataFrame] => T): T = {
    val before = snapshot(spark)
    val raw = body
    val kept = results(raw).map { df =>
      if (checkpointRddId(df).isDefined) df else df.localCheckpoint()
    }
    sweep(spark, before, keep = kept.flatMap(checkpointRddId).toSet)
    rebuild(kept)
  }
}
