package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components over a pair table via iterative DataFrame self-joins
  * (min-label propagation), the explicit clustering step the north rule adds
  * on top of the reference's implicit top-N clusters (SURVEY.md §2.5 J6).
  *
  * Each iteration: every vertex takes the minimum label among itself and its
  * neighbors. Duplicate clusters are near-cliques, so convergence is 2-3
  * rounds; `localCheckpoint` after every round truncates lineage so the plan
  * does not grow exponentially (the classic iterative-join failure mode at
  * scale). Labels are the vertex keys themselves (min = lexicographic), so
  * the result is deterministic and partitioning-independent. At 10^12 rows a
  * production deployment would dictionary-encode ids to longs first; the
  * algorithm is unchanged.
  */
object ConnectedComponents {

  /** @param edges two string columns `a`, `b` (undirected pairs)
    * @param vertices one string column `id` (all vertices, incl. singletons)
    * @return (id, cluster_id) with cluster_id = min id in the component
    */
  def run(spark: SparkSession, edges: DataFrame, vertices: DataFrame,
      maxIters: Int = 25): DataFrame = {
    // symmetrize once; cache — reused every iteration
    val sym = edges.select(col("a").as("src"), col("b").as("dst"))
      .union(edges.select(col("b").as("src"), col("a").as("dst")))
      .distinct()
      .localCheckpoint()

    var labels = vertices.select(col("id"), col("id").as("cluster_id"))
      .localCheckpoint()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      // neighbor's current label, keyed by the receiving vertex
      val fromNeighbors = sym
        .join(labels, sym("src") === labels("id"))
        .select(col("dst").as("id"), col("cluster_id"))
      val next = labels.select(col("id"), col("cluster_id"))
        .union(fromNeighbors)
        .groupBy("id").agg(min("cluster_id").as("cluster_id"))
        .localCheckpoint()
      val changed = next.join(labels.withColumnRenamed("cluster_id", "old"), "id")
        .filter(col("cluster_id") =!= col("old"))
        .limit(1).count()
      labels = next
      converged = changed == 0
      iter += 1
    }
    labels
  }
}
