package graft

/** Measures the REAL driver-heap retention of ConnectedComponents' local
  * union-find path at representative edge volumes and id widths — the
  * number `localEdgeThreshold`'s scaladoc cites (round-3 review: the old
  * "~100 B/edge" estimate ignored tuple/HashMap boxing).
  *
  *   sbt -batch "runMain graft.UnionFindProbe"   # no Spark session needed
  *
  * Methodology: materialize the collected edge array (the dominant
  * retained structure — what `sym.as[(String,String)].collect()` returns)
  * plus the union-find's index/names/parent/rank/minOf tables, and diff
  * used heap across forced GCs. Ids are 36-char (image-id width).
  */
object UnionFindProbe {
  private def usedHeap(): Long = {
    (1 to 5).foreach(_ => System.gc())
    Thread.sleep(200)
    val r = Runtime.getRuntime
    r.totalMemory() - r.freeMemory()
  }

  def main(args: Array[String]): Unit = {
    val idWidth = 36
    for (n <- Seq(500000, 1000000, 2000000)) {
      val before = usedHeap()
      // ~dedup-shaped graph: clusters of ~4, ids unique 36-char strings
      val edges = Array.tabulate(n) { i =>
        val g = i / 4
        (f"img_${g}%016d_${"a" * (idWidth - 21)}",
          f"img_${g}%016d_${('b' + i % 4).toChar}${"a" * (idWidth - 22)}")
      }
      val mid = usedHeap()
      val labels = graft.pipeline.ConnectedComponents.labelsOf(edges)
      val after = usedHeap()
      println(f"edges=$n%8d collect=${(mid - before) / 1e6}%8.1f MB " +
        f"unionfind=${(after - mid) / 1e6}%8.1f MB " +
        f"total=${(after - before) / 1e6}%8.1f MB " +
        f"perEdge=${(after - before).toDouble / n}%6.1f B " +
        f"(labels=${labels.length})")
    }
  }
}
