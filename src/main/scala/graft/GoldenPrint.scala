package graft

/** Dev utility: print the pinned-golden kernel outputs (used to author the
  * parity specs; kept so future config changes can re-derive goldens). */
object GoldenPrint {
  def main(args: Array[String]): Unit = {
    val (h5, l5) = Fixtures.fiveNodeCfgSimHash()
    println(f"five_node_cfg simhash = $h5%016x $l5%016x")
    val d = Fixtures.diamondCfg()
    val (hd, ld) = graft.core.SimHash.simhash128(
      graft.cfg.CfgFeaturizer.features(d), graft.core.SimHashConfig())
    println(f"diamond_cfg simhash = $hd%016x $ld%016x")
    val g5 = Fixtures.fiveNodeCfg()
    println(f"five_node structural(start) = ${g5.structuralHash(0x806C811L, graft.core.HashFamily.k0, graft.core.HashFamily.k1, graft.core.HashFamily.k2)}%016x")
    println(s"five_node features = ${graft.cfg.CfgFeaturizer.features(g5).size}")
    println(s"diamond features = ${graft.cfg.CfgFeaturizer.features(d).size}")
  }
}
