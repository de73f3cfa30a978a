package graft

import graft.cfg.{Cfg, CfgFeaturizer, CfgInstruction}
import graft.core.{SimHash, SimHashConfig}

/** Reference-parity CFG fixtures, reconstructed from the reference's own test
  * data (cited per fixture). These pin the kernel's fixed-config outputs:
  * stable goldens across runs, partitionings, and parallelism levels.
  */
object Fixtures {

  /** The 5-node CFG of `disassembly/flowgraphwithinstructions_test.cpp:24-57`
    * (function 0x806C811 of unrar.x86.Os). The reference pins
    * `0xACEB07449170DFCF 0x56df46c771e9a4df`, and CfgParitySpec asserts we
    * match it bit-exactly DESPITE the documented FNV-1a substitution for
    * libstdc++ std::hash (SURVEY.md §2.9 C6): mnemonic contributions are
    * bounded (|sum| <= 0.55 at weight 0.05) and cannot flip graphlet-decided
    * accumulator signs, which are odd integers with |.| >= 1. */
  def fiveNodeCfg(): Cfg = {
    val g = new Cfg
    val nodes: Seq[(Long, Seq[CfgInstruction])] = Seq(
      0x806C811L -> Seq(
        CfgInstruction("sub", Nil), CfgInstruction("lea", Nil),
        CfgInstruction("push", Nil), CfgInstruction("call", Nil)),
      0x806C820L -> Seq(CfgInstruction("add", Nil), CfgInstruction("jmp", Nil)),
      0x806C825L -> Seq(CfgInstruction("mov", Nil)),
      0x806C827L -> Seq(
        CfgInstruction("sub", Nil), CfgInstruction("lea", Nil),
        CfgInstruction("push", Nil), CfgInstruction("call", Nil)),
      0x806C836L -> Seq(CfgInstruction("mov", Nil), CfgInstruction("call", Nil)))
    val edges = Seq(
      (0x806C811L, 0x806C820L), (0x806C820L, 0x806C825L),
      (0x806C820L, 0x806C827L), (0x806C825L, 0x806C827L),
      (0x806C827L, 0x806C836L))
    nodes.foreach { case (a, ins) => g.addNode(a); g.setInstructions(a, ins) }
    edges.foreach { case (s, d) => g.addEdge(s, d) }
    g
  }

  /** SimHash of the 5-node fixture at default config (graphlet 1.0 /
    * mnemonic 0.05 / immediate 4.0, no weight overrides). */
  def fiveNodeCfgSimHash(): (Long, Long) =
    SimHash.simhash128(CfgFeaturizer.features(fiveNodeCfg()), SimHashConfig())

  /** The diamond CFG in the reference's JSON wire format
    * (`flowgraphwithinstructions_test.cpp:93-121` fixture data) — S2 scan
    * path input. */
  val diamondCfgJson: String =
    """{"edges":[{"destination":1518838580,"source":1518838565},{"destination":1518838572,"source":1518838565},{"destination":1518838578,"source":1518838572},{"destination":1518838574,"source":1518838572},{"destination":1518838580,"source":1518838574},{"destination":1518838578,"source":1518838574},{"destination":1518838580,"source":1518838578}],"name":"CFG","nodes":[{"address":1518838565,"instructions":[{"mnemonic":"xor","operands":["EAX","EAX"]},{"mnemonic":"cmp","operands":["[ECX + 4]","EAX"]},{"mnemonic":"jnle","operands":["5a87a334"]}]},{"address":1518838572,"instructions":[{"mnemonic":"jl","operands":["5a87a332"]}]},{"address":1518838574,"instructions":[{"mnemonic":"cmp","operands":["[ECX]","EAX"]},{"mnemonic":"jnb","operands":["5a87a334"]}]},{"address":1518838578,"instructions":[{"mnemonic":"mov","operands":["AL","1"]}]},{"address":1518838580,"instructions":[{"mnemonic":"ret near","operands":["[ESP]"]}]}]}"""

  /** The diamond CFG of the reference's JSON-parse test
    * (`flowgraphwithinstructions_test.cpp:93-121`, addresses 1518838565..80)
    * including operands — exercises the immediate-extraction path. */
  def diamondCfg(): Cfg = {
    val g = new Cfg
    val nodes: Seq[(Long, Seq[CfgInstruction])] = Seq(
      1518838565L -> Seq(
        CfgInstruction("xor", Seq("EAX", "EAX")),
        CfgInstruction("cmp", Seq("[ECX + 4]", "EAX")),
        CfgInstruction("jnle", Seq("5a87a334"))),
      1518838572L -> Seq(CfgInstruction("jl", Seq("5a87a332"))),
      1518838574L -> Seq(
        CfgInstruction("cmp", Seq("[ECX]", "EAX")),
        CfgInstruction("jnb", Seq("5a87a334"))),
      1518838578L -> Seq(CfgInstruction("mov", Seq("AL", "1"))),
      1518838580L -> Seq(CfgInstruction("ret near", Seq("[ESP]"))))
    val edges = Seq(
      (1518838565L, 1518838580L), (1518838565L, 1518838572L),
      (1518838572L, 1518838578L), (1518838572L, 1518838574L),
      (1518838574L, 1518838580L), (1518838574L, 1518838578L),
      (1518838578L, 1518838580L))
    nodes.foreach { case (a, ins) => g.addNode(a); g.setInstructions(a, ins) }
    edges.foreach { case (s, d) => g.addEdge(s, d) }
    g
  }
}
