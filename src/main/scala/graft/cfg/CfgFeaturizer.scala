package graft.cfg

import scala.collection.mutable
import graft.core.{Feat, Tuple3Feat, U64Feat, WeightClass}

/** Row-local CFG → feature-multiset explode, the reference's feature
  * generator semantics (`disassembly/flowgraphwithinstructionsfeaturegenerator
  * .cpp:29-115`): graphlets at radius 1, 2, 3 (30-node cap; oversize dropped),
  * mnemonic 3-grams over the address-ordered instruction stream, and
  * plausibility-filtered immediate operands.
  */
object CfgFeaturizer {

  /** `(?:\W|0x|^)([[:xdigit:]]+)(?:h|\W|$)` — extractimmediate.cpp:5-36,
    * including its quirks: both the whole match and group 1 are parsed with
    * strtoull(..., 16) semantics, zeros are skipped, and adjacent duplicates
    * are suppressed. */
  private val ImmRe = java.util.regex.Pattern.compile(
    "(?:\\W|0x|^)([0-9a-fA-F]+)(?:h|\\W|$)")

  /** strtoull(str, NULL, 16): skip leading whitespace, optional sign,
    * optional 0x, then hex digits; 0 if no digits. */
  private[cfg] def strtoullHex(s: String): Long = {
    var i = 0
    while (i < s.length && Character.isWhitespace(s.charAt(i))) i += 1
    var neg = false
    if (i < s.length && (s.charAt(i) == '+' || s.charAt(i) == '-')) {
      neg = s.charAt(i) == '-'; i += 1
    }
    if (i + 1 < s.length && s.charAt(i) == '0' &&
      (s.charAt(i + 1) == 'x' || s.charAt(i + 1) == 'X')) i += 2
    var v = 0L
    var any = false
    while (i < s.length && Character.digit(s.charAt(i), 16) >= 0) {
      v = v * 16 + Character.digit(s.charAt(i), 16)
      any = true; i += 1
    }
    if (!any) 0L else if (neg) -v else v
  }

  private[cfg] def extractImmediates(operand: String): Seq[Long] = {
    val out = mutable.ArrayBuffer.empty[Long]
    val m = ImmRe.matcher(operand)
    while (m.find()) {
      var g = 0
      while (g <= m.groupCount()) {
        val v = strtoullHex(m.group(g))
        if (v != 0L && !(out.nonEmpty && out.last == v)) out += v
        g += 1
      }
    }
    out.toSeq
  }

  /** F2 plausibility (flowgraphwithinstructionsfeaturegenerator.cpp:66-75):
    * keep iff |signed v| > 0x4000 or (v % 4 != 0 and v > 10), unsigned mod
    * and compare. */
  private[cfg] def plausibleImmediate(v: Long): Boolean = {
    val sabs = if (v < 0) -v else v
    sabs > 0x4000L ||
      (java.lang.Long.remainderUnsigned(v, 4) != 0 &&
        java.lang.Long.compareUnsigned(v, 10) > 0)
  }

  /** Full feature multiset in the reference's generation order: graphlets
    * (radius-major, node-ascending), then mnemonic 3-grams, then immediates.
    * Order within identical features is what the occurrence counter keys on;
    * the fold itself is commutative. */
  def features(cfg: Cfg): Seq[Feat] = {
    val out = mutable.ArrayBuffer.empty[Feat]
    val nodes = cfg.nodes
    var d = 1
    while (d <= 3) {
      nodes.foreach { n =>
        cfg.subgraph(n, d, 30).foreach(sub => out += GraphletFeat(sub, n))
      }
      d += 1
    }
    // mnemonic stream across blocks in address order
    val mnems = cfg.instructions.valuesIterator.flatten.map(_.mnemonic).toIndexedSeq
    var i = 0
    while (i + 2 < mnems.length) {
      out += Tuple3Feat(mnems(i), mnems(i + 1), mnems(i + 2))
      i += 1
    }
    // immediates: skip the last instruction of each block (a branch, F3)
    cfg.instructions.valuesIterator.foreach { ins =>
      if (ins.nonEmpty) ins.dropRight(1).foreach { in =>
        in.operands.foreach { op =>
          extractImmediates(op).foreach { v =>
            if (plausibleImmediate(v)) out += U64Feat(v, WeightClass.Numeric)
          }
        }
      }
    }
    out.toSeq
  }
}
