package graft.cfg

import scala.collection.mutable
import graft.core.{Feat, HashFamily}

/** Control-flow-graph record model for reference-parity tests.
  *
  * Mirrors the reference's record shape (`disassembly/flowgraph.hpp:29-58`,
  * `flowgraphwithinstructions.hpp:14-28`): a graph of basic blocks keyed by
  * uint64 address, each block holding an address-ordered instruction list.
  * On Spark a CFG is one nested row (see CfgFeaturizer / SparkEntry); this
  * class is the row-local kernel behind that UDF.
  */
final case class CfgInstruction(mnemonic: String, operands: Seq[String])

final class Cfg {
  // out-edges keyed per node; every node has a key (AddNode semantics,
  // flowgraph.cpp:40-43). Insertion order of targets is preserved.
  private val outEdges = mutable.SortedMap.empty[Long, mutable.ArrayBuffer[Long]](
    Ordering.fromLessThan(java.lang.Long.compareUnsigned(_, _) < 0))
  private val inEdges = mutable.HashMap.empty[Long, mutable.ArrayBuffer[Long]]
  private val biEdges = mutable.HashMap.empty[Long, mutable.ArrayBuffer[Long]]
  val instructions: mutable.SortedMap[Long, Seq[CfgInstruction]] =
    mutable.SortedMap.empty[Long, Seq[CfgInstruction]](
      Ordering.fromLessThan(java.lang.Long.compareUnsigned(_, _) < 0))

  def addNode(address: Long): Unit =
    outEdges.getOrElseUpdate(address, mutable.ArrayBuffer.empty)

  def addEdge(src: Long, dst: Long): Unit = {
    addNode(src); addNode(dst)
    outEdges(src) += dst
    inEdges.getOrElseUpdate(dst, mutable.ArrayBuffer.empty) += src
    biEdges.getOrElseUpdate(src, mutable.ArrayBuffer.empty) += dst
    biEdges.getOrElseUpdate(dst, mutable.ArrayBuffer.empty) += src
  }

  def setInstructions(address: Long, ins: Seq[CfgInstruction]): Unit = {
    addNode(address)
    instructions(address) = ins
  }

  def nodes: Seq[Long] = outEdges.keys.toSeq // unsigned-ascending
  def size: Int = outEdges.size
  def hasNode(a: Long): Boolean = outEdges.contains(a)
  def outTargets(a: Long): Seq[Long] = outEdges.get(a).map(_.toSeq).getOrElse(Nil)

  def branchingNodeCount: Int = outEdges.valuesIterator.count(_.size >= 2)

  /** BFS shortest-path level from `start` over the given adjacency; keys of
    * the adjacency that are unreached get -1; anything else later defaults to
    * 0 at lookup (`Flowgraph::GetTopologicalOrder`, flowgraph.cpp:121-152 and
    * the std::map operator[] default in CalculateHash). */
  private def bfsOrder(adj: collection.Map[Long, mutable.ArrayBuffer[Long]],
      start: Long): mutable.HashMap[Long, Long] = {
    val order = mutable.HashMap.empty[Long, Long]
    val q = mutable.Queue.empty[(Long, Long)]
    q.enqueue((start, 0L)); order(start) = 0L
    while (q.nonEmpty) {
      val (cur, lvl) = q.dequeue()
      adj.get(cur).foreach(_.foreach { t =>
        val known = order.get(t)
        if (!known.exists(_ <= lvl + 1)) { order(t) = lvl + 1; q.enqueue((t, lvl + 1)) }
      })
    }
    adj.keysIterator.foreach { k => if (!order.contains(k)) order(k) = -1L }
    order
  }

  /** Structural graphlet hash — faithful port of the semantics of
    * `Flowgraph::CalculateHash` (flowgraph.cpp:154-212): per source node a
    * rotl-multiply chain over its out-edge 10-tuples (forward/backward/
    * bidirectional BFS level and in/out degree of source and target), summed
    * commutatively across sources.
    */
  def structuralHash(startNode: Long, k0: Long, k1: Long, k2: Long): Long = {
    val fwd = bfsOrder(outEdges, startNode)
    val bwd = bfsOrder(inEdges, startNode)
    val both = bfsOrder(biEdges, startNode)
    @inline def look(m: mutable.HashMap[Long, Long], n: Long): Long =
      m.getOrElse(n, 0L)
    val indeg = mutable.HashMap.empty[Long, Long]
    val outdeg = mutable.HashMap.empty[Long, Long]
    outEdges.foreach { case (src, ts) =>
      outdeg(src) = ts.size.toLong
      ts.foreach(t => indeg(t) = indeg.getOrElse(t, 0L) + 1L)
    }
    @inline def rot(x: Long): Long = java.lang.Long.rotateLeft(x, 7)
    var hash = 0x0BADDEED600DDEEDL
    outEdges.foreach { case (src, ts) =>
      var h = 0x600DDEED0BADDEEDL
      ts.foreach { t =>
        h += k0 * look(fwd, src); h = rot(h)
        h += k1 * look(bwd, src); h = rot(h)
        h += k2 * look(both, src); h = rot(h)
        h += k0 * indeg.getOrElse(src, 0L); h = rot(h)
        h += k1 * outdeg.getOrElse(src, 0L); h = rot(h)
        h += k2 * look(fwd, t); h = rot(h)
        h += k0 * look(bwd, t); h = rot(h)
        h += k1 * look(both, t); h = rot(h)
        h += k2 * indeg.getOrElse(t, 0L); h = rot(h)
        h += k0 * outdeg.getOrElse(t, 0L); h = rot(h)
      }
      hash += h
    }
    hash
  }

  /** Radius-`distance` bidirectional BFS ball around `node`, None if it
    * exceeds `maxSize` nodes (`Flowgraph::GetSubgraph`, flowgraph.cpp:214-269
    * with the 30-node bail-out used by the feature generator). */
  def subgraph(node: Long, distance: Int, maxSize: Int = 30): Option[Cfg] = {
    val visited = mutable.LinkedHashSet[Long](node)
    var frontier = List(node)
    var d = 0
    while (d < distance && frontier.nonEmpty) {
      val next = mutable.ListBuffer.empty[Long]
      frontier.foreach { cur =>
        val neighbors =
          inEdges.get(cur).map(_.toSeq).getOrElse(Nil) ++ outTargets(cur)
        neighbors.foreach { t =>
          if (!visited.contains(t)) {
            visited += t
            next += t
            if (visited.size > maxSize) return None
          }
        }
      }
      frontier = next.toList
      d += 1
    }
    val sub = new Cfg
    visited.foreach(sub.addNode)
    // second pass: edges whose both endpoints fall inside the ball,
    // in original insertion order (flowgraph.cpp:256-266)
    sub.nodes.foreach { n =>
      outTargets(n).foreach(t => if (sub.hasNode(t)) sub.addEdge(n, t))
    }
    Some(sub)
  }
}

/** A graphlet feature: the subgraph's structural hash drawn through the
  * seeded family (`HashGraph`, functionsimhash.cpp:281-288: word k uses seeds
  * `seedXForHashY(i, hashIndex) * (counter+1)` with counter = 64k). */
final case class GraphletFeat(graphlet: Cfg, node: Long) extends Feat {
  val weightClass: Int = graft.core.WeightClass.Structural
  def hash128(hashIndex: Long): (Long, Long) = {
    @inline def word(counter: Long): Long = graphlet.structuralHash(node,
      HashFamily.seedXForHashY(0, hashIndex) * (counter + 1),
      HashFamily.seedXForHashY(1, hashIndex) * (counter + 1),
      HashFamily.seedXForHashY(2, hashIndex) * (counter + 1))
    (word(0), word(64))
  }
}
