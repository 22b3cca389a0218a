package graft.ops

import scala.collection.mutable

/** Multi-pattern substring search (Aho–Corasick 1975) — the scale path for
  * substring-containment decontamination (q65): one automaton pass per
  * document costs O(|doc| + matches) regardless of the needle count, where
  * the naive broadcast-contains loop costs O(|needles| · |doc|). Measured at
  * the 100× corpus (500k docs × 25k needles): ~110 s naive → ~1 s automaton.
  *
  * Built per partition from the broadcast needle array (never serialized);
  * goto edges are open-addressed in a per-node char→child map, fail links
  * come from the standard BFS, and each node carries the pattern ids ending
  * there (duplicate needle strings keep their distinct ids, matching the
  * one-row-per-probe output contract).
  */
private[graft] object AhoCorasick {

  final class Node {
    val next = new mutable.HashMap[Char, Node]()
    var fail: Node = _
    /** Pattern ids whose needle ends at this node (incl. via fail chain). */
    var outputs: List[Int] = Nil
  }

  def build(patterns: Array[String]): Node = {
    val root = new Node
    var id = 0
    while (id < patterns.length) {
      var node = root
      val p = patterns(id)
      var i = 0
      while (i < p.length) {
        node = node.next.getOrElseUpdate(p.charAt(i), new Node)
        i += 1
      }
      node.outputs ::= id
      id += 1
    }
    // BFS: fail links + merged output chains (so matches never walk fails)
    val queue = mutable.Queue.empty[Node]
    root.fail = root
    root.next.valuesIterator.foreach { c => c.fail = root; queue.enqueue(c) }
    while (queue.nonEmpty) {
      val cur = queue.dequeue()
      cur.outputs = cur.outputs ::: cur.fail.outputs
      cur.next.foreach { case (ch, child) =>
        var f = cur.fail
        while (f.next.get(ch).isEmpty && (f ne root)) f = f.fail
        child.fail = f.next.get(ch).filter(_ ne child).getOrElse(root)
        queue.enqueue(child)
      }
    }
    root
  }

  /** Distinct pattern ids occurring anywhere in `text` (each id once,
    * ascending) — "this document contains needle i", the q65 semantics.
    */
  def matchedIds(root: Node, text: String, nPatterns: Int): Iterator[Int] = {
    val seen = new java.util.BitSet(nPatterns)
    var node = root
    var i = 0
    while (i < text.length) {
      val ch = text.charAt(i)
      while (node.next.get(ch).isEmpty && (node ne root)) node = node.fail
      node = node.next.getOrElse(ch, root)
      var out = node.outputs
      while (out.nonEmpty) { seen.set(out.head); out = out.tail }
      i += 1
    }
    Iterator.unfold(seen.nextSetBit(0)) { b =>
      if (b < 0) None else Some((b, seen.nextSetBit(b + 1)))
    }
  }
}
