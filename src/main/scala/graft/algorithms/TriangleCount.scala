package graft.algorithms

import graft.core.{Graph, GraphUtil}

/** Global triangle count (reference: algorithms/triangle_count.py:6-9).
  *
  * Edges are canonicalized (self-loops dropped, endpoints ordered, deduped)
  * so each triangle is matched exactly once by the 3-way structural
  * self-join a-b, b-c, a-c.
  */
final case class TriangleCount() {
  def run(g: Graph): Long =
    GraphUtil.matchStructure(
      GraphUtil.orderEdges(g.edges),
      Seq(("a", "b"), ("b", "c"), ("a", "c"))).count()
}
