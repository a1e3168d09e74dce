package graft.algorithms

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.core.{Columns, Graph}
import graft.pregel.Pregel

/** Weisfeiler-Lehman graph hash (reference: algorithms/wl_kernel.py:8-32).
  *
  * Vertex labels (default: degree) are iteratively replaced by a hash of the
  * sorted concatenation of neighbour labels; the result is a single hash
  * that is equal for isomorphic graphs.
  *
  * The reference hashes `collect_list` output directly, whose order is
  * nondeterministic — its "golden" digests are unstable. We `array_sort`
  * before joining (both per-vertex and for the final global hash), which
  * makes the digest canonical and *also* order-independent, so isomorphism
  * invariance actually holds.
  */
final case class WLKernel(
    hashFunc: Column => Column = sha1,
    labelColumn: Option[String] = None,
    maxIterations: Int = 3) {
  import Columns._

  def run(g: Graph): String = {
    val (graph, label) = labelColumn match {
      case Some(c) => (g, c)
      case None =>
        // default initial label: vertex degree (wl_kernel.py:22-25)
        (g.copy(vertices = g.vertices.join(g.degrees, Seq(ID))), DEGREE)
    }
    val result = Pregel(
      initialState = col(label).cast("string"),
      aggExpr = hashFunc(array_join(array_sort(collect_list(col(MSG))), "")),
      msgToSrc = if (graph.directed) None else Some(col(STATE)),
      msgToDst = Some(col(STATE)),
      maxIterations = maxIterations)
      .run(graph)
    result
      .agg(hashFunc(array_join(array_sort(collect_list(col(STATE))), "")))
      .head()
      .getString(0)
  }
}
