package graft.algorithms

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.{Columns, Graph}
import graft.pregel.Pregel

/** Community detection by modal-neighbour-label propagation
  * (reference: algorithms/label_propagation.py:11-35).
  *
  * Each vertex starts from `labelColumn` (default: its id) and repeatedly
  * adopts the most frequent label among its neighbours. We use Spark's
  * deterministic `mode` (ties broken by smallest value) so results are
  * stable across runs — the reference's plain `mode` is tie-nondeterministic.
  */
final case class LabelPropagation(
    labelColumn: Option[Column] = None,
    maxIterations: Int = 10) {
  import Columns._

  def run(g: Graph): DataFrame =
    Pregel(
      initialState = labelColumn.getOrElse(col(ID)),
      aggExpr = mode(col(MSG), deterministic = true),
      msgToSrc = if (g.directed) None else Some(col(STATE)),
      msgToDst = Some(col(STATE)),
      maxIterations = maxIterations)
      .run(g)
      .select(col(ID), col(STATE).as(LABEL))
}
