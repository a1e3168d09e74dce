package graft.algorithms

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.{Columns, Graph}
import graft.pregel.Pregel

/** Community detection by modal-neighbour-label propagation
  * (reference: algorithms/label_propagation.py:11-35).
  *
  * Each vertex starts from `labelColumn` (default: its id) and repeatedly
  * adopts the most frequent label among its neighbours, ties broken by
  * smallest value (Spark's deterministic `mode` contract — the
  * reference's plain `mode` is tie-nondeterministic).
  *
  * The modal aggregate is computed as count-per-(vertex, label) followed
  * by `min_by(label, (-count, label))` rather than Spark's `mode`: the
  * two-step form is identical in semantics but both of its aggregations
  * are decomposable, so they partial-combine map-side and hash-spread
  * across reducers. `mode` is holistic — it materializes a per-vertex
  * frequency map on ONE reducer, which for a power-law hub with 1e8
  * in-neighbours is an OOM, not just a straggler. (MODE_EQUIVALENCE in
  * AlgorithmsSpec pins the two forms equal on random multigraphs.)
  */
final case class LabelPropagation(
    labelColumn: Option[Column] = None,
    maxIterations: Int = 10) {
  import Columns._

  def run(g: Graph): DataFrame =
    Pregel(
      initialState = labelColumn.getOrElse(col(ID)),
      aggExpr = mode(col(MSG), deterministic = true), // unused; see messageAggregator
      msgToSrc = if (g.directed) None else Some(col(STATE)),
      msgToDst = Some(col(STATE)),
      maxIterations = maxIterations,
      messageAggregator = Some(LabelPropagation.scalableMode))
      .run(g)
      .select(col(ID), col(STATE).as(LABEL))
}

object LabelPropagation {
  import Columns._

  /** Deterministic mode as two decomposable aggregations: `(-count,
    * label)` ascending makes `min_by` pick the most frequent label with
    * ties to the smallest — for any orderable label type, no negation of
    * the label value needed. */
  private[graft] def scalableMode(messages: DataFrame): DataFrame =
    messages.groupBy(col(ID), col(MSG))
      .agg(count(lit(1)).as("_c"))
      .groupBy(col(ID))
      .agg(min_by(col(MSG), struct((-col("_c")).as("_nc"), col(MSG))).as(MSG))
}
