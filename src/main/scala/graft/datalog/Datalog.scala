package graft.datalog

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.{Columns, Graph, GraphUtil}

/** Datalog-style conjunctive motif queries over a graph
  * (reference: pyspark_graph/datalog.py:10-66).
  *
  * Each premise filters the vertex or edge table and renames columns to
  * logic-variable names; positive premises are natural-joined on shared
  * variables; negated premises are removed with an anti join; the result is
  * projected.
  *
  * Two intended-semantics fixes vs the as-written reference:
  *  - premises project to *only* their logic variables. The reference keeps
  *    every physical column (edge_id, old_src, ...), which silently forces
  *    any two premises of the same kind to bind the same physical row.
  *  - negation anti-joins ON the shared variables. The reference passes no
  *    join keys (datalog.py:65), which Spark treats as an unconditioned
  *    anti join — emptying the result whenever any negated match exists.
  */
sealed trait Rule {
  def apply(g: Graph): DataFrame
}

/** Bind a vertex to variable `name`; `bindings` maps attribute column ->
  * variable name (those become join-able logic variables too).
  */
final case class VertexRule(
    name: String,
    condition: Column = lit(true),
    bindings: Map[String, String] = Map.empty) extends Rule {
  import Columns._

  def apply(g: Graph): DataFrame =
    g.vertices
      .filter(condition)
      .withColumnRenamed(ID, name)
      .withColumnsRenamed(bindings)
      .select((name +: bindings.values.toSeq).map(col): _*)
}

/** Bind an edge between variables `src` and `dst`. */
final case class EdgeRule(
    src: String,
    dst: String,
    condition: Column = lit(true)) extends Rule {
  import Columns._

  def apply(g: Graph): DataFrame =
    g.edges
      .filter(condition)
      .withColumnsRenamed(Map(SRC -> src, DST -> dst))
      .select(col(src), col(dst))
}

final case class DatalogQuery(
    projection: Seq[Column],
    premises: Seq[Rule],
    negatedPremises: Seq[Rule] = Nil) {

  def apply(g: Graph): DataFrame = {
    require(premises.nonEmpty, "need at least one positive premise")
    val positive = GraphUtil.multipleJoin(premises.map(_.apply(g)))
    val result =
      if (negatedPremises.isEmpty) positive
      else {
        val negative = GraphUtil.multipleJoin(negatedPremises.map(_.apply(g)))
        val on = positive.columns.toSeq.intersect(negative.columns.toSeq)
        require(on.nonEmpty, "negated premises must share a variable with positive premises")
        positive.join(negative, on, "left_anti")
      }
    result.select(projection: _*)
  }
}
