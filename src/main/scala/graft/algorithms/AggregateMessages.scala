package graft.algorithms

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.{Columns, Graph, GraphUtil}

/** One round of message passing over triplets — GraphFrames-style
  * `aggregateMessages` (reference: algorithms/aggregate_messages.py:14-45).
  *
  * Message expressions may reference any triplet column: edge attributes
  * plus src-/dst-vertex attributes under the [[AggregateMessages.SRC_VERTEX_PREFIX]]
  * and [[AggregateMessages.DST_VERTEX_PREFIX]] prefixes.
  *
  * The reference file is latently broken (un-imported schema types at :20,
  * and the `to_dst`-only branch keys messages by the *src* vertex at :44);
  * this implements the intended semantics: `toSrc` messages are delivered to
  * the edge's source vertex, `toDst` messages to its destination vertex.
  */
final case class AggregateMessages(
    agg: Column,
    toSrc: Option[Column] = None,
    toDst: Option[Column] = None) {
  import Columns._
  import AggregateMessages._

  require(toSrc.nonEmpty || toDst.nonEmpty, "need at least one of toSrc or toDst")

  def run(g: Graph): DataFrame = {
    val triplets = g.triplets(SRC_VERTEX_PREFIX, DST_VERTEX_PREFIX)
    val messages = GraphUtil.multipleUnion(Seq(
      toSrc.map(m => triplets.select(m.as(MSG), col(SRC_VERTEX_PREFIX + ID).as(ID))),
      toDst.map(m => triplets.select(m.as(MSG), col(DST_VERTEX_PREFIX + ID).as(ID)))).flatten)
    messages.groupBy(col(ID)).agg(agg.as(MSG))
  }
}

object AggregateMessages {
  val SRC_VERTEX_PREFIX = "src_vertex_"
  val DST_VERTEX_PREFIX = "dst_vertex_"

  /** convenience accessors mirroring the reference's src_col/dst_col */
  def srcCol(name: String): Column = col(SRC_VERTEX_PREFIX + name)
  def dstCol(name: String): Column = col(DST_VERTEX_PREFIX + name)
}
