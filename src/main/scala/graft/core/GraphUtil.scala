package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Relational helpers shared by the graph operators.
  *
  * Re-expression of the reference's pyspark_graph/util.py:9-39.
  */
object GraphUtil {
  import Columns._

  /** Fold-left natural join over the columns the frames share
    * (util.py:9-14). An empty intersection degenerates to a cross join,
    * matching the reference.
    */
  def multipleJoin(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce { (left, right) =>
      val on = left.columns.toSeq.intersect(right.columns.toSeq)
      left.join(right, on)
    }

  /** Fold-left union. The reference unions positionally (util.py:17-21);
    * we union by name, which is what every call site actually intends and
    * is robust to projection-order drift.
    */
  def multipleUnion(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_ unionByName _)

  /** Null-safe inequality — the default Pregel convergence comparator
    * (util.py:24-25).
    */
  def neNullSafe(x: Column, y: Column): Column = !(x <=> y)

  /** Structural motif matcher (util.py:28-32): one copy of the edge list
    * per pattern edge, endpoints renamed to logic-variable names, all
    * copies natural-joined on shared variables.
    */
  def matchStructure(edges: DataFrame, pattern: Seq[(String, String)]): DataFrame = {
    require(pattern.nonEmpty, "match pattern must not be empty")
    multipleJoin(pattern.map { case (s, d) =>
      edges.select(col(SRC).as(s), col(DST).as(d))
    })
  }

  /** Canonicalize undirected edges (util.py:35-39): drop self-loops,
    * order endpoints ascending, dedup.
    */
  def orderEdges(edges: DataFrame): DataFrame =
    edges
      .filter(col(SRC) =!= col(DST))
      .select(
        least(col(SRC), col(DST)).as(SRC),
        greatest(col(SRC), col(DST)).as(DST))
      .dropDuplicates()
}
