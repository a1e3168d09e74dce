package graft.algorithms

import org.apache.spark.sql.functions._

import graft.core.{Columns, Graph, GraphUtil}

/** Global triangle count (reference: algorithms/triangle_count.py:6-9).
  *
  * Edges are canonicalized (self-loops dropped, deduped, endpoints ordered)
  * so each triangle is matched exactly once by the 3-way structural
  * self-join a-b, b-c, a-c.
  *
  * The ordering is by (degree, id), not id (the reference's
  * least/greatest): the wedge join enumerates two-paths at each pivot
  * vertex b, so its cost is sum over b of out-degree(b)^2 under the chosen
  * orientation. Orienting every edge toward the higher-degree endpoint
  * caps that sum at O(E^1.5) on any graph (the classic compact-forward
  * bound) where id ordering can hit d_max^2 on power-law graphs — the
  * difference between a skewed and a balanced shuffle at 100 TB. Triangle
  * count itself is invariant under any total vertex order.
  */
final case class TriangleCount() {
  import Columns._
  import TriangleCount._

  def run(g: Graph): Long = triangles(g).count()
}

object TriangleCount {
  import Columns._
  import org.apache.spark.sql.DataFrame

  /** Canonical edges oriented toward the higher-(degree, id) endpoint. */
  private def oriented(g: Graph): DataFrame = {
    val canonical = GraphUtil.orderEdges(g.edges)
    // degree under the canonicalized (undirected) edge set
    val deg = canonical.select(col(SRC).as(ID))
      .unionAll(canonical.select(col(DST).as(ID)))
      .groupBy(col(ID)).agg(count(lit(1)).as(DEGREE))
    canonical
      .join(deg.select(col(ID).as(SRC), col(DEGREE).as("_ds")), Seq(SRC))
      .join(deg.select(col(ID).as(DST), col(DEGREE).as("_dd")), Seq(DST))
      .select(
        when(struct(col("_ds"), col(SRC)) < struct(col("_dd"), col(DST)), col(SRC))
          .otherwise(col(DST)).as(SRC),
        when(struct(col("_ds"), col(SRC)) < struct(col("_dd"), col(DST)), col(DST))
          .otherwise(col(SRC)).as(DST))
  }

  /** One row per triangle (a, b, c); each triangle appears exactly once. */
  def triangles(g: Graph): DataFrame =
    GraphUtil.matchStructure(oriented(g), Seq(("a", "b"), ("b", "c"), ("a", "c")))

  /** Triangles per participating vertex — the numerator of the local
    * clustering coefficient. Same enumeration as the global count, then an
    * explode + hash aggregation; vertices in no triangle are absent.
    */
  def perVertex(g: Graph): DataFrame =
    triangles(g)
      .select(explode(array(col("a"), col("b"), col("c"))).as(ID))
      .groupBy(col(ID))
      .agg(count(lit(1)).as("n_triangles"))

  /** Local clustering coefficient: 2·tri(v) / (deg(v)·(deg(v)−1)) over
    * the canonicalized simple graph, 0 when deg(v) < 2. Both operands
    * are exact integers and the division is one correctly-rounded IEEE
    * op, so the value is bit-identical in any engine — no rounding
    * needed. Vertices with no surviving canonical edge are absent (an
    * isolated vertex has no defined coefficient). Output (id, degree,
    * clustering). */
  def clusteringCoefficient(g: Graph): DataFrame = {
    val canonical = GraphUtil.orderEdges(g.edges)
    val deg = canonical.select(col(SRC).as(ID))
      .unionAll(canonical.select(col(DST).as(ID)))
      .groupBy(col(ID)).agg(count(lit(1)).as(DEGREE))
    deg.join(perVertex(g), Seq(ID), "left")
      .select(col(ID), col(DEGREE),
        when(col(DEGREE) >= 2,
          (lit(2.0) * coalesce(col("n_triangles"), lit(0L)).cast("double")) /
            (col(DEGREE) * (col(DEGREE) - lit(1L))).cast("double"))
          .otherwise(lit(0.0)).as("clustering"))
  }
}
