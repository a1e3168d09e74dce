package graft.algorithms

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{Graph, GraphUtil}

/** Degree assortativity (Newman 2002, "Assortative mixing in networks"):
  * the Pearson correlation of endpoint degrees over edges — do hubs
  * attach to hubs (r > 0, social nets) or to leaves (r < 0, tech/bio
  * nets)? A single structural scalar the reference library has no
  * counterpart for.
  *
  * Computed over canonical undirected edges, both orientations (the
  * standard symmetrization), as exact integer sums: M2 = 2m orientation
  * pairs, S_x = Σ deg_x, S_xx = Σ deg_x², S_xy = Σ deg_x·deg_y. Then
  * r = (M2·S_xy − S_x²) / (M2·S_xx − S_x²), evaluated in DOUBLE from the
  * exact i64 sums (each sum fits i64 comfortably; the cross products can
  * exceed it at extreme scale, and doubles of identical integer inputs
  * round identically on every engine — so the result is bit-stable AND
  * overflow-free where a pure i64 formula would ANSI-throw).
  *
  * Scale shape: one degree aggregation plus two equi-joins keyed by
  * vertex id to tag both endpoints, then a single global aggregate with
  * map-side partials. No window, no collect, no cross join.
  */
object Assortativity {

  /** One row: (m2, s_x, s_xx, s_xy, r) — the exact integer sums and the
    * assortativity coefficient rounded to 9 decimals. Degenerate graphs
    * (all degrees equal, so zero variance) yield r = NaN (0/0).
    */
  def degreeAssortativity(g: Graph): DataFrame = {
    val e = GraphUtil.orderEdges(g.edges).select(col("src"), col("dst"))
    val deg = e.select(col("src").as("id")).union(e.select(col("dst").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    val pairs = e.union(e.select(col("dst"), col("src")))
      .join(deg.select(col("id").as("src"), col("deg").as("dx")), Seq("src"))
      .join(deg.select(col("id").as("dst"), col("deg").as("dy")), Seq("dst"))
    val sums = pairs.agg(
      count(lit(1)).as("m2"),
      sum(col("dx")).as("s_x"),
      sum(col("dx") * col("dx")).as("s_xx"),
      sum(col("dx") * col("dy")).as("s_xy"))
    sums.select(
      col("m2"), col("s_x"), col("s_xx"), col("s_xy"),
      round(
        (col("m2").cast("double") * col("s_xy").cast("double") -
          col("s_x").cast("double") * col("s_x").cast("double")) /
          (col("m2").cast("double") * col("s_xx").cast("double") -
            col("s_x").cast("double") * col("s_x").cast("double")),
        9).as("r"))
  }
}
