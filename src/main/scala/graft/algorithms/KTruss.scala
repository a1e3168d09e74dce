package graft.algorithms

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{CheckpointPolicy, Columns, Graph, GraphUtil}

/** k-truss decomposition by iterative edge peeling — the edge-support
  * analog of [[KCore]] (ref: pyspark_graph's density toolkit exposes
  * triangle counts; the truss is the standard next step for cohesive
  * community extraction and spam-edge pruning). The k-truss is the
  * maximal subgraph in which every EDGE closes at least k-2 triangles;
  * peeling repeatedly deletes under-supported edges (each deletion can
  * drop neighbors' supports) until a fixpoint.
  *
  * Scale shape: each round is one wedge self-join keyed on the shared
  * endpoint + one closing-edge equi-join (the q08 triangle-listing plan,
  * never a cartesian), then a map-side-combinable support aggregation
  * and a two-column left-semi prune. The edge set only shrinks, so round
  * cost is monotonically non-increasing, and frames are checkpointed per
  * round (lineage O(1) in round count).
  *
  * Wedges are enumerated with DEGREE-ORDERED orientation (each edge
  * points from its (degree, id)-smaller endpoint; every triangle is
  * found once, at its orientation-minimal vertex) — the same device as
  * [[TriangleCount]], bounding the wedge join at Σ d⁺(v)² = O(E^1.5)
  * where id-ordered enumeration is unbounded on dense graphs. On the
  * 10x-replicated orders graph (1.2M edges, avg degree ~160) the
  * orientation cuts the per-round wedge join from 3.4 BILLION rows to
  * 50M — the difference between an unrunnable round and a ~minute one.
  */
object KTruss {
  import Columns._

  /** Edges of the k-truss with their in-truss supports:
    * (src, dst, support). Works on the canonicalized undirected simple
    * graph (self-loops dropped, edges deduped, src < dst). Returns empty
    * when the k-truss is empty. */
  def run(g: Graph, k: Int,
      checkpoint: CheckpointPolicy = CheckpointPolicy.Local,
      maxIterations: Int = 100): DataFrame = {
    require(k >= 3, s"k must be >= 3 (k-2 triangles per edge), got $k")
    var edges = checkpoint.pin(GraphUtil.orderEdges(g.edges).select(col(SRC), col(DST)))
    var nEdges = edges.count()
    var i = 0
    var done = nEdges == 0L
    while (!done && i < maxIterations) {
      val keep = supports(edges)
        .filter(col("support") >= k - 2)
        .select(col(SRC), col(DST))
      val pruned = checkpoint.pin(edges.join(keep, Seq(SRC, DST), "left_semi"))
      val n = pruned.count()
      done = n == nEdges
      nEdges = n
      edges = pruned
      i += 1
    }
    require(done || nEdges == 0L,
      s"k-truss peeling did not converge within $maxIterations rounds")
    supports(edges)
  }

  /** Per-edge triangle support over a canonical (src < dst, deduped)
    * edge set, via degree-ordered wedge enumeration. Edges closing zero
    * triangles are absent — exactly the edges the first peel would drop
    * for any k >= 3. */
  private def supports(edges: DataFrame): DataFrame = {
    val deg = edges.select(col(SRC).as(ID))
      .unionAll(edges.select(col(DST).as(ID)))
      .groupBy(col(ID)).agg(count(lit(1)).as("_deg"))
    val srcFirst = struct(col("_ds"), col(SRC)) < struct(col("_dd"), col(DST))
    val oriented = edges
      .join(deg.select(col(ID).as(SRC), col("_deg").as("_ds")), Seq(SRC))
      .join(deg.select(col(ID).as(DST), col("_deg").as("_dd")), Seq(DST))
      .select(
        when(srcFirst, col(SRC)).otherwise(col(DST)).as("u"),
        when(srcFirst, col(DST)).otherwise(col(SRC)).as("v"))
    // wedges at the orientation-minimal vertex; heads deduped as an
    // unordered pair by id, closure checked against the CANONICAL edge set
    val o1 = oriented.select(col("u"), col("v").as("a"))
    val o2 = oriented.select(col("u").as("u2"), col("v").as("b"))
    val tri = o1.join(o2, col("u") === col("u2") && col("a") < col("b"))
      .join(edges,
        least(col("a"), col("b")) === col(SRC) &&
          greatest(col("a"), col("b")) === col(DST), "left_semi")
      .select(col("u"), col("a"), col("b"))
    tri.select(least(col("u"), col("a")).as(SRC), greatest(col("u"), col("a")).as(DST))
      .unionAll(tri.select(least(col("u"), col("b")).as(SRC),
        greatest(col("u"), col("b")).as(DST)))
      .unionAll(tri.select(least(col("a"), col("b")).as(SRC),
        greatest(col("a"), col("b")).as(DST)))
      .groupBy(col(SRC), col(DST))
      .agg(count(lit(1)).as("support"))
  }
}
