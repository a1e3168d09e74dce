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
  * round (lineage O(1) in round count). Skewed hub vertices fan the
  * wedge join out across partitions because the join key is the wedge
  * CENTER — the standard degree-ordered orientation (src < dst after
  * canonicalization) already caps per-key wedge counts by the smaller
  * endpoint's degree.
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
    * edge set. Edges closing zero triangles are absent — exactly the
    * edges the first peel would drop for any k >= 3. */
  private def supports(edges: DataFrame): DataFrame = {
    val e1 = edges.select(col(SRC).as("c"), col(DST).as("a"))
    val e2 = edges.select(col(SRC).as("c2"), col(DST).as("b"))
    val tri = e1.join(e2, col("c") === col("c2") && col("a") < col("b"))
      .join(edges, col("a") === col(SRC) && col("b") === col(DST), "left_semi")
    tri.select(col("c").as(SRC), col("a").as(DST))
      .unionAll(tri.select(col("c").as(SRC), col("b").as(DST)))
      .unionAll(tri.select(col("a").as(SRC), col("b").as(DST)))
      .groupBy(col(SRC), col(DST))
      .agg(count(lit(1)).as("support"))
  }
}
