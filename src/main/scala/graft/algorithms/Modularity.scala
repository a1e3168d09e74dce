package graft.algorithms

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{Graph, GraphUtil}

/** Newman modularity of a given vertex partition — the standard quality
  * score for community-detection output (e.g. a
  * [[graft.algorithms.LabelPropagation]] labelling), Q = Σ_c [ m_c/m −
  * (D_c/2m)² ] over canonical undirected edges (self-loops dropped,
  * endpoints ordered, deduped; reference util.py:35-39's `order_edges`
  * convention).
  *
  * The reference library detects communities but never scores them; this
  * closes that loop. All inputs to the floating-point step are exact
  * integers (edge counts, degree sums), and each community's contribution
  * is two correctly-rounded divisions, one multiply and one subtract in a
  * fixed order — bit-identical across engines.
  *
  * Scale shape (100 TB of edges): two equi-joins keyed by vertex id to tag
  * edge endpoints with communities, then map-side-combinable groupBys;
  * the only global value (total edge count) travels as a broadcast 1-row
  * join, never a driver collect. No window over the edge set, no
  * cross join; hot communities are absorbed by partial aggregation.
  */
object Modularity {

  /** Per-community modularity terms for `assignment` (id, community) over
    * `g`'s canonical undirected edges. Output: (community, m_in = edges
    * with both endpoints inside, deg_sum = Σ degrees of members,
    * contribution = m_in/m − (deg_sum/2m)²); global Q = sum(contribution).
    * Vertices absent from `assignment` contribute nothing; communities
    * whose members touch no edge appear with zero terms.
    */
  def perCommunity(g: Graph, assignment: DataFrame): DataFrame = {
    val a = assignment.select(col("id"), col("community"))
    val e = GraphUtil.orderEdges(g.edges).select(col("src"), col("dst"))
    val tagged = e
      .join(a.select(col("id").as("src"), col("community").as("c_src")), Seq("src"))
      .join(a.select(col("id").as("dst"), col("community").as("c_dst")), Seq("dst"))
    val mIn = tagged.filter(col("c_src") === col("c_dst"))
      .groupBy(col("c_src").as("community"))
      .agg(count(lit(1)).as("m_in"))
    val degSum = e.select(col("src").as("id")).union(e.select(col("dst").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
      .join(a, Seq("id"))
      .groupBy(col("community")).agg(sum(col("deg")).as("deg_sum"))
    val m = e.agg(count(lit(1)).as("m"))
    a.select(col("community")).distinct()
      .join(mIn, Seq("community"), "left")
      .join(degSum, Seq("community"), "left")
      .crossJoin(broadcast(m))
      .select(
        col("community"),
        coalesce(col("m_in"), lit(0L)).as("m_in"),
        coalesce(col("deg_sum"), lit(0L)).as("deg_sum"),
        round(
          coalesce(col("m_in"), lit(0L)).cast("double") / col("m").cast("double") -
            (coalesce(col("deg_sum"), lit(0L)).cast("double") /
              (lit(2L) * col("m")).cast("double")) *
              (coalesce(col("deg_sum"), lit(0L)).cast("double") /
                (lit(2L) * col("m")).cast("double")),
          9).as("contribution"))
  }
}
