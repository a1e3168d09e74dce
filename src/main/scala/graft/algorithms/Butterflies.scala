package graft.algorithms

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Butterfly (2×2 biclique) counting — the bipartite analogue of
  * triangle counting and the standard cohesion metric for two-mode
  * graphs (user–item, author–paper, supplier–part). A butterfly is a
  * pair of centers sharing a pair of items; with cn(a,b) = centers
  * shared by item pair (a,b), the butterfly count is Σ C(cn, 2) and the
  * wedge ("caterpillar") count Σ cn — both exact integers from one
  * per-center equi-self-join plus two combinable aggregations.
  *
  * Scale shape: wedge work is Σ deg(center)², so CALL WITH THE
  * LOWER-DEGREE SIDE AS CENTERS — the same count arrives from either
  * side (each butterfly has exactly one center pair and one item pair),
  * but enumerating from the item side costs Σ deg(item)², which on a
  * hub-heavy side can be orders of magnitude more rows (the bipartite
  * twin of g36's degree-oriented wedge bound). No cartesian anywhere;
  * the pair aggregation is map-side combinable.
  */
object Butterflies {

  /** One row: (n_item_pairs, n_wedges, n_butterflies) over the distinct
    * bipartite edge set. */
  def metrics(edges: DataFrame, centerCol: String, itemCol: String): DataFrame = {
    val e = edges.select(
      col(centerCol).cast("long").as("_c"), col(itemCol).cast("long").as("_i"))
      .distinct()
    val pairs = e.select(col("_c"), col("_i").as("_a"))
      .join(e.select(col("_c"), col("_i").as("_b")), Seq("_c"))
      .filter(col("_a") < col("_b"))
      .groupBy(col("_a"), col("_b")).agg(count(lit(1)).as("cn"))
    pairs.agg(
      count(lit(1)).as("n_item_pairs"),
      sum(col("cn")).as("n_wedges"),
      sum(expr("cn * (cn - 1) div 2")).as("n_butterflies"))
  }
}
