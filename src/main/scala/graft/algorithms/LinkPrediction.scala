package graft.algorithms

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link prediction over a bipartite center→item co-occurrence set (the
  * item–item projection: score item pairs by the centers they share —
  * co-purchase recommendation, co-citation, co-click). Scores per
  * candidate pair (a, b):
  *
  *   - `cn` — common-neighbor count: how many centers touch both.
  *   - `ra_scaled` — resource allocation (Zhou et al. 2009) Σ 1/deg(z)
  *     over shared centers z, kept engine-exact as Σ (2^20 div deg(z))
  *     in i64: integer division loses < 1/2^20 relative mass per term
  *     but makes the score reproducible bit for bit in any engine,
  *     which a float summation (engine-specific reduction order) never
  *     is.
  *   - `jaccard` — cn / (deg(a) + deg(b) − cn) over full item degrees,
  *     one correctly-rounded division.
  *
  * Scale shape: candidates are generated ONLY by the per-center
  * self-join (an equi-join on the center key — no cartesian, no BNLJ),
  * so the work is Σ deg(z)² over centers. That sum is dominated by hub
  * centers, and a hub contributes ~nothing per pair (1/deg ≈ 0) while
  * exploding the pair count — so `maxCenterDegree` drops centers above
  * the cap before the join, the standard bounded-projection practice.
  * The cap bounds per-row join fan-out at maxCenterDegree², making the
  * wedge stage linear in the capped edge count; item degrees for the
  * Jaccard denominator still come from the FULL edge set, so the cap
  * only thins the evidence, never distorts the universe.
  */
object LinkPrediction {

  private val RaScale = 1L << 20

  /** @param edges   bipartite rows; duplicates are collapsed.
    * @param topK    pairs returned, ordered by (cn, ra_scaled) desc with
    *                (item_a, item_b) as the total tie-break.
    */
  def coOccurrenceScores(
      edges: DataFrame, centerCol: String, itemCol: String,
      maxCenterDegree: Int, topK: Int): DataFrame = {
    require(maxCenterDegree >= 2, s"maxCenterDegree must be >= 2")
    require(topK >= 1, s"topK must be >= 1")
    val e = edges.select(
      col(centerCol).cast("long").as("_c"), col(itemCol).cast("long").as("_i"))
      .distinct()
    val cdeg = e.groupBy(col("_c")).agg(count(lit(1)).as("_cd"))
      .filter(col("_cd") <= maxCenterDegree)
    val ideg = e.groupBy(col("_i")).agg(count(lit(1)).as("_id"))
    val ec = e.join(cdeg, "_c")
    val wedges = ec.select(col("_c"), col("_i").as("item_a"), col("_cd"))
      .join(ec.select(col("_c"), col("_i").as("item_b")), Seq("_c"))
      .filter(col("item_a") < col("item_b"))
    val scored = wedges.groupBy(col("item_a"), col("item_b"))
      .agg(
        count(lit(1)).as("cn"),
        sum(expr(s"$RaScale div _cd")).as("ra_scaled"))
    scored
      .join(ideg.select(col("_i").as("item_a"), col("_id").as("_da")), Seq("item_a"))
      .join(ideg.select(col("_i").as("item_b"), col("_id").as("_db")), Seq("item_b"))
      .select(col("item_a"), col("item_b"), col("cn"), col("ra_scaled"),
        round(col("cn").cast("double") /
          (col("_da") + col("_db") - col("cn")), 6).as("jaccard"))
      .orderBy(col("cn").desc, col("ra_scaled").desc, col("item_a"), col("item_b"))
      .limit(topK)
  }
}
