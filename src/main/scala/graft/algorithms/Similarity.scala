package graft.algorithms

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{Columns, Graph}

/** All-pairs neighbourhood similarity over the adjacency view.
  *
  * Both operators are the reference's O(V^2) theta self-join
  * (jaccard_similarity.py:8-18, overlap_coefficient.py:9-25) — correct for
  * parity, quadratic by definition. The scale path for large graphs is
  * MinHash LSH over the same adjacency sets
  * ([[graft.dedup.Dedup.minhashDuplicates]] generalizes to any set-valued
  * column).
  */
object Similarity {
  import Columns._

  val VERTEX_A = "vertex_a"
  val VERTEX_B = "vertex_b"

  private def allPairs(g: Graph): DataFrame =
    g.adjacency.alias("a")
      .join(g.adjacency.alias("b"), col("a." + ID) =!= col("b." + ID))

  /** |A ∩ B| / |A ∪ B| for every ordered vertex pair. `try_divide`: pairs
    * of isolated vertices have an empty union — the reference runs
    * non-ANSI PySpark where 0/0 is null; Spark 4 ANSI would throw.
    */
  def jaccard(g: Graph): DataFrame =
    allPairs(g).select(
      col("a." + ID).as(VERTEX_A),
      col("b." + ID).as(VERTEX_B),
      try_divide(
        size(array_intersect(col("a." + ADJ), col("b." + ADJ))).cast("double"),
        size(array_union(col("a." + ADJ), col("b." + ADJ))))
        .as("jaccard_similarity"))

  /** |A ∩ B| / min(|A|, |B|) for every ordered vertex pair.
    * DOUBLE result — the reference's declared LongType schema
    * (overlap_coefficient.py:15) is wrong for a ratio. `try_divide` as in
    * [[jaccard]]: an isolated vertex makes the denominator 0.
    */
  def overlap(g: Graph): DataFrame =
    allPairs(g).select(
      col("a." + ID).as(VERTEX_A),
      col("b." + ID).as(VERTEX_B),
      try_divide(
        size(array_intersect(col("a." + ADJ), col("b." + ADJ))).cast("double"),
        least(size(col("a." + ADJ)), size(col("b." + ADJ))))
        .as("overlap_coefficient"))
}

final case class JaccardSimilarity() {
  def run(g: Graph): DataFrame = Similarity.jaccard(g)
}

final case class OverlapCoefficient() {
  def run(g: Graph): DataFrame = Similarity.overlap(g)
}
