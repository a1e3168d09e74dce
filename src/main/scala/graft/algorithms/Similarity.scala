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

  /** Scale path for [[jaccard]]: MinHash-LSH candidate generation over the
    * adjacency sets, exact verify on candidates. Returns unordered pairs
    * (vertex_a < vertex_b) with jaccard_similarity >= `threshold` — the
    * same rows as `jaccard(g).filter(sim >= t && a < b)` whenever LSH
    * recall holds (with numHashes=128/bands=32, a pair at s is missed with
    * probability (1-s^4)^32 — ~1e-30 at s=0.97, 5e-8 at s=0.8).
    *
    * Plan shape: one shuffle to build signatures (explode + 128-way min
    * aggregation, codegen'd), one equi-join on (band, bucket) — never the
    * reference's O(V^2) theta join (jaccard_similarity.py:13-14). The
    * adjacency aggregate is computed ONCE ([[Graph.persistAdjacency]])
    * and shared by banding and both exact-verify joins.
    *
    * Hot buckets — many vertices with IDENTICAL neighbourhoods, which is
    * the common case on real graphs (every leaf of a star has adjacency
    * {hub}) — make the bucket self-join quadratic in the hot-key count.
    * `maxBucketSize > 0` drops bucket keys with more members than the cap
    * (the [[graft.dedup.Dedup.dropHotChunks]] pigeonhole device: one
    * combinable count + a broadcast anti-join of only the hot keys).
    * Recall contract under the cap: a qualifying pair is reported unless
    * EVERY band-bucket it shares is hot — pairs inside an
    * identical-neighbourhood cohort larger than the cap are the
    * deliberately-dropped degenerate mass (quadratic, similarity exactly
    * 1, recoverable by grouping on the adjacency hash instead of
    * pairwise joining); pairs with any non-hot shared bucket are
    * unaffected, and reported values are always exact.
    */
  def approxJaccard(
      g: Graph,
      threshold: Double = 0.5,
      numHashes: Int = 128,
      bands: Int = 32,
      maxBucketSize: Int = 0): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    import graft.dedup.Dedup
    val adj = g.persistAdjacency().adjacency
      .filter(size(col(ADJ)) > 0)
      .select(col(ID).as("id"), col(ADJ).as("sh"))
    val allBuckets = Dedup.minhashSignatures(adj, numHashes).select(
      col("id"), explode(Dedup.lshBuckets(col("sig"), bands, r)).as("bk"))
    val buckets = Dedup.dropHotChunks(allBuckets, col("bk"), maxBucketSize)
    val cands = buckets.as("x")
      .join(buckets.as("y"),
        col("x.bk") === col("y.bk") && col("x.id") < col("y.id"))
      .select(col("x.id").as(VERTEX_A), col("y.id").as(VERTEX_B))
      .distinct()
    cands
      .join(adj.select(col("id").as(VERTEX_A), col("sh").as("sh_a")), Seq(VERTEX_A))
      .join(adj.select(col("id").as(VERTEX_B), col("sh").as("sh_b")), Seq(VERTEX_B))
      .select(
        col(VERTEX_A), col(VERTEX_B),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
          .as("jaccard_similarity"))
      .filter(col("jaccard_similarity") >= threshold)
  }

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
