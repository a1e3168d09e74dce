package graft.algorithms

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.{CheckpointPolicy, Columns, Graph}

/** Deterministic uniform random walks — the training-data generator for
  * graph embeddings (DeepWalk / node2vec with p = q = 1): one fixed-length
  * walk per start vertex, each step choosing a uniform pseudo-random
  * neighbor. The choice is a PURE HASH of (walker, step, neighbor) — no
  * RNG state — so walks are reproducible across engines, retries and
  * partitionings, and any engine can replay them (the DuckDB oracle
  * does, bit for bit).
  *
  * Step semantics: from vertex v at step k, walker w moves to the
  * neighbor u of v minimizing (hash(w, k, u), u) — a uniform choice
  * among neighbors because the hash is uniform, with the (…, u)
  * tiebreak making equal-hash collisions deterministic too. Walkers at a
  * sink (no out-edges) stop; their walk simply has fewer rows.
  *
  * Scale shape: each step is one keyed join (frontier ⋈ edges on the
  * current vertex) + one map-side-combinable min aggregation — no
  * windows, no single reducer per vertex. A mega-hub's fan-out is spread
  * across its edge partitions and combined map-side, the same shape as a
  * degree count. Frontiers are checkpointed per step (lineage O(1) in
  * walk length, as Pregel).
  *
  * Hash-overflow discipline (same as the samplers): walker and neighbor
  * ids are reduced mod 2^31 before the Knuth multiply so every product
  * stays far inside i64 under ANSI mode.
  */
object RandomWalks {
  import Columns._

  /** Portable per-(walker, step, neighbor) hash, uniform on [0, 2^32). */
  def stepHash(walker: Column, step: Int, neighbor: Column): Column =
    pmod(
      pmod(pmod(walker, lit(2147483648L)) * lit(1000003L)
          + lit(step.toLong * 8191L)
          + pmod(neighbor, lit(2147483648L)),
        lit(2147483648L)) * lit(2654435761L),
      lit(4294967296L))

  /** One `steps`-step walk from every vertex of `starts` (a one-column
    * frame of ids). Output (walker, step, vertex): step 0 is the start
    * vertex; a walk that hits a sink before `steps` ends early. */
  def uniformWalks(g: Graph, starts: DataFrame, steps: Int,
      checkpoint: CheckpointPolicy = CheckpointPolicy.Local): DataFrame = {
    require(steps >= 1, s"steps must be >= 1, got $steps")
    val edges = checkpoint.pin(
      (if (g.directed) g.edges else g.symmetricEdges)
        .select(col(SRC), col(DST)))
    var frontier = checkpoint.pin(
      starts.select(col(starts.columns.head).as("walker"))
        .withColumn("vertex", col("walker")))
    val out = Seq.newBuilder[DataFrame]
    out += frontier.withColumn("step", lit(0))
    var k = 1
    while (k <= steps && !frontier.isEmpty) {
      val h = stepHash(col("walker"), k, col(DST))
      val next = frontier.join(edges, frontier("vertex") === edges(SRC))
        .groupBy(col("walker"))
        .agg(min(struct(h.as("_h"), col(DST).as("_d"))).as("_m"))
        .select(col("walker"), col("_m").getField("_d").as("vertex"))
      frontier = checkpoint.pin(next)
      out += frontier.withColumn("step", lit(k))
      k += 1
    }
    out.result().reduce(_.unionByName(_))
      .select(col("walker"), col("step"), col("vertex"))
  }
}
