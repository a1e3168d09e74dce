package graft.algorithms

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{CheckpointPolicy, Columns, Graph}

/** PageRank by power iteration — the standard companion to the
  * reference's Pregel family (not in the reference's own surface; added
  * as a north-star operator).
  *
  * Per round every vertex sends rank/out-degree along its out-edges and
  * updates to `(1-d)/N + d * sum(inbound)`; dangling vertices (no
  * out-edges) redistribute their rank uniformly via a scalar aggregate
  * rather than N messages — the classic dangling-mass correction, which
  * keeps the iteration one join + one aggregation regardless of how many
  * sinks exist.
  *
  * Scale: the edge list is projected to (src, dst, out-degree share) and
  * checkpointed once; each round shuffles messages by recipient only.
  * Rank mass is conserved (sums to 1) up to float rounding every round.
  */
/** @param staticCheckpoint policy for the LOOP-INVARIANT frames (the
  *        routing table; the seed vector in the personalized variant),
  *        defaulting to `checkpoint`. Set to
  *        [[CheckpointPolicy.Passthrough]] when the edges come from a
  *        bucketed table ([[graft.sources.GraphIO.writeBucketed]]): the
  *        per-round join then re-reads the bucketed layout with zero
  *        exchange instead of re-shuffling a checkpointed copy whose
  *        partitioning AQE no longer sees. The evolving rank frame keeps
  *        the main policy — it must be pinned or lineage compounds. */
/** @param weightCol edge-weight column for weighted PageRank: a vertex
  *        distributes rank proportionally to edge weight (share =
  *        w / Σw over its out-edges) instead of uniformly — the standard
  *        variant for co-occurrence / interaction graphs where edge
  *        multiplicity carries signal. Zero-weight edges drop (a vertex
  *        whose edges are all zero-weight is dangling); NULL or negative
  *        weights fail loudly. Use integer-typed weights where results
  *        must replay cross-engine: the weight sum then stays exact and
  *        the share is one correctly-rounded division, so constant
  *        weights degenerate BIT FOR BIT to the uniform variant. */
final case class PageRank(
    damping: Double = 0.85,
    maxIterations: Int = 10,
    tolerance: Option[Double] = None,
    checkpoint: CheckpointPolicy = CheckpointPolicy.Local,
    staticCheckpoint: Option[CheckpointPolicy] = None,
    weightCol: Option[String] = None) {
  import Columns._

  val RANK = "rank"

  /** Rounds the last run/runFrom actually executed — the observable the
    * warm-start story is measured by (a warm restart after a small
    * append should re-converge in a small fraction of the cold count;
    * BASELINE.md records it). Diagnostic only, set after each run. */
  @volatile private[graft] var lastIterations: Int = 0

  private def pinStatic(df: DataFrame): DataFrame =
    staticCheckpoint.getOrElse(checkpoint).pin(df)

  /** (src, dst, 1/out-degree(src)) routing table — fixed for the whole
    * iteration. Over a BUCKETED edge table
    * ([[graft.sources.GraphIO.writeBucketed]], directed graphs — an
    * undirected graph unions reversed edges and loses the layout) this
    * plans ZERO exchanges: the out-degree aggregation and the src-keyed
    * join both reuse the write-time bucketing, so the only shuffle left
    * per [[run]] round is the inherent message groupBy(dst)
    * (GraphIOSpec asserts both properties). That is the
    * write-once-shuffle-then-iterate story: on a 100 TB edge set the
    * bucketing shuffle is paid once at write time, not once per job. */
  def routes(g: Graph): DataFrame = weightCol match {
    case None =>
      // undirected: symmetricEdges dedups (src, dst, edge_id), so a
      // reciprocal directed pair would survive as two (src, dst) rows and
      // double-count in the degree and the contribution sum — dedup the
      // endpoint pairs. The directed branch keeps the caller's edge rows
      // (and, over a bucketed table, its exchange-free plan) untouched.
      val edges = if (g.directed) g.edges.select(col(SRC), col(DST))
        else g.symmetricEdges.select(col(SRC), col(DST)).distinct()
      val outDeg = edges.groupBy(col(SRC)).agg(count(lit(1)).as("_od"))
      edges.join(outDeg, Seq(SRC))
        .select(col(SRC), col(DST), (lit(1.0) / col("_od")).as("_share"))
    case Some(c) =>
      val guarded = when(col(c).isNull || col(c) < 0,
        raise_error(concat(lit(s"PageRank: weight column '$c' must be " +
          "non-null and non-negative, got "),
          coalesce(col(c).cast("string"), lit("NULL")))))
        .otherwise(col(c))
      // undirected: dedup ENDPOINT pairs, not (src, dst, w) triples — a
      // reciprocal directed input pair carrying different weights would
      // otherwise survive as parallel edges and double-count in both the
      // weight sum and the contribution (ADVICE r8). Merge rule: MAX
      // weight per directed (src, dst) after symmetrization, so both
      // orientations of an undirected edge see the same weight and equal
      // reciprocal weights degenerate bit for bit to the old behavior.
      val base = if (g.directed)
        g.edges.select(col(SRC), col(DST), guarded.as("_w"))
      else g.symmetricEdges.select(col(SRC), col(DST), guarded.as("_w"))
        .groupBy(col(SRC), col(DST)).agg(max(col("_w")).as("_w"))
      val we = base.filter(col("_w") > 0)
      val sums = we.groupBy(col(SRC)).agg(sum(col("_w")).as("_sw"))
      we.join(sums, Seq(SRC))
        .select(col(SRC), col(DST), (col("_w") / col("_sw")).as("_share"))
  }

  def run(g: Graph): DataFrame = {
    val n = g.vertices.count().toDouble
    iterate(g, n, checkpoint.pin(g.vertices.select(col(ID), lit(1.0 / n).as(RANK))))
  }

  /** WARM-START power iteration from a prior rank vector — the
    * maintained-analytic face ([[graft.sources.GraphIO.refreshRanks]]):
    * after an append perturbs the graph, re-converging from the stored
    * ranks costs rounds ∝ the perturbation instead of a full cold
    * start. `initial` is (id, rank); vertices missing from it (newly
    * appended) seed at the uniform mass 1/N, then the whole vector is
    * renormalized to sum 1 — the PageRank fixpoint is the unique
    * stationary distribution of the damped walk, so the starting point
    * changes the ROUND COUNT, never the answer (within `tolerance`;
    * GraphAppendSpec pins warm ≡ cold). Rows in `initial` for vertices
    * no longer in the graph are ignored. */
  def runFrom(g: Graph, initial: DataFrame): DataFrame = {
    val n = g.vertices.count().toDouble
    val seeded = g.vertices.select(col(ID))
      .join(initial.select(col(ID), col(RANK).cast("double").as("_r0")),
        Seq(ID), "left")
      .select(col(ID), coalesce(col("_r0"), lit(1.0 / n)).as(RANK))
    val tot = seeded.agg(sum(col(RANK))).head().getDouble(0)
    require(tot > 0.0 && !tot.isNaN,
      s"runFrom needs an initial vector with positive total mass, got $tot")
    iterate(g, n,
      checkpoint.pin(seeded.select(col(ID), (col(RANK) / lit(tot)).as(RANK))))
  }

  private def iterate(g: Graph, n: Double, rank0: DataFrame): DataFrame = {
    val routes = pinStatic(this.routes(g))
    val teleport = (1.0 - damping) / n
    // LOOP-INVARIANT dangling set (OPTIMIZATION_r17): the vertices with
    // no out-edges never change, so compute the set once instead of a
    // routes.distinct + anti-join per round (guide §2.4). The per-round
    // scalar becomes one semi-join sum over the pinned rank.
    val dangling = pinStatic(g.vertices.select(col(ID))
      .join(routes.select(col(SRC).as(ID)).distinct(), Seq(ID), "left_anti"))
    // dangling mass: rank held by vertices with no out-edges. Running it
    // on the freshly pinned NEXT rank both materializes the lazy
    // checkpoint and yields the next round's scalar — ONE action per
    // round where the loop previously paid two (the dangling head() and
    // the materializing count()).
    def danglingMass(rank: DataFrame): Double = rank
      .join(dangling, Seq(ID), "left_semi")
      .agg(coalesce(sum(col(RANK)), lit(0.0))).head().getDouble(0)

    var rank = rank0
    var dMass = danglingMass(rank0)
    var i = 0
    var done = false
    while (i < maxIterations && !done) {
      val danglingShare = damping * dMass / n

      val contrib = rank
        .join(routes, rank(ID) === routes(SRC))
        .groupBy(col(DST).as(ID))
        .agg(sum(col(RANK) * col("_share")).as("_in"))
      val next = g.vertices.select(col(ID))
        .join(contrib, Seq(ID), "left")
        .select(col(ID),
          (lit(teleport + danglingShare) +
            lit(damping) * coalesce(col("_in"), lit(0.0))).as(RANK))
      val pinned = checkpoint.pin(next, eager = false)

      done = tolerance.exists { t =>
        val delta = pinned.join(rank.withColumnRenamed(RANK, "_prev"), Seq(ID))
          .agg(max(abs(col(RANK) - col("_prev")))).head().getDouble(0)
        delta < t
      }
      // ADVICE r17: the final round's dangling mass is discarded — skip
      // the scalar job there. The lazy checkpoint then materializes on
      // the caller's first action (or already did, in the tolerance
      // path's delta head()); no work is lost, one job per run is.
      if (!done && i + 1 < maxIterations)
        dMass = danglingMass(pinned) // materializes the lazy checkpoint too
      rank = pinned
      i += 1
    }
    lastIterations = i
    rank
  }

  /** Personalized PageRank: teleport (and dangling) mass returns to a
    * seed distribution instead of uniformly to all vertices — "importance
    * relative to THESE nodes", the standard recommendation / local-graph
    * relevance primitive. `reset` is (id, weight >= 0); weights are
    * normalized to sum 1, vertices absent from `reset` get weight 0 (and
    * can hold rank only through inbound links).
    *
    * Per round: rank := w * ((1-d) + d * danglingMass) + d * inbound —
    * the same one-join one-aggregation shape as [[run]] with the scalar
    * teleport replaced by the per-vertex `w` column. The seed vector is
    * joined once and checkpointed; rounds add no extra shuffle over the
    * uniform variant. Rank mass is conserved (sums to 1). */
  def runPersonalized(g: Graph, reset: DataFrame): DataFrame = {
    val routes = pinStatic(this.routes(g))

    val totRow = reset.agg(sum(col("weight").cast("double"))).head()
    require(!totRow.isNullAt(0) && totRow.getDouble(0) > 0.0,
      "personalized PageRank needs a reset set with positive total weight")
    val tot = totRow.getDouble(0)
    val w = pinStatic(g.vertices.select(col(ID))
      .join(reset.select(col(ID),
        (col("weight").cast("double") / tot).as("_w")), Seq(ID), "left")
      .select(col(ID), coalesce(col("_w"), lit(0.0)).as("_w")))

    // loop-invariant dangling set + one fused action per round, exactly
    // as in [[iterate]] (OPTIMIZATION_r17)
    val dangling = pinStatic(g.vertices.select(col(ID))
      .join(routes.select(col(SRC).as(ID)).distinct(), Seq(ID), "left_anti"))
    def danglingMass(rank: DataFrame): Double = rank
      .join(dangling, Seq(ID), "left_semi")
      .agg(coalesce(sum(col(RANK)), lit(0.0))).head().getDouble(0)

    var rank = checkpoint.pin(w.select(col(ID), col("_w").as(RANK)))
    var dMass = danglingMass(rank)
    var i = 0
    var done = false
    while (i < maxIterations && !done) {
      // scalar multiplier on the seed vector: teleport + returned
      // dangling mass, one driver double so every engine replays it
      val fac = (1.0 - damping) + damping * dMass

      val contrib = rank
        .join(routes, rank(ID) === routes(SRC))
        .groupBy(col(DST).as(ID))
        .agg(sum(col(RANK) * col("_share")).as("_in"))
      val next = w
        .join(contrib, Seq(ID), "left")
        .select(col(ID),
          (col("_w") * lit(fac) +
            lit(damping) * coalesce(col("_in"), lit(0.0))).as(RANK))
      val pinned = checkpoint.pin(next, eager = false)

      done = tolerance.exists { t =>
        val delta = pinned.join(rank.withColumnRenamed(RANK, "_prev"), Seq(ID))
          .agg(max(abs(col(RANK) - col("_prev")))).head().getDouble(0)
        delta < t
      }
      // ADVICE r17: skip the discarded final-round scalar (see iterate)
      if (!done && i + 1 < maxIterations)
        dMass = danglingMass(pinned) // materializes the lazy checkpoint too
      rank = pinned
      i += 1
    }
    rank
  }
}
