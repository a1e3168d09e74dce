package graft.algorithms

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{CheckpointPolicy, Columns, Graph}

/** Distributed Louvain-style community refinement (the phase-1 local
  * move step of Blondel et al. 2008, "Fast unfolding of communities in
  * large networks") — modularity-GREEDY label updates, the quality-
  * objective community detector the library offers next to the purely
  * structural [[LabelPropagation]].
  *
  * Per round every eligible vertex v evaluates joining each community c
  * among its neighbors (or staying): the modularity gain of v→c is,
  * scaled by 2m to stay in EXACT integer arithmetic,
  *
  *   score(v, c) = 2m·l_vc − k_v · (tot(c) − [c = C(v)]·k_v)
  *
  * where l_vc = edges from v into c, k_v = degree, tot(c) = Σ degrees of
  * c's members, m = number of undirected edges. v adopts the argmax
  * (ties → smallest community id). Updates are SEMI-synchronous with
  * deterministic parity alternation — round r moves only vertices with
  * id % 2 = r % 2 — the standard distributed-Louvain device that
  * prevents the ping-pong oscillation a fully synchronous sweep
  * exhibits on symmetric structures, while keeping every round a pure
  * function of the previous labelling (no sequential vertex order, no
  * RNG), so a SQL oracle replays every round bit for bit.
  *
  * This is ONE level of the Louvain hierarchy: for the full coarsening
  * pipeline, run `refine`, contract each community to a supervertex
  * (one groupBy + a re-keyed edge aggregation) and refine again.
  *
  * Scale shape per round: one keyed join edges⋈labels, two combinable
  * aggregations (per-(vertex, community) link counts; per-community
  * degree totals — the latter broadcastable, its size is #communities),
  * and one argmax via min(struct) — no windows over the edge set, no
  * per-community reducers beyond the combinable sums. Integer guard:
  * 2m·l and k·tot stay inside i64 for any graph with m < ~2^31 edges
  * per... strictly, k_v·tot(c) < (2m)², so beyond ~2e9 edges the scores
  * need decimal — ANSI mode throws loudly rather than wrapping.
  */
object Louvain {
  import Columns._

  /** Output (id, community) after `rounds` semi-synchronous greedy
    * rounds from `init` (default: every vertex its own community).
    * `init` must be (id, community). */
  def refine(
      g: Graph, rounds: Int, init: Option[DataFrame] = None,
      checkpoint: CheckpointPolicy = CheckpointPolicy.Local): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val canon = checkpoint.pin(
      g.edges.filter(col(SRC) =!= col(DST))
        .select(least(col(SRC), col(DST)).as(SRC),
          greatest(col(SRC), col(DST)).as(DST))
        .distinct())
    val sym = checkpoint.pin(
      canon.unionByName(canon.select(col(DST).as(SRC), col(SRC).as(DST))))
    val deg = checkpoint.pin(
      sym.groupBy(col(SRC).as(ID)).agg(count(lit(1)).as("_k")))
    val m = canon.count()

    var comm = checkpoint.pin(init.getOrElse(
      g.vertices.select(col(ID), col(ID).as(COMMUNITY))))
    var r = 1
    while (r <= rounds) {
      val tot = comm.join(deg, Seq(ID), "left")
        .groupBy(col(COMMUNITY).as("_cu"))
        .agg(sum(coalesce(col("_k"), lit(0L))).as("_tot"))
      val links = sym
        .join(comm.select(col(ID).as(DST), col(COMMUNITY).as("_cu")), Seq(DST))
        .groupBy(col(SRC).as(ID), col("_cu"))
        .agg(count(lit(1)).as("_l"))
      // the stay-home candidate always exists, even for a vertex with no
      // edge into its own community (max keeps the real count when both
      // rows are present)
      val cands = links
        .unionByName(comm.select(col(ID), col(COMMUNITY).as("_cu"), lit(0L).as("_l")))
        .groupBy(col(ID), col("_cu")).agg(max(col("_l")).as("_l"))
      val scored = cands
        .join(comm, Seq(ID))
        .join(deg, Seq(ID), "left")
        .join(tot, Seq("_cu"), "left")
        .select(col(ID), col("_cu"), col(COMMUNITY),
          (lit(2L * m) * col("_l") -
            coalesce(col("_k"), lit(0L)) *
              (coalesce(col("_tot"), lit(0L)) -
                when(col("_cu") === col(COMMUNITY), coalesce(col("_k"), lit(0L)))
                  .otherwise(lit(0L)))).as("_score"))
      val best = scored
        .groupBy(col(ID))
        .agg(min(struct((-col("_score")).as("_n"), col("_cu").as("_c"))).as("_m"))
        .select(col(ID), col("_m").getField("_c").as("_best"))
      comm = checkpoint.pin(
        comm.join(best, Seq(ID), "left")
          .select(col(ID),
            when(pmod(col(ID), lit(2L)) === lit(r % 2),
              coalesce(col("_best"), col(COMMUNITY)))
              .otherwise(col(COMMUNITY)).as(COMMUNITY)))
      r += 1
    }
    comm
  }
}
