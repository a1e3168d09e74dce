package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sketch.Hll

/** Streaming graph metrics over an edge stream — the monitoring twin of
  * the persisted-graph append lifecycle
  * ([[graft.sources.GraphIO.appendEdgesStream]]): while micro-batches of
  * edges fold into the bucketed tables, the SAME unbounded stream can
  * feed a live per-vertex distinct-neighbor sketch, with one transform
  * definition shared by the batch backfill and the live pipeline (the
  * reference is batch-only — SURVEY.md §1.2 — so this whole face is a
  * north-star extension, the `EventStream.trendingCounts` pattern
  * applied to a graph statistic).
  *
  * Distinct-NEIGHBOR count (not raw degree) is the metric of choice on
  * an unbounded edge stream precisely because of the sketch algebra:
  * HLL register merge is an idempotent, order-free per-bucket max, so
  * multi-edges, micro-batch boundaries and at-least-once REDELIVERY all
  * leave the estimate untouched — no dedup state, no watermark, and the
  * keyed state is O(2^p) per vertex FOREVER (p=4 → 16 registers). A raw
  * degree counter has none of those properties (every replayed batch
  * would double-count), which is why the append lifecycle keeps exact
  * degrees TABLE-side (`GraphIO.appendEdges` maintains them
  * idempotently through the stored edge_id anti-join) while the
  * stream-side live metric is the sketch.
  *
  * Scale notes: the bucket/rank expressions stay in the plan (codegen,
  * [[Hll.registers]]'s expressions); the shuffle is one hash partition
  * on vertex id; state per vertex is fixed-size. At 100 TB the batch
  * face is one map-side-combinable aggregation — never a
  * distinct-neighbors pre-shuffle.
  */
object GraphStream {

  /** Batch face: per-vertex distinct-out-neighbor HLL estimate over an
    * edge frame — `(id, n_zero, s_sum, est_raw, lc_range)`, the
    * [[Hll.estimate]] columns keyed by the (long) vertex id. The
    * cross-engine-audited face: hash, registers, harmonic sum and raw
    * estimate replay bit for bit in DuckDB (g57's oracle).
    */
  def neighborSketch(
      edges: DataFrame, p: Int = 4, undirected: Boolean = false): DataFrame = {
    val e = if (undirected) symmetrized(edges) else edges
    Hll.distinctEstimate(e, Seq("src"), col("dst"), p)
      .withColumnRenamed("src", "id")
  }

  /** Streaming face: the same estimate continuously refreshed from an
    * unbounded edge stream (OutputMode.Update) — `(id, n_zero, s_sum,
    * est_raw)` with `id` STRINGIFIED (the keyed-state group key; cast
    * back if the sink needs the numeric id). After any micro-batch
    * split, replay included, the latest row per vertex equals
    * [[neighborSketch]] over the union of everything delivered —
    * StreamingSpec pins the equivalence bit for bit.
    */
  def neighborSketchStream(
      edges: DataFrame, p: Int = 4, undirected: Boolean = false): DataFrame = {
    val e = if (undirected) symmetrized(edges) else edges
    Hll.distinctEstimateStream(e, "src", col("dst"), p)
      .toDF().withColumnRenamed("group", "id")
  }

  /** Both directions of each edge — works on batch and streaming frames
    * (a union of two projections of the same stream is append-safe). */
  private def symmetrized(edges: DataFrame): DataFrame =
    edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
}
