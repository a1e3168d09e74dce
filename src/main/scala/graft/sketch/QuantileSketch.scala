package graft.sketch

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Mergeable per-stratum QUANTILE sketch — the scale answer for
  * continuous-valued gates where [[graft.sample.Sampling.quantileThresholds]]'
  * exact distinct-(stratum, value) aggregation stops working: on a
  * perplexity / embedding-norm / quality score the distinct pairs ARE the
  * corpus, so the exact path shuffles everything and the gate needs a
  * bounded-state estimator instead (VERDICT r8 #2).
  *
  * Design: a deterministic bottom-k RANK SAMPLE in the [[Kmv]] house
  * style — every row hashes once with the portable 48-bit sha256-prefix
  * hash of (stratum, row id), each stratum keeps the k rows with the
  * smallest hashes (the same two-phase sharded top-k as KMV: 256 local
  * top-k's, then a final window over ≤ 256·k survivors), and the
  * q-quantile estimate is the ceil(q·m)-th smallest VALUE among the m ≤ k
  * sampled rows (exact when the stratum holds ≤ k rows — the sample is
  * then the stratum).
  *
  * Why not literal KLL compactors: KLL's level-compaction achieves
  * O(1/k) rank error where a uniform k-sample gives O(1/√k), but its
  * compaction sequence depends on the ORDER state was built in, so
  * (a) merge(sketch(A), sketch(B)) ≠ sketch(A ∪ B) bit for bit, and
  * (b) a SQL oracle cannot replay the sketch without simulating the
  * exact compaction schedule. The bottom-k sample is a pure function of
  * the input SET — `merge ≡ whole` holds EXACTLY (any global bottom-k
  * row is in its partition's bottom-k, so union-then-reselect loses
  * nothing), restart/recovery is trivially consistent, and DuckDB
  * replays the whole estimator with an ORDER BY h LIMIT k. For the gate
  * use-case the error trade is cheap to buy back: rank error at k=4096
  * is ~1.6% of the stratum — tighten with k, the state is per-stratum
  * and tiny either way. Same portability-over-constant-factor call as
  * [[Kmv]] vs HLL's xxhash registers ([[Hll]] documents the inverse
  * choice for throughput).
  */
object QuantileSketch {

  private val Shards = 256

  /** Default sample size per stratum: rank error ≈ 1/√k ≈ 1.6%. */
  val DefaultK = 4096

  /** Per-stratum sketch: `rows` holds the ≤ k sampled (stratum, h, id,
    * value) rows; `counts` the EXACT stratum sizes (count is combinable
    * and exact — only the value distribution is sampled). Both are lazy
    * plans; pin before iterating over them.
    */
  final case class Sketch(rows: DataFrame, counts: DataFrame, k: Int)

  private def bottomK(hashed: DataFrame, strataCol: String, k: Int): DataFrame = {
    val wShard = Window
      .partitionBy(col(strataCol), pmod(col("h"), lit(Shards.toLong)))
      .orderBy(col("h"), col("v"), col("rid"))
    val wFinal = Window.partitionBy(col(strataCol))
      .orderBy(col("h"), col("v"), col("rid"))
    hashed
      .withColumn("_srnk", row_number().over(wShard))
      .filter(col("_srnk") <= k)
      .withColumn("_rnk", row_number().over(wFinal))
      .filter(col("_rnk") <= k)
      .drop("_srnk", "_rnk")
  }

  /** Build the sketch: one corpus pass for the hash + the count, then
    * the two-phase bottom-k — no distinct-(stratum, value) aggregation
    * anywhere, so state is k rows per stratum regardless of how
    * continuous the value is.
    *
    * `idCol` must be row-unique within the stratum (the row identity the
    * sample is drawn over); the (h, value, id) ordering is total, so the
    * selected sample — and every estimate — is a pure function of the
    * input set, replayable by any engine with sha256.
    */
  def sketch(
      df: DataFrame, strataCol: String, idCol: String, valueCol: String,
      k: Int = DefaultK): Sketch = {
    require(k >= 1, s"k must be >= 1, got $k")
    val hashed = df.select(
      col(strataCol),
      Kmv.portableHash(
        concat(col(strataCol).cast("string"), lit("|"), col(idCol).cast("string")))
        .as("h"),
      col(idCol).cast("string").as("rid"),
      col(valueCol).cast("double").as("v"))
    Sketch(
      bottomK(hashed, strataCol, k),
      df.groupBy(col(strataCol)).agg(count(lit(1)).as("n")),
      k)
  }

  /** Merge sketches built over disjoint row sets (partitions of one
    * corpus, per-shard builds, a restart's old + new halves):
    * union-then-reselect. EXACTLY equals [[sketch]] over the union —
    * the property KllSpec-style compaction cannot give and this design
    * exists for.
    */
  def merge(strataCol: String, sketches: Sketch*): Sketch = {
    require(sketches.nonEmpty, "merge needs at least one sketch")
    val k = sketches.map(_.k).min
    val rows = sketches.map(_.rows).reduce(_.unionByName(_))
    val counts = sketches.map(_.counts).reduce(_.unionByName(_))
      .groupBy(col(strataCol)).agg(sum(col("n")).as("n"))
    Sketch(bottomK(rows, strataCol, k), counts, k)
  }

  /** Per-stratum q-quantile threshold estimate: the ceil(q·m)-th
    * smallest sampled value (m = sample size; exact when the stratum is
    * ≤ k rows). Output (strataCol, n, m, threshold) — `n` the exact
    * stratum size, `m` how many rows back the estimate.
    */
  def thresholds(sk: Sketch, strataCol: String, quantile: Double): DataFrame = {
    require(quantile > 0.0 && quantile < 1.0,
      s"quantile must be in (0,1), got $quantile")
    val w = Window.partitionBy(col(strataCol)).orderBy(col("v"), col("h"), col("rid"))
    val wAll = Window.partitionBy(col(strataCol))
    sk.rows
      .withColumn("_vrnk", row_number().over(w))
      .withColumn("m", count(lit(1)).over(wAll))
      // the rank cut is an IEEE double multiply + ceil; DuckDB's oracle
      // performs the IDENTICAL double op, so replay holds — do not
      // "simplify" either side independently (q*m landing a few ulps off
      // an exact integer flips the ceil on whichever side changed)
      .filter(col("_vrnk") ===
        greatest(lit(1L), ceil(lit(quantile) * col("m")).cast("long")))
      .join(sk.counts, Seq(strataCol))
      .select(col(strataCol), col("n"), col("m"), col("v").as("threshold"))
  }

  /** Keyed streaming state: exact row count + the bottom-k (h, id, v)
    * triples, h-ascending. */
  final case class QsState(n: Long, sample: Seq[(Long, String, Double)])
  /** Per-stratum estimate emitted each micro-batch. */
  final case class QsEstimate(group: String, n: Long, m: Long, threshold: Double)

  /** Streaming face (the [[Kmv.distinctEstimateStream]] shape): keyed
    * state holds each stratum's exact count and bottom-k sample; every
    * micro-batch emits the refreshed q-quantile (OutputMode.Update).
    * Because the state is a set-union-then-reselect merge, the estimate
    * after any batch split equals the batch [[sketch]]+[[thresholds]]
    * over the union — restart-recovery gives the same numbers, the
    * property the spec pins. State is O(k) per stratum forever.
    */
  def thresholdStream(
      df: DataFrame, groupCol: String, idCol: String, valueCol: String,
      quantile: Double, k: Int = DefaultK): Dataset[QsEstimate] = {
    require(quantile > 0.0 && quantile < 1.0,
      s"quantile must be in (0,1), got $quantile")
    require(k >= 1, s"k must be >= 1, got $k")
    import df.sparkSession.implicits._
    val hashed = df.select(
      col(groupCol).cast("string").as("g"),
      Kmv.portableHash(
        concat(col(groupCol).cast("string"), lit("|"), col(idCol).cast("string")))
        .as("h"),
      col(idCol).cast("string").as("rid"),
      col(valueCol).cast("double").as("v"))
      .as[(String, Long, String, Double)]
    hashed.groupByKey(_._1)
      .mapGroupsWithState[QsState, QsEstimate](GroupStateTimeout.NoTimeout()) {
        case (g, it, state: GroupState[QsState]) =>
          val prev = state.getOption.getOrElse(QsState(0L, Seq.empty))
          val batch = it.map(r => (r._2, r._3, r._4)).toSeq
          // at-least-once sources can redeliver a row id (overlapping
          // batches, replays): the bottom-k SAMPLE merges by distinct
          // (h, rid, v) so a redelivered id never holds two slots and
          // merge-equals-whole stays true for the selected set. `n`
          // counts DELIVERED rows (a redelivered id outside the k-sample
          // is indistinguishable with O(k) state) — exactly-once counting
          // needs the upstream streaming dedup stage keyed on the id.
          val sample = (prev.sample ++ batch).distinct
            .sortBy(t => (t._1, t._3, t._2)).take(k)
          val n = prev.n + batch.size
          state.update(QsState(n, sample))
          val m = sample.size
          val r = math.max(1L, math.ceil(quantile * m).toLong).toInt
          val sorted = sample.sortBy(t => (t._3, t._1, t._2))
          QsEstimate(g, n, m.toLong,
            if (m == 0) Double.NaN else sorted(r - 1)._3)
      }
  }
}
