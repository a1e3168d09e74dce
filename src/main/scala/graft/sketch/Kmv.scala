package graft.sketch

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** K-Minimum-Values distinct-count sketch (Bar-Yossef et al. 2002), the
  * mergeable cardinality estimator behind theta sketches: hash every key
  * into [0, 1), keep the k smallest distinct hashes, estimate
  * |distinct| ≈ (k−1) / h_k. Unlike HyperLogLog implementations the
  * whole computation is engine-portable — the hash is a sha256 prefix
  * and the estimator one correctly-rounded division — so another system
  * (or a SQL oracle) reproduces the estimate BIT FOR BIT, which is the
  * property that makes sketch results auditable across a pipeline.
  *
  * Scale shape (100 TB): per-key hashes reduce through one
  * map-side-combinable distinct, then the k smallest per group are found
  * with the two-phase sharded top-k (each of 256 hash-shards keeps a
  * local top-k — a shard's top-k is a superset of its members of the
  * global top-k — and a final window ranks ≤ 256·k survivors). No group
  * ever serializes through a single reducer, the classic failure of a
  * naive `ORDER BY LIMIT k` per group.
  */
object Kmv {

  private val Shards = 256
  /** Hashes are 48-bit (12 hex chars): every intermediate — digit
    * decodes, (k−1)·2^48 — stays exact in i64 AND in the doubles a SQL
    * replay may route through (< 2^53). */
  private val HashSpace = 281474976710656L // 2^48

  /** 48-bit sha256-prefix hash of `key`, as a LONG in [0, 2^48). */
  def portableHash(key: Column): Column =
    conv(substring(sha2(key.cast("string"), 256), 1, 12), 16, 10).cast("long")

  /** Per-group KMV estimate. Output: (groupCols..., n_kept, kth_hash,
    * est_distinct) where est = (k−1)·2^48 / h_k rounded to 6, or the
    * exact count when the group holds fewer than k distinct keys (the
    * sketch is not full — standard KMV exact fallback).
    */
  def distinctEstimate(
      df: DataFrame, groupCols: Seq[String], key: Column, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val gs = groupCols.map(col)
    val hashed = df.select(gs :+ portableHash(key).as("h"): _*).distinct()
    val wShard = Window.partitionBy(gs :+ pmod(col("h"), lit(Shards.toLong)): _*)
      .orderBy(col("h"))
    val wFinal = Window.partitionBy(gs: _*).orderBy(col("h"))
    val kept = hashed
      .withColumn("_srnk", row_number().over(wShard))
      .filter(col("_srnk") <= k)
      .withColumn("_rnk", row_number().over(wFinal))
      .filter(col("_rnk") <= k)
    kept.groupBy(gs: _*)
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("kth_hash"))
      .select(gs ++ Seq(
        col("n_kept"),
        col("kth_hash"),
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(round(
            lit((k - 1L) * HashSpace).cast("double") / col("kth_hash").cast("double"),
            6))
          .as("est_distinct")): _*)
  }

  /** Keyed sketch state: the ≤ k smallest distinct hashes, ascending. */
  final case class KmvState(hashes: Seq[Long])
  /** Per-group estimate emitted each micro-batch. */
  final case class KmvEstimate(group: String, n_kept: Long, kth_hash: Long,
      est_distinct: Double)

  /** Streaming face of the same sketch: keyed state holds each group's k
    * smallest distinct hashes and every micro-batch emits the group's
    * refreshed estimate (use OutputMode.Update). Because KMV state is a
    * MERGE (set-union then take-k) the streaming result after any batch
    * split equals [[distinctEstimate]] over the union of the batches —
    * the mergeability property that makes the sketch exactly-restateable
    * from a checkpoint, and the property the spec pins.
    *
    * State is O(k) per group forever — the unbounded-distinct-count
    * problem (true distinct state grows with the stream) reduced to a
    * constant, which is the reason to run a sketch on a stream at all.
    */
  def distinctEstimateStream(
      df: DataFrame, groupCol: String, key: Column, k: Int): Dataset[KmvEstimate] = {
    require(k >= 2, s"k must be >= 2, got $k")
    import df.sparkSession.implicits._
    val hashed = df
      .select(col(groupCol).cast("string").as("g"), portableHash(key).as("h"))
      .as[(String, Long)]
    hashed.groupByKey(_._1)
      .mapGroupsWithState[KmvState, KmvEstimate](GroupStateTimeout.NoTimeout()) {
        case (g, it, state: GroupState[KmvState]) =>
          val merged = (state.getOption.map(_.hashes).getOrElse(Seq.empty) ++
            it.map(_._2)).distinct.sorted.take(k)
          state.update(KmvState(merged))
          val n = merged.size
          val est =
            if (n < k) n.toDouble
            else BigDecimal((k - 1L) * HashSpace.toDouble / merged.last)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          KmvEstimate(g, n.toLong, if (n == 0) 0L else merged.last, est)
      }
  }
}
