package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketch (Flajolet et al. 2007) built from
  * engine-portable primitives: the 48-bit sha256-prefix hash splits into
  * a `p`-bit bucket index and a `(48−p)`-bit suffix whose leading-zero
  * rank is derived from the suffix's binary-digit count — `conv(x,10,2)`
  * here, `bin(x)` in DuckDB — so registers, harmonic sum AND the raw
  * estimate reproduce bit for bit in any engine with sha256 and integer
  * division. (Production HLLs pack registers into bytes; a DataFrame of
  * `(group, bucket, r)` rows is the mergeable equivalent — at most
  * `m = 2^p` rows per group survive the map-side max, which is the same
  * fixed-size-per-group property that makes HLL the 100 TB cardinality
  * workhorse: one combinable groupBy, no distinct shuffle at all.)
  *
  * The harmonic sum Σ 2^(−M_j) is kept exact by scaling with
  * 2^Rmax (Rmax = 49−p, the max rank): each term 2^(Rmax−M_j) is an
  * integer, the group total is < m·2^Rmax = 2^(p+49−p) · … < 2^49, so it
  * is exact in i64 and in any double a SQL replay routes through. The
  * estimate α_m·m²·2^Rmax / S then needs one pinned multiply and one
  * division: m²·2^Rmax = 2^(p+49) is a power of two, hence an exact
  * double at every p.
  */
object Hll {

  private def mOf(p: Int) = 1 << p
  private def remBits(p: Int) = 48 - p
  private def rmax(p: Int) = 49 - p

  private def checkP(p: Int): Unit =
    require(p >= 2 && p <= 24, s"p must be in [2, 24], got $p")

  /** Mergeable register frame: (groupCols..., bucket, r) where r is the
    * max leading-zero rank observed in the bucket. Duplicates need no
    * pre-distinct — max is idempotent, so this is one map-side-combinable
    * aggregation over the raw rows.
    */
  def registers(
      df: DataFrame, groupCols: Seq[String], key: Column, p: Int): DataFrame = {
    checkP(p)
    val rb = remBits(p)
    val rem2 = math.pow(2, rb).toLong
    val h = Kmv.portableHash(key)
    val rem = h % rem2
    val rank = when(rem === 0L, lit(rb + 1))
      .otherwise(lit(rb + 1) - length(conv(rem, 10, 2)))
    val gs = groupCols.map(col)
    df.select(gs ++ Seq(
        shiftrightunsigned(h, rb).as("bucket"), rank.as("r")): _*)
      .groupBy(gs :+ col("bucket"): _*)
      .agg(max(col("r")).as("r"))
  }

  /** Merge register frames (max per bucket) — the sketch-union face; a
    * partitioned corpus builds per-partition registers and merges them
    * with this, never re-reading raw data.
    */
  def merge(regs: DataFrame, groupCols: Seq[String]): DataFrame =
    regs.groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(max(col("r")).as("r"))

  /** Raw HLL estimate per group from a register frame:
    * (groupCols..., n_zero, s_sum, est_raw, lc_range) where `s_sum` is
    * the 2^Rmax-scaled harmonic sum (exact i64), `est_raw` the raw
    * α_m·m²/Σ2^(−M_j) estimate rounded to 6, and `lc_range` flags the
    * small-cardinality zone (est ≤ 2.5m with empty buckets) where
    * [[estimateCorrected]]'s linear counting is the better number.
    */
  def estimate(regs: DataFrame, groupCols: Seq[String], p: Int): DataFrame = {
    checkP(p)
    val m = mOf(p)
    val gs = groupCols.map(col)
    val term = pow(lit(2.0), lit(rmax(p)) - col("r")).cast("long")
    val agg0 = regs.groupBy(gs: _*)
      .agg(sum(term).as("_sp"), count(lit(1)).as("_nb"))
    val nZero = (lit(m.toLong) - col("_nb")).as("n_zero")
    val sSum = (col("_sp") + (lit(m.toLong) - col("_nb")) *
      lit(math.pow(2, rmax(p)).toLong)).as("s_sum")
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))
    val estRaw = round(
      (alpha * lit(math.pow(2, p + 49))) / col("s_sum").cast("double"), 6)
    agg0.select(gs ++ Seq(nZero, sSum): _*)
      .withColumn("est_raw", estRaw)
      .withColumn("lc_range",
        col("est_raw") <= lit(2.5 * m) && col("n_zero") > 0L)
  }

  /** Estimate with the standard linear-counting correction applied in
    * the small range: m·ln(m/V) when est_raw ≤ 2.5m and V = n_zero > 0.
    * `ln` is transcendental — correct for production use, but NOT
    * bit-reproducible across engines, which is why the raw estimate is
    * the cross-engine-audited face and this one is tolerance-tested.
    */
  def estimateCorrected(regs: DataFrame, groupCols: Seq[String], p: Int): DataFrame = {
    val m = mOf(p)
    estimate(regs, groupCols, p).withColumn("est",
      when(col("lc_range"),
        lit(m.toDouble) * log(lit(m.toDouble) / col("n_zero")))
        .otherwise(col("est_raw")))
  }

  /** One-call build + estimate. */
  def distinctEstimate(
      df: DataFrame, groupCols: Seq[String], key: Column, p: Int): DataFrame =
    estimate(registers(df, groupCols, key, p), groupCols, p)

  /** Keyed streaming state: the register map (bucket -> max rank) —
    * at most m = 2^p entries per group, FOREVER. */
  final case class HllState(regs: Map[Int, Int])
  /** Per-group estimate emitted each micro-batch, the [[estimate]]
    * columns. */
  final case class HllEstimate(
      group: String, n_zero: Long, s_sum: Long, est_raw: Double)

  /** Streaming face (the [[Kmv.distinctEstimateStream]] shape): keyed
    * state holds each group's register map and every micro-batch emits
    * the refreshed raw estimate (OutputMode.Update). Register merge is
    * per-bucket max — idempotent and order-free — so the estimate after
    * any batch split equals the batch [[distinctEstimate]] over the
    * union, REDELIVERY INCLUDED (a replayed row maxes into the same
    * register): the at-least-once concern the KMV/quantile faces have
    * to dedup away simply does not exist for HLL. Bucket/rank
    * computation stays in the plan (codegen, the [[registers]]
    * expressions); only the O(2^p) merge runs in the state function.
    */
  def distinctEstimateStream(
      df: DataFrame, groupCol: String, key: Column, p: Int)
      : org.apache.spark.sql.Dataset[HllEstimate] = {
    checkP(p)
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    val rb = remBits(p)
    val m = mOf(p)
    val rmx = rmax(p)
    val rem2 = math.pow(2, rb).toLong
    val scale = math.pow(2, rmx).toLong
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val num = alpha * math.pow(2, p + 49) // same pinned constant as estimate()
    import df.sparkSession.implicits._
    val h = Kmv.portableHash(key)
    val rem = h % rem2
    val rank = when(rem === 0L, lit(rb + 1))
      .otherwise(lit(rb + 1) - length(conv(rem, 10, 2)))
    val hashed = df.select(
      col(groupCol).cast("string").as("g"),
      shiftrightunsigned(h, rb).cast("int").as("bucket"),
      rank.cast("int").as("r"))
      .as[(String, Int, Int)]
    hashed.groupByKey(_._1)
      .mapGroupsWithState[HllState, HllEstimate](GroupStateTimeout.NoTimeout()) {
        case (g, it, state: GroupState[HllState]) =>
          val merged = it.foldLeft(
            state.getOption.map(_.regs).getOrElse(Map.empty[Int, Int])) {
            case (acc, (_, b, r)) =>
              if (r > acc.getOrElse(b, 0)) acc.updated(b, r) else acc
          }
          state.update(HllState(merged))
          var sp = 0L
          merged.valuesIterator.foreach(r => sp += math.pow(2, rmx - r).toLong)
          val nb = merged.size
          val sSum = sp + (m - nb) * scale
          // BigDecimal.valueOf + HALF_UP mirrors Spark's round(x, 6)
          val est = java.math.BigDecimal.valueOf(num / sSum)
            .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
          HllEstimate(g, (m - nb).toLong, sSum, est)
      }
  }
}
