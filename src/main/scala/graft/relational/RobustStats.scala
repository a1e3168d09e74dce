package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sample.Sampling

/** Robust per-stratum outlier detection by MEDIAN / MAD — the
  * data-cleaning gate that mean/stddev z-scores cannot be: one wild
  * value drags a mean-based gate toward itself (masking), while the
  * median and the median absolute deviation have a 50% breakdown
  * point, so the gate stays put no matter how extreme the outliers
  * are. The rule is the standard `|x − med| > k·MAD` (k = 3 the
  * textbook default).
  *
  * EXACT, not sketched, yet never sorts the corpus: both medians come
  * from [[Sampling.quantileThresholds]] — running counts over DISTINCT
  * (stratum, value) pairs, the corpus itself touched only by
  * combinable groupBys — applied twice (once to the value, once to the
  * absolute deviations from the stratum median). Every number is either
  * a data value (the lower median IS an input value, no interpolation)
  * or one IEEE-754 subtraction/abs/multiply in fixed order, so any
  * engine replays the gate bit for bit.
  *
  * Scale shape: two corpus passes (value median, deviation median) plus
  * one gating pass; the per-stratum median frames are dimension-sized
  * and broadcast. For bucketed/rounded value columns the distinct-pair
  * frames are far smaller than the corpus (the quantileThresholds
  * argument).
  *
  * Output: one row per stratum — (strataCol, med, mad, n, n_outliers).
  */
object RobustStats {

  def madOutliers(
      df: DataFrame, strataCol: String, valueCol: String,
      k: Double = 3.0): DataFrame = {
    require(k > 0.0, s"k must be > 0, got $k")
    val med = Sampling.quantileThresholds(df, strataCol, valueCol, 0.5)
      .withColumnRenamed("threshold", "med")
    val withDev = df.join(broadcast(med), Seq(strataCol))
      .withColumn("_dev", abs(col(valueCol) - col("med")))
    val mad = Sampling.quantileThresholds(withDev, strataCol, "_dev", 0.5)
      .withColumnRenamed("threshold", "mad")
    withDev.join(broadcast(mad), Seq(strataCol))
      .groupBy(col(strataCol))
      .agg(
        min(col("med")).as("med"), // per-stratum constant; min = the value
        min(col("mad")).as("mad"),
        count(lit(1)).as("n"),
        sum(when(col("_dev") > lit(k) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"))
  }
}
