package graft.algorithms

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact two-feature ridge regression by NORMAL EQUATIONS — the
  * supervised-calibration primitive (t15 uses it to fit a cheap token
  * estimator against exact BPE counts): y ≈ b0 + b1·x1 + b2·x2 with an
  * integer penalty λ on the slope diagonal.
  *
  * The whole fit is ONE map-side-combinable aggregation: the nine
  * normal-equation moments (n, Σx1, Σx2, Σx1², Σx1x2, Σx2², Σy, Σx1y,
  * Σx2y) are plain sums — the same observation that bounded
  * [[Als]]'s solve memory — so the corpus is scanned once and nothing
  * larger than one 9-column row ever moves. The 3×3 solve is Cramer's
  * rule evaluated IN THE PLAN on decimal(38,0) arithmetic: the four
  * determinants are cofactor expansions of the moment row, broadcast
  * back as a single row, and every prediction is one integral division
  * — `(1000·(det0 + det1·x1 + det2·x2)) div det` — so the fitted line
  * replays bit for bit in any engine with 128-bit integers (DuckDB
  * HUGEINT; Spark `div` and DuckDB `//` both truncate toward zero, the
  * g52/g53 convention). No driver action anywhere: the moments row
  * stays a 1-row DataFrame.
  *
  * Exactness: an exact-fit corpus (integer betas, λ=0) predicts
  * pred_milli = 1000·y exactly — the numerator is det·(b0+b1x1+b2x2)
  * and the division cancels. Under λ>0 the shrunk solution is the
  * exact rational Cramer quotient, truncated at milli precision.
  *
  * Overflow headroom (ANSI throws, never wraps — a structural guard,
  * the g55 convention, at BOTH stages: the nine moments accumulate as
  * i64 sums BEFORE the decimal cast, and the Cramer products run in
  * decimal(38,0)). The binding bound is the prediction numerator
  * |1000·det_i·x|: determinants are cubic in the moments and moments
  * linear in corpus size n, so with text-statistic features
  * (x1 ≲ 10^3 tokens, x2 ≲ 10^4 chars) the numerator is ~n³·10^21 —
  * inside 10^38 for n up to roughly 5·10^5 documents, and the i64
  * moment sums themselves bound n ≲ 10^10 at these magnitudes. Past
  * the decimal envelope, fit the moments on a deterministic hash
  * sample ([[graft.sample.Sampling.idHash]]) — the betas are corpus
  * statistics, not per-row state, and a 10^5-doc sample pins them far
  * tighter than milli precision.
  *
  * Output: the input frame + `pred_milli` (1000× the fitted value,
  * truncated integer).
  */
object Ridge {

  def fitPredict(
      df: DataFrame, x1Col: String, x2Col: String, yCol: String,
      lambda: Long = 1L): DataFrame = {
    require(lambda >= 0L, s"lambda must be >= 0, got $lambda")
    val dec = "decimal(38,0)"
    val x1 = col(x1Col).cast("long")
    val x2 = col(x2Col).cast("long")
    val y = col(yCol).cast("long")
    val m = df.agg(
      count(lit(1)).cast(dec).as("n"),
      sum(x1).cast(dec).as("s1"),
      sum(x2).cast(dec).as("s2"),
      (sum(x1 * x1) + lit(lambda)).cast(dec).as("a"),
      sum(x1 * x2).cast(dec).as("s12"),
      (sum(x2 * x2) + lit(lambda)).cast(dec).as("b"),
      sum(y).cast(dec).as("sy"),
      sum(x1 * y).cast(dec).as("s1y"),
      sum(x2 * y).cast(dec).as("s2y"))
    // Cramer cofactor expansions of M = [[n,s1,s2],[s1,a,s12],[s2,s12,b]]
    // against rhs (sy, s1y, s2y); det > 0 for any non-degenerate corpus
    // (M is positive definite once two docs differ in a feature).
    val dets = m.select(
      expr("n*(a*b - s12*s12) - s1*(s1*b - s12*s2) + s2*(s1*s12 - a*s2)")
        .as("det"),
      expr("sy*(a*b - s12*s12) - s1*(s1y*b - s12*s2y) + s2*(s1y*s12 - a*s2y)")
        .as("det0"),
      expr("n*(s1y*b - s12*s2y) - sy*(s1*b - s12*s2) + s2*(s1*s2y - s1y*s2)")
        .as("det1"),
      expr("n*(a*s2y - s12*s1y) - s1*(s1*s2y - s1y*s2) + sy*(s1*s12 - a*s2)")
        .as("det2"))
    df.crossJoin(broadcast(dets))
      .withColumn("pred_milli",
        expr(s"CAST((1000 * (det0 + det1*`$x1Col` + det2*`$x2Col`)) div det" +
          " AS BIGINT)"))
      .drop("det", "det0", "det1", "det2")
  }
}
