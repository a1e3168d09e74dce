package graft.algorithms

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.core.CheckpointPolicy

/** Alternating Least Squares matrix factorization over a bipartite
  * interaction graph — the classic graph→embedding trainer
  * (Koren/Bell/Volinsky 2009; Hu/Koren/Volinsky 2008 for the implicit
  * case), and the one ❌ row left in the reference's own aspiration
  * matrix (`/root/reference/README.md:33` lists SVDPlusPlus as
  * unimplemented there and in GraphFrames/GraphX).
  *
  * Two faces, one join shape:
  *
  *  - [[fit]] — the real rank-k blocked solver: each half-iteration
  *    joins ratings with the fixed side's factors (keyed equi-join),
  *    groups by the solved side's id, and solves that row's k×k normal
  *    equations (AᵀA + λI) x = Aᵀr in-JVM per group (Cholesky, k ≤ 32)
  *    — the standard distributed-ALS shape: no factor matrix is ever
  *    materialized driver-side, each group's solve sees only its own
  *    rated items. Float iteration ⇒ results are deterministic within
  *    one engine but NOT bit-replayable across engines (summation order
  *    inside a group is pinned by sorting, but lapack-free Cholesky
  *    differs from any SQL restatement), so this face is spec-verified
  *    (reconstruction error, convergence), not oracle-verified.
  *
  *  - [[fitRank1Exact]] — the deterministic cross-engine face: rank-1
  *    ALS in the library's exact scaled-integer style (the g50 GNN
  *    device — factors are S-scaled i64, every update one combinable
  *    integer sum + one integer division), which a SQL oracle replays
  *    bit for bit. Rank 1 makes the normal equation scalar:
  *    u = S·Σ_j y_j r_uj div (λS + Σ_j y_j² div S). Overflow headroom:
  *    with S = 10⁴, ratings ≤ 10³ and degrees ≤ 10⁴ every intermediate
  *    stays < 2⁶³ (ANSI mode throws loudly past that rather than
  *    wrapping).
  */
object Als {

  /** Scaled-integer rank-1 ALS. `ratings` is (user, item, rating) with
    * integer ratings; output one row per id per side:
    * (id, side ∈ {user, item}, factor) where factor is the S-scaled
    * integer factor after `iterations` full (user-then-item)
    * alternations from y₀ = S (all-ones item factors).
    */
  def fitRank1Exact(
      ratings: DataFrame,
      iterations: Int = 2,
      lambda: Long = 1L,
      scale: Long = 10000L,
      checkpoint: CheckpointPolicy = CheckpointPolicy.Local): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(scale >= 1L && lambda >= 0L, "scale >= 1 and lambda >= 0")
    val r = checkpoint.pin(ratings.select(
      col("user"), col("item"), col("rating").cast("long").as("r")))
    val S = scale
    val lamS = lambda * S

    def halfStep(fixed: DataFrame, fixedKey: String, solveKey: String): DataFrame =
      r.join(fixed.withColumnRenamed("id", fixedKey), Seq(fixedKey))
        .groupBy(col(solveKey).as("id"))
        .agg(
          sum(col("f") * col("r")).as("_num"),
          sum(expr("f * f div " + S)).as("_den"))
        // `div` (integral divide), not `/`: float division + cast loses
        // exactness past 2^53. Both Spark `div` and DuckDB `//` truncate
        // toward zero (moot here — every operand is positive, see
        // biasBaselineExact for the signed case)
        .select(col("id"),
          expr(s"($S * _num) div ($lamS + _den)").as("f"))

    var items = checkpoint.pin(
      r.select(col("item").as("id")).distinct().withColumn("f", lit(S)))
    var users: DataFrame = null
    var i = 0
    while (i < iterations) {
      users = checkpoint.pin(halfStep(items, "item", "user"))
      items = checkpoint.pin(halfStep(users, "user", "item"))
      i += 1
    }
    users.select(col("id"), lit("user").as("side"), col("f").as("factor"))
      .unionByName(
        items.select(col("id"), lit("item").as("side"), col("f").as("factor")))
  }

  /** Alternating BIAS-baseline fit (the classic "Netflix baseline"
    * predictor, Koren 2009 §2: r̂ = μ + b_u + b_i) in the same exact
    * scaled-integer style as [[fitRank1Exact]]: μ is the S-scaled global
    * mean, and each alternation recomputes one side's bias as the
    * shrunk residual mean, b = Σ(S·r − μ − b_other) div (λ + n) — one
    * keyed join + one combinable sum per half-step, truncating integral
    * division on BOTH engines (Spark `div` and DuckDB `//` both
    * truncate toward zero, negatives included), so a SQL oracle replays
    * every round. The bias baseline is the standard first stage before
    * factor models — it absorbs user/item popularity so factors learn
    * interactions, and on its own it is the cheapest useful recommender.
    *
    * Output: (id, side ∈ {user, item}, bias) — S-scaled; the global μ
    * rides as one extra row (id = -1, side = "global").
    */
  def biasBaselineExact(
      ratings: DataFrame,
      rounds: Int = 2,
      lambda: Long = 5L,
      scale: Long = 10000L,
      checkpoint: CheckpointPolicy = CheckpointPolicy.Local): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(scale >= 1L && lambda >= 0L, "scale >= 1 and lambda >= 0")
    val r = checkpoint.pin(ratings.select(
      col("user"), col("item"), col("rating").cast("long").as("r")))
    val gRow = r.agg(sum(col("r")), count(lit(1))).head()
    require(gRow.getLong(1) > 0L, "bias baseline needs at least one rating")
    val mu = scale * gRow.getLong(0) / gRow.getLong(1)

    def halfStep(other: DataFrame, otherKey: String, solveKey: String): DataFrame =
      r.join(other.select(col("id").as(otherKey), col("b").as("_bo")), Seq(otherKey))
        .groupBy(col(solveKey).as("id"))
        .agg(
          sum(lit(scale) * col("r") - lit(mu) - col("_bo")).as("_s"),
          count(lit(1)).as("_n"))
        .select(col("id"), expr(s"_s div ($lambda + _n)").as("b"))

    var bi = checkpoint.pin(
      r.select(col("item").as("id")).distinct().withColumn("b", lit(0L)))
    var bu: DataFrame = null
    var i = 0
    while (i < rounds) {
      bu = checkpoint.pin(halfStep(bi, "item", "user"))
      bi = checkpoint.pin(halfStep(bu, "user", "item"))
      i += 1
    }
    val spark = ratings.sparkSession
    import spark.implicits._
    bu.select(col("id"), lit("user").as("side"), col("b").as("bias"))
      .unionByName(
        bi.select(col("id"), lit("item").as("side"), col("b").as("bias")))
      .unionByName(Seq((-1L, "global", mu)).toDF("id", "side", "bias"))
  }

  /** Full SVD++-style predictor in the exact scaled-integer style —
    * the reference's one ❌ row (`/root/reference/README.md:33`,
    * SVDPlusPlus) closed as ONE predictor rather than by its halves:
    *
    *   r̂ = μ + b_u + b_i + (q_i · (p_u + imp_u) div S) · residUnit div S
    *   imp_u = (Σ_{j∈N(u)} q_j) div |N(u)|
    *
    * — biases from [[biasBaselineExact]], rank-1 factors from
    * [[fitRank1Exact]] trained on the S-scaled BIAS RESIDUALS
    * S·r − μ − b_u − b_i (the SVD++ structure: factors model what the
    * biases could not, never the raw rating — training them on raw
    * ratings would double-count the additive signal), plus the SVD++
    * implicit-feedback term: the sum of rated-item factors, ONE extra
    * combinable sum per user (Koren, KDD'08 §4; the exact face
    * normalizes by n rather than n^(-1/2) — the "asymmetric" variant —
    * because 1/n is an integral division while √n is irrational, and
    * the whole point of this face is bit-for-bit SQL replay). The
    * residual-valued term is p·q div S² because both factors are
    * S-scaled encodings of real values p/S, q/S. Every term is an i64;
    * `div` truncation matches DuckDB `//` on both signs (the
    * g53-adjudicated device — residuals DO go negative).
    *
    * Integer headroom is a CONTRACT, not luck: the residuals handed to
    * the rank-1 solver are re-expressed in `residUnit`-scaled units
    * (default S/100 — centi-rating residuals), because feeding the raw
    * S-scaled residual makes the first user factor u ≈ S·resid and the
    * very next half-step's Σ(u² div S) overflows i64 once ratings reach
    * interaction-count magnitudes (found at the 100x stress corpus,
    * where counts grow with replication). With residuals bounded by R
    * in centi-units and degrees by n, every solver intermediate is
    * ≤ S²·n·R² — callers keep R bounded (saturate interaction counts;
    * real ratings are bounded by construction) and the model is safe at
    * ANY corpus scale, because corpus growth raises n linearly but R
    * not at all.
    *
    * Output: one row per RATING, (user, item, rating, r_hat) with r_hat
    * S-scaled — the training-residual view every downstream evaluation
    * consumes. Plan shape: two keyed joins per model term over the
    * ratings, all aggregations combinable; nothing is quadratic and no
    * factor matrix ever leaves the cluster.
    */
  def svdppExact(
      ratings: DataFrame,
      biasRounds: Int = 2,
      iterations: Int = 2,
      lambdaBias: Long = 5L,
      lambdaFactor: Long = 1L,
      scale: Long = 10000L,
      residUnit: Long = 100L,
      checkpoint: CheckpointPolicy = CheckpointPolicy.Local): DataFrame = {
    require(residUnit >= 1L && scale % residUnit == 0L,
      "residUnit must divide scale")
    val r = checkpoint.pin(ratings.select(
      col("user"), col("item"), col("rating").cast("long").as("r")))
    val biases = biasBaselineExact(ratings, biasRounds, lambdaBias, scale, checkpoint)
    val mu = biases.filter(col("side") === "global").head().getAs[Long]("bias")
    val bu = biases.filter(col("side") === "user")
      .select(col("id").as("user"), col("bias").as("_bu"))
    val bi = biases.filter(col("side") === "item")
      .select(col("id").as("item"), col("bias").as("_bi"))
    val withBias = checkpoint.pin(r.join(bu, Seq("user")).join(bi, Seq("item")))
    val resid = withBias.select(col("user"), col("item"),
      expr(s"($scale * r - $mu - _bu - _bi) div $residUnit").as("rating"))
    val factors = fitRank1Exact(resid, iterations, lambdaFactor, scale, checkpoint)
    val pu = factors.filter(col("side") === "user")
      .select(col("id").as("user"), col("factor").as("_pu"))
    val qi = factors.filter(col("side") === "item")
      .select(col("id").as("item"), col("factor").as("_qi"))
    val imp = r.join(qi, Seq("item"))
      .groupBy(col("user"))
      .agg(expr("sum(_qi) div count(1)").as("_imp"))
    withBias
      .join(pu, Seq("user")).join(qi, Seq("item")).join(imp, Seq("user"))
      .select(
        col("user"), col("item"), col("r").as("rating"),
        expr(s"$mu + _bu + _bi + ((((_pu + _imp) * _qi) div $scale)" +
          s" * $residUnit) div $scale")
          .as("r_hat"))
  }

  final case class Factor(id: Long, vec: Array[Double])

  /** Rank-k blocked ALS (explicit ratings, L2 regularization). Each
    * half-iteration: one keyed join (ratings ⋈ fixed factors), then the
    * normal-equation MOMENTS — the k(k+1)/2 upper-triangle AᵀA terms,
    * the k Aᵀb terms and the rating count, all PLAIN SUMS over that
    * row's ratings — accumulated with a combinable typed `Aggregator`
    * (map-side partial aggregation, mergeable buffers), and only the
    * k×k Cholesky runs per id on the finished O(k²) buffer. No task
    * ever materializes a group's rating list: a 10⁸-rating hub item
    * costs the same fixed k(k+3)/2+1 doubles of state as a degree-2
    * item (it previously held the whole group on one heap — the scale
    * hazard this shape removes). Floating-point accumulation order
    * follows the partial-aggregation merge tree, so results are
    * deterministic up to float summation order — the spec verifies fit
    * quality (MSE convergence), not bitwise replay; the bit-exact
    * cross-engine faces are [[fitRank1Exact]]/[[biasBaselineExact]].
    * Returns (userFactors, itemFactors).
    */
  def fit(
      ratings: DataFrame,
      k: Int,
      iterations: Int = 5,
      lambda: Double = 0.1,
      checkpoint: CheckpointPolicy = CheckpointPolicy.Local)
      : (Dataset[Factor], Dataset[Factor]) = {
    require(k >= 1 && k <= 32, s"k must be in [1, 32], got $k")
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val spark = ratings.sparkSession
    import spark.implicits._
    val r = checkpoint.pin(ratings.select(
      col("user").cast("long"), col("item").cast("long"),
      col("rating").cast("double").as("r")))

    // deterministic init: unit-norm-ish vectors from the portable hash,
    // so runs are reproducible without an RNG
    def init(side: String): Dataset[Factor] =
      r.select(col(side).as("id")).distinct()
        .select(col("id"),
          transform(sequence(lit(0), lit(k - 1)),
            j => (pmod(graft.sketch.Kmv.portableHash(
              concat(col("id").cast("string"), lit("|"), j.cast("string"))),
              lit(1000L)).cast("double") + lit(1.0)) / lit(1000.0)).as("vec"))
        .as[Factor]

    val momentAgg = new MomentAggregator(k)
    def solveSide(
        fixed: Dataset[Factor], fixedKey: String, solveKey: String): Dataset[Factor] = {
      val joined = r
        .join(fixed.toDF().withColumnRenamed("id", fixedKey), Seq(fixedKey))
        .select(col(solveKey).as("id"), col("r"), col("vec"))
        .as[(Long, Double, Array[Double])]
      joined.groupByKey(_._1)
        .agg(momentAgg.toColumn)
        .map { case (id, m) =>
          // m = [n, Aᵀb(0..k-1), upper-tri AᵀA]: expand the triangle,
          // shrink the diagonal by λ·n, solve k×k
          val n = m(0)
          val atb = java.util.Arrays.copyOfRange(m, 1, 1 + k)
          val ata = Array.ofDim[Double](k, k)
          var t = 1 + k
          var a = 0
          while (a < k) {
            var b = a
            while (b < k) {
              ata(a)(b) = m(t); ata(b)(a) = m(t); t += 1; b += 1
            }
            a += 1
          }
          var d = 0
          while (d < k) { ata(d)(d) += lambda * n; d += 1 }
          Factor(id, choleskySolve(ata, atb, k))
        }
    }

    var items = checkpoint.pin(init("item").toDF()).as[Factor]
    var users: Dataset[Factor] = null
    var i = 0
    while (i < iterations) {
      users = checkpoint.pin(solveSide(items, "item", "user").toDF()).as[Factor]
      items = checkpoint.pin(solveSide(users, "user", "item").toDF()).as[Factor]
      i += 1
    }
    (users, items)
  }

  /** Mean squared reconstruction error of (user, item, rating) under the
    * factor pair — the fit-quality scalar AlsSpec converges on. */
  def mse(
      ratings: DataFrame,
      users: Dataset[Factor], items: Dataset[Factor]): Double = {
    val dot = (a: Column, b: Column) =>
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    ratings.select(col("user"), col("item"), col("rating").cast("double").as("r"))
      .join(users.toDF().select(col("id").as("user"), col("vec").as("_u")), Seq("user"))
      .join(items.toDF().select(col("id").as("item"), col("vec").as("_i")), Seq("item"))
      .select(pow(col("r") - dot(col("_u"), col("_i")), 2).as("_e"))
      .agg(avg(col("_e"))).head().getDouble(0)
  }

  /** Combinable normal-equation moment accumulator for one ALS solve
    * side. Buffer layout (fixed size k(k+3)/2 + 1 doubles, independent
    * of group degree): [n, Aᵀb(0..k-1), row-major upper triangle of
    * AᵀA]. `reduce` folds one rating row in-place; `merge` is
    * element-wise addition — both decomposable, so Spark runs map-side
    * partial aggregation and NO task ever holds a group's rating list.
    */
  private final class MomentAggregator(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        (Long, Double, Array[Double]), Array[Double], Array[Double]] {
    private val len = 1 + k + k * (k + 1) / 2
    override def zero: Array[Double] = new Array[Double](len)
    override def reduce(buf: Array[Double], row: (Long, Double, Array[Double]))
        : Array[Double] = {
      val rv = row._2
      val v = row._3
      buf(0) += 1.0
      var t = 1 + k
      var a = 0
      while (a < k) {
        buf(1 + a) += v(a) * rv
        var b = a
        while (b < k) { buf(t) += v(a) * v(b); t += 1; b += 1 }
        a += 1
      }
      buf
    }
    override def merge(x: Array[Double], y: Array[Double]): Array[Double] = {
      var i = 0
      while (i < len) { x(i) += y(i); i += 1 }
      x
    }
    override def finish(buf: Array[Double]): Array[Double] = buf
    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  }

  /** In-place Cholesky solve of Ax = b for SPD A (k ≤ 32). */
  private def choleskySolve(a: Array[Array[Double]], b: Array[Double], k: Int)
      : Array[Double] = {
    val l = Array.ofDim[Double](k, k)
    var i = 0
    while (i < k) {
      var j = 0
      while (j <= i) {
        var s = a(i)(j)
        var m = 0
        while (m < j) { s -= l(i)(m) * l(j)(m); m += 1 }
        if (i == j) l(i)(i) = math.sqrt(math.max(s, 1e-12))
        else l(i)(j) = s / l(j)(j)
        j += 1
      }
      i += 1
    }
    // forward substitution L y = b
    val y = new Array[Double](k)
    i = 0
    while (i < k) {
      var s = b(i)
      var m = 0
      while (m < i) { s -= l(i)(m) * y(m); m += 1 }
      y(i) = s / l(i)(i)
      i += 1
    }
    // back substitution Lᵀ x = y
    val x = new Array[Double](k)
    i = k - 1
    while (i >= 0) {
      var s = y(i)
      var m = i + 1
      while (m < k) { s -= l(m)(i) * x(m); m += 1 }
      x(i) = s / l(i)(i)
      i -= 1
    }
    x
  }
}
