package graft

import org.apache.spark.sql.functions._

import graft.algorithms.Ridge

class RidgeSpec extends SparkSpec {

  test("exact-fit corpus recovers the plane exactly: pred_milli = 1000*y") {
    import spark.implicits._
    // y = 7 + 3*x1 + 5*x2 exactly; lambda = 0 so Cramer cancels and the
    // integral division is exact for every row
    val rows = for (i <- 1L to 50L) yield {
      val x1 = i % 11; val x2 = (i * 3) % 17
      (i, x1, x2, 7L + 3L * x1 + 5L * x2)
    }
    val got = Ridge.fitPredict(
        rows.toDF("id", "x1", "x2", "y"), "x1", "x2", "y", lambda = 0L)
      .select(col("id"), (col("pred_milli") - col("y") * 1000L).as("e"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.forall(_ == 0L),
      s"exact fit must predict exactly, residuals: ${got.filter(_._2 != 0)}")
  }

  test("ridge shrinks: lambda pulls the slope toward zero on a 2-point line") {
    import spark.implicits._
    // two points on y = 10*x1 (x2 constant 0): with 2 rows and 3
    // parameters the unpenalized normal matrix is SINGULAR (det = 0 —
    // ANSI throws rather than fabricating a fit), so both fits here are
    // ridge fits; the larger lambda must shrink the slope harder
    val df = Seq((1L, 1L, 0L, 10L), (2L, 2L, 0L, 20L)).toDF("id", "x1", "x2", "y")
    intercept[Exception] {
      Ridge.fitPredict(df, "x1", "x2", "y", lambda = 0L)
        .select("pred_milli").collect()
    }
    val mild = Ridge.fitPredict(df, "x1", "x2", "y", lambda = 1L)
      .select("id", "pred_milli").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hard = Ridge.fitPredict(df, "x1", "x2", "y", lambda = 100L)
      .select("id", "pred_milli").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val spreadMild = mild(2L) - mild(1L)
    val spreadHard = hard(2L) - hard(1L)
    assert(spreadMild < 10000L && spreadMild > 0L,
      s"ridge slope must sit under the data slope, got $spreadMild")
    assert(spreadHard < spreadMild && spreadHard > 0L,
      s"larger lambda must shrink harder: $spreadMild -> $spreadHard")
  }

  test("deterministic across runs and partitionings") {
    import spark.implicits._
    val rows = (1L to 500L).map(i => (i, i % 23, (i * 7) % 31, (i * i) % 97))
    val a = Ridge.fitPredict(rows.toDF("id", "x1", "x2", "y")
        .repartition(3), "x1", "x2", "y")
      .select("id", "pred_milli").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Ridge.fitPredict(rows.toDF("id", "x1", "x2", "y")
        .repartition(17), "x1", "x2", "y")
      .select("id", "pred_milli").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a === b, "integer moments + integral division: no float drift")
  }

  test("plan: one combinable aggregation, broadcast model row, no corpus shuffle") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, i % 5, i % 7, i % 11)).toDF("id", "x1", "x2", "y")
    val plan = Ridge.fitPredict(df, "x1", "x2", "y")
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      s"moments must map-side combine:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"the 1-row determinant frame must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus must not shuffle:\n$plan")
  }
}
