package graft

import graft.relational.RobustStats

class RobustStatsSpec extends SparkSpec {

  test("MAD gate: a million-scale outlier cannot mask itself; constant strata flag any drift") {
    import spark.implicits._
    // stratum a: med = 3, deviations (2,1,0,1,999997) -> MAD = 1,
    // gate |x-3| > 3: ONLY the wild value flags. A mean/stddev z-score
    // on the same data has mean ~2e5 and sigma ~4.5e5 — the outlier
    // drags the gate past itself (z ~ 1.8) and nothing would flag.
    // stratum b: majority-constant -> MAD = 0 -> any deviation flags.
    val df = Seq(
      ("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("a", 1000000.0),
      ("b", 5.0), ("b", 5.0), ("b", 5.0), ("b", 7.0))
      .toDF("g", "value")
    val got = RobustStats.madOutliers(df, "g", "value")
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got("a") === ((3.0, 1.0, 5L, 1L)),
      "median/MAD hold their ground against the outlier")
    assert(got("b") === ((5.0, 0.0, 4L, 1L)),
      "MAD 0 on a majority-constant stratum flags any drift")
  }

  test("deterministic across partitionings; medians are exact data values") {
    import spark.implicits._
    val rows = (1L to 999L).map(i => ("g", (i * 7 % 101).toDouble))
    val a = RobustStats.madOutliers(rows.toDF("g", "value").repartition(3),
      "g", "value").collect().head
    val b = RobustStats.madOutliers(rows.toDF("g", "value").repartition(17),
      "g", "value").collect().head
    assert(a === b)
    // 999 values uniform over 0..100: the lower median is a real datum
    assert(a.getDouble(1) === 50.0 && rows.map(_._2).contains(a.getDouble(2) + 0.0))
  }
}
