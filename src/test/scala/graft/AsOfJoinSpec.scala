package graft

import org.apache.spark.sql.functions._

import graft.relational.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  // quotes: (key, ts, px); trades probe at various times
  private def quotes = Seq(
    ("a", 10L, 100L), ("a", 20L, 110L), ("a", 30L, 120L),
    ("b", 15L, 500L)
  ).toDF("k", "ts", "px")

  private def trades = Seq(
    ("a", 5L), ("a", 10L), ("a", 25L), ("a", 99L),
    ("b", 14L), ("c", 50L)
  ).toDF("k", "ts")

  test("backward as-of picks latest right at-or-before, null when none") {
    val out = AsOfJoin.asOf(trades, quotes, Seq("k"), "ts", Seq("px"))
      .select("k", "ts", "asof_ts", "asof_px")
    assert(rowSet(out) === Set(
      Seq("a", 5L, null, null),          // before first quote
      Seq("a", 10L, 10L, 100L),          // tie: inclusive
      Seq("a", 25L, 20L, 110L),
      Seq("a", 99L, 30L, 120L),
      Seq("b", 14L, null, null),
      Seq("c", 50L, null, null)))        // key never quoted
  }

  test("forward as-of picks earliest right at-or-after") {
    val out = AsOfJoin.asOf(trades, quotes, Seq("k"), "ts", Seq("px"),
        direction = "forward")
      .select("k", "ts", "asof_ts", "asof_px")
    assert(rowSet(out) === Set(
      Seq("a", 5L, 10L, 100L),
      Seq("a", 10L, 10L, 100L),          // tie: inclusive
      Seq("a", 25L, 30L, 120L),
      Seq("a", 99L, null, null),
      Seq("b", 14L, 15L, 500L),
      Seq("c", 50L, null, null)))
  }

  test("tolerance nulls matches farther than the bound, no fallback") {
    val out = AsOfJoin.asOf(trades, quotes, Seq("k"), "ts", Seq("px"),
        tolerance = Some(5L))
      .select("k", "ts", "asof_px")
    assert(rowSet(out) === Set(
      Seq("a", 5L, null),
      Seq("a", 10L, 100L),
      Seq("a", 25L, 110L),               // gap 5 <= 5
      Seq("a", 99L, null),               // gap 69: nulled, NOT older row
      Seq("b", 14L, null),
      Seq("c", 50L, null)))
  }

  test("a legitimately-null right attribute does not fall back to older rows") {
    val q = Seq(("a", 10L, Some(100L)), ("a", 20L, Option.empty[Long]))
      .toDF("k", "ts", "px")
    val t = Seq(("a", 25L)).toDF("k", "ts")
    val out = AsOfJoin.asOf(t, q, Seq("k"), "ts", Seq("px"))
      .select("asof_ts", "asof_px")
    // matched the ts=20 row whose px is genuinely null — not ts=10's 100
    assert(rowSet(out) === Set(Seq(20L, null)))
  }

  test("timestamp ts column works with tolerance in microseconds") {
    val q = Seq(("a", 10L, 100L), ("a", 20L, 110L)).toDF("k", "sec", "px")
      .select(col("k"), timestamp_seconds(col("sec")).as("ts"), col("px"))
    val t = Seq(("a", 12L), ("a", 25L), ("a", 90L)).toDF("k", "sec")
      .select(col("k"), timestamp_seconds(col("sec")).as("ts"))
    // tolerance = 6 seconds, expressed in µs per the documented contract
    val out = AsOfJoin.asOf(t, q, Seq("k"), "ts", Seq("px"),
        tolerance = Some(6L * 1000000L))
      .select(unix_seconds(col("ts")).as("sec"), col("asof_px"))
    assert(rowSet(out) === Set(
      Seq(12L, 100L),                    // gap 2 s
      Seq(25L, 110L),                    // gap 5 s
      Seq(90L, null)))                   // gap 70 s: nulled
  }

  test("fractional numeric ts keeps sub-unit gaps — no truncating cast") {
    val q = Seq(("a", 10.0, 100L)).toDF("k", "ts", "px")
    val t = Seq(("a", 10.9), ("a", 10.4)).toDF("k", "ts")
    // tolerance 0: a real gap of 0.9 must null; a LongType truncation
    // would read both as gap 0 and wrongly keep the match
    val out = AsOfJoin.asOf(t, q, Seq("k"), "ts", Seq("px"),
        tolerance = Some(0L))
      .select("ts", "asof_px")
    assert(rowSet(out) === Set(Seq(10.9, null), Seq(10.4, null)))
    // and a fractional gap within a nonzero tolerance still matches
    val out1 = AsOfJoin.asOf(t, q, Seq("k"), "ts", Seq("px"),
        tolerance = Some(1L))
      .select("ts", "asof_px")
    assert(rowSet(out1) === Set(Seq(10.9, 100L), Seq(10.4, 100L)))
  }

  test("TIMESTAMP_NTZ gap is wall-clock, immune to session-zone DST") {
    val prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      // 2026-03-08 02:00 America/New_York springs forward: these two
      // wall clocks are 2h apart on paper but only 1h apart as NY
      // instants. NTZ semantics is wall clock → gap must read 7200 s.
      val q = Seq(("a", "2026-03-08 01:30:00", 100L)).toDF("k", "s", "px")
        .select(col("k"), col("s").cast("timestamp_ntz").as("ts"), col("px"))
      val t = Seq(("a", "2026-03-08 03:30:00")).toDF("k", "s")
        .select(col("k"), col("s").cast("timestamp_ntz").as("ts"))
      // tolerance 5000 s: wall gap 7200 > 5000 → nulled. A session-zone
      // instant cast would measure 3600 and wrongly keep the match.
      val out = AsOfJoin.asOf(t, q, Seq("k"), "ts", Seq("px"),
          tolerance = Some(5000L * 1000000L))
        .select("asof_px")
      assert(rowSet(out) === Set(Seq(null)))
      // and 7200 s tolerance keeps it
      val out1 = AsOfJoin.asOf(t, q, Seq("k"), "ts", Seq("px"),
          tolerance = Some(7200L * 1000000L))
        .select("asof_px")
      assert(rowSet(out1) === Set(Seq(100L)))
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("user columns named like internal working names survive") {
    val t = trades
      .withColumn("_asof_side", col("ts") + 1)
      .withColumn("_asof_payload", col("ts") + 2)
    val out = AsOfJoin.asOf(t, quotes, Seq("k"), "ts", Seq("px"))
    assert(out.columns.count(_ == "_asof_side") === 1)
    val r = out.filter(col("k") === "a" && col("ts") === 25L)
      .select("_asof_side", "_asof_payload", "asof_px").collect().head
    assert(r.getLong(0) === 26L && r.getLong(1) === 27L && r.getLong(2) === 110L)
  }

  test("left columns pass through and prefix collisions are rejected") {
    val out = AsOfJoin.asOf(
      trades.withColumn("qty", col("ts") * 2), quotes, Seq("k"), "ts", Seq("px"))
    assert(out.columns.toSet ===
      Set("k", "ts", "qty", "asof_ts", "asof_px"))
    assertThrows[IllegalArgumentException] {
      AsOfJoin.asOf(trades.withColumn("asof_px", lit(1)),
        quotes, Seq("k"), "ts", Seq("px"))
    }
  }

  test("streaming enrichAsOf agrees with batch AsOfJoin on every probe") {
    val viaJoin = AsOfJoin.asOf(trades, quotes, Seq("k"), "ts", Seq("px"))
      .select("k", "ts", "asof_ts", "asof_px")
    val viaEnrich = graft.streaming.EventStream
      .enrichAsOf(trades, quotes, Seq("k"), "ts", Seq("px"))
      .select("k", "ts", "asof_ts", "asof_px")
    assert(rowSet(viaEnrich) === rowSet(viaJoin))
  }

  test("enrichAsOf works on an actual stream (stream-static join)") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long)]
    val q = graft.streaming.EventStream
      .enrichAsOf(stream.toDF().toDF("k", "ts"), quotes, Seq("k"), "ts", Seq("px"))
      .writeStream.format("memory").queryName("asof_stream").start()
    try {
      stream.addData(("a", 25L), ("a", 5L), ("b", 99L), ("c", 1L))
      q.processAllAvailable()
      val got = spark.table("asof_stream")
        .select("k", "ts", "asof_px")
        .collect().map(_.toSeq).toSet
      assert(got === Set(
        Seq("a", 25L, 110L),
        Seq("a", 5L, null),
        Seq("b", 99L, 500L),
        Seq("c", 1L, null)))
    } finally q.stop()
  }

  test("plan is one window over a union — no join node at all") {
    val out = AsOfJoin.asOf(trades, quotes, Seq("k"), "ts", Seq("px"))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("Window"))
    assert(!plan.toLowerCase.contains("cartesian"))
    assert(!plan.toLowerCase.contains("nestedloop"))
  }
}
