package graft

import org.apache.spark.sql.functions._

import graft.sketch.Hll

class HllSpec extends SparkSpec {

  test("hll: merge = whole, duplicates free, production-p error band") {
    import spark.implicits._
    // three strata with known cardinalities, each key injected twice to
    // prove the no-distinct property (max is idempotent over duplicates)
    val df = Seq(20000, 50000, 120000).zipWithIndex.flatMap { case (n, s) =>
      (0 until n).flatMap(i => Seq((s"s$s", s"key-$s-$i"), (s"s$s", s"key-$s-$i")))
    }.toDF("g", "k")

    val p = 11 // m = 2048 -> sigma = 1.04/sqrt(2048) ~ 2.3%
    val regs = Hll.registers(df, Seq("g"), col("k"), p)

    // production error band: every stratum within 4 sigma of truth
    val est = Hll.estimateCorrected(regs, Seq("g"), p)
      .collect().map(r => r.getString(0) -> r.getDouble(r.fieldIndex("est"))).toMap
    val truth = Map("s0" -> 20000.0, "s1" -> 50000.0, "s2" -> 120000.0)
    truth.foreach { case (g, t) =>
      val err = math.abs(est(g) - t) / t
      assert(err < 4 * 1.04 / math.sqrt(2048),
        s"$g: est ${est(g)} vs $t, err $err out of band")
    }

    // shard-merge: registers of a partition of the data merge to the
    // whole-corpus registers, bucket for bucket
    val (a, b) = (df.filter(length(col("k")) % 2 === 0),
      df.filter(length(col("k")) % 2 === 1))
    val merged = Hll.merge(
      Hll.registers(a, Seq("g"), col("k"), p)
        .unionAll(Hll.registers(b, Seq("g"), col("k"), p)),
      Seq("g"))
    assert(rowSet(merged) === rowSet(regs))

    // register count never exceeds m per group (the fixed-size contract)
    val maxRegs = regs.groupBy(col("g")).agg(count(lit(1)).as("n"))
      .agg(max(col("n"))).head().getLong(0)
    assert(maxRegs <= (1 << p))
  }

  test("hll: linear-counting zone flagged and corrected at tiny cardinality") {
    import spark.implicits._
    val tiny = (0 until 10).map(i => ("t", s"k$i")).toDF("g", "k")
    val p = 8 // m = 256, 10 distinct << 2.5m -> lc zone certain
    val row = Hll.estimateCorrected(
      Hll.registers(tiny, Seq("g"), col("k"), p), Seq("g"), p).head()
    assert(row.getBoolean(row.fieldIndex("lc_range")))
    val est = row.getDouble(row.fieldIndex("est"))
    // linear counting is near-exact this far below m
    assert(math.abs(est - 10.0) < 1.5, s"lc estimate $est too far from 10")
    assert(row.getLong(row.fieldIndex("n_zero")) >= 246)
  }
  test("hll streaming face: batch-split + redelivery equals the batch estimate") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, String)]
    val sq = Hll.distinctEstimateStream(
        stream.toDF().toDF("g", "k"), "g", col("k"), p = 6)
      .writeStream.format("memory").queryName("hllstream")
      .outputMode("update").start()
    try {
      val b1 = (0 until 3000).map(i => ("s", s"key-$i"))
      val b2 = (2000 until 5000).map(i => ("s", s"key-$i")) // 1000 redelivered
      stream.addData(b1)
      sq.processAllAvailable()
      stream.addData(b2)
      sq.processAllAvailable()
      val last = spark.table("hllstream")
        .orderBy(col("n_zero").asc, col("s_sum").asc).head()
      val batch = Hll.distinctEstimate(
        (b1 ++ b2).toDF("g", "k"), Seq("g"), col("k"), p = 6).head()
      // registers merge by max — the union estimate bit for bit, and the
      // overlapping redelivery needs no dedup at all
      assert(last.getAs[Long]("n_zero") === batch.getAs[Long]("n_zero"))
      assert(last.getAs[Long]("s_sum") === batch.getAs[Long]("s_sum"))
      assert(last.getAs[Double]("est_raw") === batch.getAs[Double]("est_raw"))
    } finally sq.stop()
  }
}
