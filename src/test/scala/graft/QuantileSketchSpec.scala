package graft

import org.apache.spark.sql.functions._

import graft.sketch.QuantileSketch

class QuantileSketchSpec extends SparkSpec {

  test("exact when the stratum holds <= k rows (sample = stratum)") {
    import spark.implicits._
    val df = (1 to 100).map(i => ("s", i.toLong, i.toDouble)).toDF("g", "id", "v")
    val sk = QuantileSketch.sketch(df, "g", "id", "v", k = 256)
    val thr = QuantileSketch.thresholds(sk, "g", 0.25).head()
    // ceil(0.25 * 100) = 25th smallest of 1..100 = 25; n and m exact
    assert(thr.getAs[Long]("n") === 100L)
    assert(thr.getAs[Long]("m") === 100L)
    assert(thr.getAs[Double]("threshold") === 25.0)
    // matches the exact-path operator it substitutes for at scale
    val exact = graft.sample.Sampling
      .quantileThresholds(df, "g", "v", 0.25).head().getDouble(1)
    assert(thr.getAs[Double]("threshold") === exact)
  }

  test("error band: sampled quantile rank within 4/sqrt(k) of the target") {
    import spark.implicits._
    // 20k uniform values, k = 1024: rank error stddev ~ sqrt(q(1-q)/k)
    // ~ 1.3% of the stratum; assert a generous 4-sigma ~ 5.2% window
    val n = 20000
    val df = (1 to n).map(i => ("s", i.toLong, i.toDouble)).toDF("g", "id", "v")
    val sk = QuantileSketch.sketch(df, "g", "id", "v", k = 1024)
    for (q <- Seq(0.1, 0.5, 0.9)) {
      val t = QuantileSketch.thresholds(sk, "g", q).head().getAs[Double]("threshold")
      val trueRank = t / n // values are 1..n, so value == its rank
      assert(math.abs(trueRank - q) < 4.0 / math.sqrt(1024.0),
        s"q=$q: threshold $t implies rank $trueRank")
    }
  }

  test("merge of disjoint parts EQUALS the whole-corpus sketch, row for row") {
    import spark.implicits._
    val all = (1 to 5000).map(i =>
      (if (i % 2 == 0) "a" else "b", i.toLong, (i * 37 % 1000).toDouble))
      .toDF("g", "id", "v")
    val (left, right) = (all.filter(col("id") <= 2500), all.filter(col("id") > 2500))
    val whole = QuantileSketch.sketch(all, "g", "id", "v", k = 128)
    val merged = QuantileSketch.merge("g",
      QuantileSketch.sketch(left, "g", "id", "v", k = 128),
      QuantileSketch.sketch(right, "g", "id", "v", k = 128))
    // the bottom-k sample is a pure function of the input SET — merge is
    // bit-for-bit the whole, not merely within error of it
    assert(rowSet(merged.rows) === rowSet(whole.rows))
    assert(rowSet(merged.counts) === rowSet(whole.counts))
    for (q <- Seq(0.1, 0.5, 0.9))
      assert(rowSet(QuantileSketch.thresholds(merged, "g", q)) ===
        rowSet(QuantileSketch.thresholds(whole, "g", q)))
  }

  test("streaming face: batch-split estimates equal the batch sketch") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Long, Double)]
    val sq = QuantileSketch.thresholdStream(
        stream.toDF().toDF("g", "id", "v"), "g", "id", "v",
        quantile = 0.5, k = 64)
      .writeStream.format("memory").queryName("qs").outputMode("update").start()
    try {
      val batch1 = (1 to 300).map(i => ("s", i.toLong, i.toDouble))
      val batch2 = (301 to 500).map(i => ("s", i.toLong, i.toDouble))
      stream.addData(batch1)
      sq.processAllAvailable()
      stream.addData(batch2)
      sq.processAllAvailable()
      // last emitted estimate for the group == batch path over the union
      val last = spark.table("qs").orderBy(col("n").desc).head()
      val batch = (batch1 ++ batch2).toDF("g", "id", "v")
      val exp = QuantileSketch.thresholds(
        QuantileSketch.sketch(batch, "g", "id", "v", k = 64), "g", 0.5).head()
      assert(last.getAs[Long]("n") === exp.getAs[Long]("n"))
      assert(last.getAs[Long]("m") === exp.getAs[Long]("m"))
      assert(last.getAs[Double]("threshold") === exp.getAs[Double]("threshold"))
    } finally sq.stop()
  }

  test("streaming face: a redelivered row id holds one sample slot, not two") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Long, Double)]
    val sq = QuantileSketch.thresholdStream(
        stream.toDF().toDF("g", "id", "v"), "g", "id", "v",
        quantile = 0.5, k = 64)
      .writeStream.format("memory").queryName("qsdup").outputMode("update").start()
    try {
      val rows = (1 to 40).map(i => ("s", i.toLong, i.toDouble))
      stream.addData(rows)
      sq.processAllAvailable()
      // an at-least-once source replays the same 40 rows in a later batch
      stream.addData(rows)
      sq.processAllAvailable()
      val last = spark.table("qsdup").orderBy(col("n").desc).head()
      // the sample dedups on (h, rid): m stays 40 (not 64 with doubles),
      // so the selected set — and the threshold — is redelivery-proof
      assert(last.getAs[Long]("m") === 40L)
      assert(last.getAs[Double]("threshold") === 20.0)
      // n counts DELIVERED rows by documented contract
      assert(last.getAs[Long]("n") === 80L)
    } finally sq.stop()
  }
}
