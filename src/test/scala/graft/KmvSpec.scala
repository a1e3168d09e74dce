package graft

import org.apache.spark.sql.functions._

import graft.sketch.{CountMin, Kmv}

class KmvSpec extends SparkSpec {

  test("count-min: never underestimates, exact when collision-free, merge = whole-stream") {
    import spark.implicits._
    // 50 keys with frequency = key index, probed exhaustively
    val occ = (1 to 50).flatMap(i => Seq.fill(i)(s"k$i")).toDF("tok")
    val probes = (1 to 50).map(i => s"k$i").toDF("tok")
    val exact = (1 to 50).map(i => s"k$i" -> i.toLong).toMap

    // tight sketch (width 8): collisions certain, min-probe must still
    // never go below truth
    val tight = CountMin.sketch(occ, col("tok"), depth = 4, width = 8)
    CountMin.estimate(tight, probes, col("tok"), depth = 4, width = 8)
      .collect().foreach { r =>
        assert(r.getLong(1) >= exact(r.getString(0)),
          s"${r.getString(0)} underestimated")
      }

    // roomy sketch (width 4096 >> 50 keys): estimates are exact unless
    // some pair collides in ALL 4 rows (p ~ 50^2/2 * 4096^-4 ~ 1e-12)
    val roomy = CountMin.sketch(occ, col("tok"), depth = 4, width = 4096)
    CountMin.estimate(roomy, probes, col("tok"), depth = 4, width = 4096)
      .collect().foreach { r =>
        assert(r.getLong(1) === exact(r.getString(0)))
      }

    // shard-merge: sketches of a partition of the stream sum to the
    // whole-stream sketch, counter for counter
    val (evens, odds) = (occ.filter(expr("substr(tok, 2) % 2 = 0")),
      occ.filter(expr("substr(tok, 2) % 2 = 1")))
    val merged = CountMin.merge(
      CountMin.sketch(evens, col("tok"), depth = 4, width = 8),
      CountMin.sketch(odds, col("tok"), depth = 4, width = 8))
    assert(rowSet(merged) === rowSet(tight))
  }

  test("kmv: exact fallback below k, bounded estimate above") {
    import spark.implicits._
    // group "small": 5 distinct keys (< k = 16) -> exact count;
    // group "big": 500 distinct keys -> estimate within the KMV error
    // band (sigma ~ n/sqrt(k-2) ~ 134; assert a generous 4-sigma window)
    val rows =
      (1 to 5).map(i => ("small", s"s$i")) ++
        (1 to 500).map(i => ("big", s"b$i")) ++
        (1 to 500).map(i => ("big", s"b$i")) // duplicates must not matter
    val df = rows.toDF("lang", "text")
    val got = Kmv.distinctEstimate(df, Seq("lang"), col("text"), k = 16)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getDouble(3)))).toMap
    val small = got("small")
    assert(small === ((5L, 5.0)))
    val (nBig, estBig) = got("big")
    assert(nBig === 16L)
    assert(estBig > 100 && estBig < 1100, s"estimate $estBig for true 500")
  }

  test("count-min streaming: built-in stateful agg, counters equal the batch sketch") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val q = CountMin.sketch(stream.toDF().toDF("tok"), col("tok"),
        depth = 4, width = 8)
      .writeStream.format("memory").queryName("cm").outputMode("complete").start()
    try {
      val batch1 = (1 to 30).flatMap(i => Seq.fill(i % 5 + 1)(s"k$i"))
      val batch2 = (20 to 50).map(i => s"k$i")
      stream.addData(batch1)
      q.processAllAvailable()
      stream.addData(batch2)
      q.processAllAvailable()
      val streamed = spark.table("cm")
      val batch = CountMin.sketch((batch1 ++ batch2).toDF("tok"), col("tok"),
        depth = 4, width = 8)
      assert(rowSet(streamed) === rowSet(batch))
    } finally q.stop()
  }

  test("count-min streaming RECOVERY: counters survive a stop/restart from checkpoint") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("cm-ckpt").toString
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    def start() = CountMin.sketch(stream.toDF().toDF("tok"), col("tok"),
        depth = 4, width = 8)
      .writeStream.format("memory").queryName("cmr")
      .option("checkpointLocation", ckpt)
      .outputMode("complete").start()

    val batch1 = (1 to 30).flatMap(i => Seq.fill(i % 5 + 1)(s"k$i"))
    val batch2 = (20 to 50).map(i => s"k$i")
    val q1 = start()
    try { stream.addData(batch1); q1.processAllAvailable() } finally q1.stop()
    // data arriving while the query is DOWN, then a restart from the
    // checkpoint: the aggregation state must resume, not reset
    stream.addData(batch2)
    val q2 = start()
    try {
      q2.processAllAvailable()
      val recovered = spark.table("cmr")
      val batch = CountMin.sketch((batch1 ++ batch2).toDF("tok"), col("tok"),
        depth = 4, width = 8)
      assert(rowSet(recovered) === rowSet(batch),
        "restarted sketch must equal the batch sketch of the union")
      // and the estimate path reads the recovered sketch like any other
      val probes = (1 to 50).map(i => s"k$i").toDF("tok")
      val a = CountMin.estimate(recovered, probes, col("tok"), depth = 4, width = 8)
      val b = CountMin.estimate(batch, probes, col("tok"), depth = 4, width = 8)
      assert(rowSet(a) === rowSet(b))
    } finally q2.stop()
  }

  test("kmv streaming: batch-split estimates equal the batch sketch (mergeability)") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, String)]
    val q = Kmv.distinctEstimateStream(stream.toDF().toDF("lang", "text"),
        "lang", col("text"), k = 16)
      .writeStream.format("memory").queryName("kmv").outputMode("update").start()
    try {
      // batch 1: 10 distinct (< k) -> exact; batch 2: 40 more -> estimate
      stream.addData((1 to 10).map(i => ("g", s"k$i")))
      q.processAllAvailable()
      val first = spark.table("kmv").as[Kmv.KmvEstimate].collect().last
      assert((first.n_kept, first.est_distinct) === ((10L, 10.0)))
      stream.addData((11 to 50).map(i => ("g", s"k$i")))
      q.processAllAvailable()
      val streamed = spark.table("kmv").as[Kmv.KmvEstimate].collect()
        .maxBy(_.n_kept)
      val batch = Kmv.distinctEstimate(
          (1 to 50).map(i => ("g", s"k$i")).toDF("lang", "text"),
          Seq("lang"), col("text"), k = 16)
        .collect().head
      assert(streamed.n_kept === batch.getLong(1))
      assert(streamed.kth_hash === batch.getLong(2))
      assert(streamed.est_distinct === batch.getDouble(3))
    } finally q.stop()
  }

  test("kmv at the production parameter k=1024: error inside the 1/sqrt(k-2) band") {
    import spark.implicits._
    // three strata of very different true cardinalities; sigma/n =
    // 1/sqrt(1022) ~ 3.1%, assert a 4-sigma (12.5%) window per stratum
    val rows = Seq(("a", 50000), ("b", 100000), ("c", 200000)).flatMap {
      case (g, n) => (1 to n).map(i => (g, s"$g-key-$i"))
    }
    val got = Kmv.distinctEstimate(rows.toDF("lang", "text"),
        Seq("lang"), col("text"), k = 1024)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(3)))
    assert(got.length === 3)
    val tol = 4.0 / math.sqrt(1022.0)
    got.foreach { case (g, nKept, est) =>
      val truth = Map("a" -> 50000.0, "b" -> 100000.0, "c" -> 200000.0)(g)
      assert(nKept === 1024L, s"stratum $g sketch not full")
      val relErr = math.abs(est - truth) / truth
      assert(relErr < tol, f"stratum $g: est $est%.0f vs $truth%.0f (${relErr * 100}%.1f%%)")
    }
  }

  test("kmv: deterministic across partitionings") {
    import spark.implicits._
    val df1 = (1 to 300).map(i => ("g", s"k$i")).toDF("lang", "text")
    val df32 = df1.repartition(32)
    val a = Kmv.distinctEstimate(df1, Seq("lang"), col("text"), 16).collect()
    val b = Kmv.distinctEstimate(df32, Seq("lang"), col("text"), 16).collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
  }
}
