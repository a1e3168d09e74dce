import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness (test scope): report how many Jones–Plassmann rounds the
  * orders graph needs at a given sf dir — sizes the g48 oracle unroll.
  *
  *   sbt 'Test/runMain ColorProbe /root/testdata/sf0.01'
  */
object ColorProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sfDir <- (if (args.isEmpty) Seq("/root/testdata/sf0.01") else args.toSeq)) {
      val customer = spark.read.parquet(s"$sfDir/customer.parquet")
      val nation = spark.read.parquet(s"$sfDir/nation.parquet")
      val e = customer.select((col("c_custkey") + 10000L).as("src"),
          col("c_nationkey").cast("long").as("dst"))
        .union(nation.select(col("n_nationkey").cast("long"),
          (col("n_regionkey") + 1000L).cast("long")))
        .union(nation.select(col("n_nationkey").cast("long"),
          pmod(col("n_nationkey") + 1, lit(25)).cast("long")))
      val v = e.select(col("src").as("id")).union(e.select(col("dst"))).distinct()
      val g = graft.core.Graph(v,
        e.withColumn("edge_id", xxhash64(col("src"), col("dst"))),
        directed = false)
      val gc = graft.algorithms.GraphColoring(maxRounds = 40,
        roundListener = Some((r, u) =>
          println(s"PROBE-ROUND $r uncolored=$u sf=$sfDir")))
      val n = gc.run(g).select(max(col("color"))).head().getInt(0)
      println(s"PROBE rounds=${gc.lastRounds} max_color=$n sf=$sfDir")

      // the dense orders graph: JP stalls here (hub-ordering chains);
      // the speculative path must drain it in O(log n) rounds
      val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      val oe = orders.select(col("o_custkey").as("src"),
        pmod(col("o_orderkey"), lit(211)).as("dst")).distinct()
      val ov = oe.select(col("src").as("id")).union(oe.select(col("dst"))).distinct()
      val og = graft.core.Graph(ov,
        oe.withColumn("edge_id", xxhash64(col("src"), col("dst"))),
        directed = false)
      val sc = graft.algorithms.GraphColoring(maxRounds = 40)
      val t0 = System.nanoTime()
      val mc = sc.runSpeculative(og).select(max(col("color"))).head().getInt(0)
      println(f"PROBE-SPEC rounds=${sc.lastRounds} max_color=$mc " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%.1f s sf=$sfDir")
    }
    spark.stop()
  }
}
