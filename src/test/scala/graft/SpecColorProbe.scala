import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness (test scope): speculative-coloring round/time profile on
  * the dense orders graph at an arbitrary table dir.
  *
  *   sbt 'Test/runMain SpecColorProbe /tmp/sfx10'
  */
object SpecColorProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sfDir <- args.toSeq) {
      val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      val oe = orders.select(col("o_custkey").as("src"),
        (pmod(col("o_orderkey"), lit(211)) + 1000000L).as("dst")).distinct()
      val ov = oe.select(col("src").as("id")).union(oe.select(col("dst"))).distinct()
      val og = graft.core.Graph(ov,
        oe.withColumn("edge_id", xxhash64(col("src"), col("dst"))),
        directed = false)
      var last = System.nanoTime()
      val gc = graft.algorithms.GraphColoring(maxRounds = 40,
        roundListener = Some((r, u) => {
          val now = System.nanoTime()
          println(f"SPEC-ROUND $r uncolored=$u dt=${(now - last) / 1e9}%.1f s")
          last = now
        }))
      val t0 = System.nanoTime()
      val mc = gc.runSpeculative(og).select(max(col("color"))).head().getInt(0)
      println(f"SPEC-PROBE rounds=${gc.lastRounds} max_color=$mc " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%.1f s sf=$sfDir")
    }
    spark.stop()
  }
}
