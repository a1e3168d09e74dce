import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness (test scope): report how many Jones–Plassmann rounds the
  * orders graph needs at a given sf dir — sizes the g48 oracle unroll.
  *
  *   sbt 'Test/runMain ColorProbe /root/testdata/sf0.01'
  */
object ColorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val e = orders.select(col("o_custkey").as("src"),
      pmod(col("o_orderkey"), lit(211)).as("dst")).distinct()
    val v = e.select(col("src").as("id")).union(e.select(col("dst"))).distinct()
    val g = graft.core.Graph(v,
      e.withColumn("edge_id", xxhash64(col("src"), col("dst"))),
      directed = false)
    // binary search the cap: smallest maxRounds that completes
    var lo = 1; var hi = 40
    while (lo < hi) {
      val mid = (lo + hi) / 2
      val ok = try {
        graft.algorithms.GraphColoring(maxRounds = mid).run(g).count(); true
      } catch { case _: IllegalArgumentException => false }
      if (ok) hi = mid else lo = mid + 1
    }
    println(s"PROBE rounds_needed=$lo sf=$sfDir")
    spark.stop()
  }
}
