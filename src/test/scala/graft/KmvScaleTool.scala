import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness (test scope only): measure KMV error at the PRODUCTION
  * parameter k=1024 against exact per-stratum distinct counts on a
  * stress corpus — the number BASELINE.md records next to d17's k=16
  * demo setting.
  *
  *   sbt 'Test/runMain KmvScale /tmp/sfx10'
  */
object KmvScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val k = if (args.length > 1) args(1).toInt else 1024
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val t0 = System.nanoTime()
    val est = graft.sketch.Kmv.distinctEstimate(
      docs, Seq("lang"), col("text"), k)
    val truth = docs.groupBy(col("lang"))
      .agg(count_distinct(col("text")).as("exact"))
    est.join(truth, Seq("lang")).orderBy(col("lang"))
      .select(col("lang"), col("exact"), col("est_distinct"),
        round(abs(col("est_distinct") - col("exact")) / col("exact") * 100, 2)
          .as("err_pct"))
      .collect()
      .foreach(r => println(f"KMV k=$k ${r.getString(0)}%-6s exact=${r.getLong(1)}%8d " +
        f"est=${r.getDouble(2)}%12.1f err=${r.getDouble(3)}%5.2f%%"))
    println(f"KMV k=$k sigma-band 1/sqrt(k-2) = ${100.0 / math.sqrt(k - 2.0)}%.2f%% " +
      f"wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
