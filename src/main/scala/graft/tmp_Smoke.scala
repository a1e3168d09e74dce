import org.apache.spark.sql.SparkSession

object SmokeTest {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.toSeq.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.01")
      df.coalesce(1).write.mode("overwrite").parquet(s"/tmp/smoke_out/$n.parquet")
      println(s"=== $n rows=${spark.read.parquet(s"/tmp/smoke_out/$n.parquet").count()}")
    }
    spark.stop()
  }
}
