import org.apache.spark.sql.SparkSession

/** Dev harness (test scope only): prints the formatted physical plan of
  * named SparkEntry queries — the .explain audit loop.
  *
  *   sbt 'Test/runMain ExplainQuery d27_span_removal'
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SMOKE_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.toSeq.foreach { n =>
      println(s"===== $n =====")
      println(graft.SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
