import org.apache.spark.sql.SparkSession

/** Dev harness (test scope only): single-repeat timings of named
  * SparkEntry queries against an arbitrary table directory — the runner
  * for the self-scaled stress corpora built by tools/make_sfx.py.
  *
  *   sbt 'Test/runMain StressTest /tmp/sfx100 d02_minhash_dedup q08_triangles'
  *
  * Prints one line per query: name, seconds, output rows (count() like
  * graft.Bench, so timings compare directly).
  */
object StressTest {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // partition sizing is the session owner's lever: at 100x the wide
    // candidate-pair shuffles need more than one partition per core to
    // keep each partition's sort/agg working set inside the heap share
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () }
    }
    names.foreach { n =>
      val t0 = System.nanoTime()
      try {
        val rows = graft.SparkEntry.queries(n)(spark, sfDir).count()
        println(f"STRESS $n%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$rows")
      } catch {
        case e: Throwable =>
          println(s"STRESS $n FAILED ${e.getClass.getSimpleName}: " +
            String.valueOf(e.getMessage).take(300))
      }
    }
    spark.stop()
  }
}
