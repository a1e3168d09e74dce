import org.apache.spark.sql.SparkSession

/** Dev harness (test scope only): times named SparkEntry queries with the
  * graft.Bench methodology (same session conf, same `.count()` action,
  * min over SMOKE_REPEATS passes) so an optimization round can A/B one
  * query in seconds instead of re-running the full 174-query sweep.
  *
  *   SMOKE_SF_DIR=/root/testdata/sf0.1 SMOKE_CPUS=32 SMOKE_REPEATS=3 \
  *     sbt 'Test/runMain BenchSubset g63_harmonic_deep g21_pagerank'
  */
object BenchSubset {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SMOKE_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SMOKE_CPUS", "32")
    val repeats = sys.env.getOrElse("SMOKE_REPEATS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same warm-up as Bench: page cache + one untimed shuffle
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () }
    }
    import org.apache.spark.sql.functions._
    spark.range(0L, 2000000L, 1L, 8)
      .select(pmod(hash(col("id")), lit(1000)).as("k"))
      .groupBy(col("k")).count().agg(sum(col("count"))).collect()
    val out = scala.collection.mutable.LinkedHashMap.empty[String, List[Double]]
    for (_ <- 0 until repeats; n <- args.toSeq) {
      val fn = graft.SparkEntry.queries(n)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      out.updateWith(n)(prev => Some(prev.getOrElse(Nil) :+ sec))
    }
    out.foreach { case (n, vs) =>
      println(f"=== $n%-28s min=${vs.min}%7.3f  all=[${vs.map(v => f"$v%.3f").mkString(", ")}]")
    }
    spark.stop()
  }
}
