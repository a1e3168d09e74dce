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
    // SPARK_GRAFT_FORCE=1 replaces count() with a checksum over EVERY
    // output column: count() lets Catalyst prune unreferenced value
    // columns — and even eliminate duplicate-preserving outer joins —
    // so pure per-row-map queries (and d27's splice) time near-zero
    // under it. The checksum pins the full computation.
    val force = sys.env.get("SPARK_GRAFT_FORCE").contains("1")
    names.foreach { n =>
      val t0 = System.nanoTime()
      try {
        val df = graft.SparkEntry.queries(n)(spark, sfDir)
        val label =
          if (force) {
            import org.apache.spark.sql.functions._
            // coalesce: bit_xor over an EMPTY output is NULL (a capped
            // run can legitimately emit zero rows)
            val h = df.select(xxhash64(df.columns.map(col): _*).as("_h"))
              .agg(coalesce(bit_xor(col("_h")), lit(0L))).head().getLong(0)
            f"checksum=$h%016x"
          } else s"rows=${df.count()}"
        println(f"STRESS $n%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  $label")
      } catch {
        case e: Throwable =>
          println(s"STRESS $n FAILED ${e.getClass.getSimpleName}: " +
            String.valueOf(e.getMessage).take(300))
      }
    }
    spark.stop()
  }
}
