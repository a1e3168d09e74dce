package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line for the driver.
  *
  * Each query is timed over SPARK_GRAFT_REPEATS (default 3) full passes
  * and reports the per-query MINIMUM — host contention inflates a run
  * uniformly (this host varies ±40% pass-to-pass), and the min is the
  * best available estimate of the uncontended cost. A query that throws
  * is reported under "errors" (never as a fast timing); its time only
  * counts from passes where it succeeded.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val repeats = sys.env.getOrElse("SPARK_GRAFT_REPEATS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the page cache / file index once so cold-read cost is not
    // attributed to whichever query happens to touch a table first
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () }
    }
    // sorted order: deterministic attribution run-to-run
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
    val best = scala.collection.mutable.Map.empty[String, Double]
    // every successful pass's wall, in pass order (VERDICT r13 item 7):
    // the min is the headline, but a HOST-band adjudication needs the
    // spread — a uniform slowdown inflates every query's repeats
    // together, a per-query regression inflates one query's whole array
    val passes = scala.collection.mutable.Map.empty[String, List[Double]]
    val errors = scala.collection.mutable.Map.empty[String, String]
    for (_ <- 0 until repeats; (name, fn) <- names) {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        best.updateWith(name)(prev => Some(prev.fold(sec)(math.min(_, sec))))
        passes.updateWith(name)(prev => Some(prev.getOrElse(Nil) :+ sec))
      } catch {
        case e: Throwable =>
          errors.update(name,
            (e.getClass.getSimpleName + ": " + String.valueOf(e.getMessage)).take(200))
      }
    }
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val qs = names.flatMap { case (k, _) => best.get(k).map(v => s""""${esc(k)}":$v""") }
      .mkString("{", ",", "}")
    val reps = names.flatMap { case (k, _) =>
      passes.get(k).map(vs => s""""${esc(k)}":[${vs.map(v =>
        "%.3f".formatLocal(java.util.Locale.ROOT, v)).mkString(",")}]""") }
      .mkString("{", ",", "}")
    // a query that succeeded in any pass is not an error
    val errs = names.flatMap { case (k, _) =>
      if (best.contains(k)) None
      else errors.get(k).map(m => s""""${esc(k)}":"${esc(m)}"""") }
      .mkString("{", ",", "}")
    val total = names.flatMap { case (k, _) => best.get(k) }.sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","repeats":$repeats,"queries":$qs,"repeats_s":$reps,"errors":$errs,"sf":"${esc(sfDir)}"}"""
    println(line)
    // the stdout tail has been truncated by log interleaving more than
    // once (r7/r8 artifacts had `parsed: null`); the file copy is the
    // always-machine-readable record
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_SELF.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $out: ${e.getMessage}") }
    spark.stop()
  }
}
