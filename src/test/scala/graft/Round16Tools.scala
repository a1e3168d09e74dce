import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-16 measurement harnesses (test scope, run by hand):
  *
  *   sbt 'Test/runMain EmbSeriesAb /root/testdata/sf0.1 5'
  *   sbt 'Test/runMain RefreshAbTool /tmp/sfx10 2'
  *
  * Both follow the ForestAbTool doctrine (BASELINE.md, r15): this
  * host's band swings 2–6.5× BETWEEN runs, so any cross-run comparison
  * measures the band, not the code — alternate the variants inside ONE
  * JVM, interleave fixed calibration probes, and take the per-variant
  * MIN. Results land in BASELINE.md.
  */
private object Round16Tools {
  def session(withExtensions: Boolean = false): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    val spark = (if (withExtensions)
      b.config("spark.sql.extensions", "graft.GraftExtensions") else b)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** The Bench/stress fixed shuffle probe — identical plan, never
    * changes, so its wall is the HOST band at that instant. */
  def calib(spark: SparkSession, tag: String, at: String): Double = {
    val t0 = System.nanoTime()
    spark.range(0L, 2000000L, 1L, 8)
      .select(pmod(hash(col("id")), lit(1000)).as("k"))
      .groupBy(col("k")).count()
      .agg(sum(col("count"))).collect()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"$tag ${s"calib[$at]"}%-22s $sec%8.2f s")
    sec
  }
}

/** VERDICT r15 item 2: adjudicate the e-series (PQ/IVF) bench drift —
  * e09 1.78→4.41 s, e10 2.43→5.55 s, e11 2.53→5.05 s over rounds 13→15
  * on UNTOUCHED code, ~2.5× where the whole surface moved ~1.6×. Two
  * hypotheses: (a) compounding host band hitting the most
  * scheduler-sensitive queries (driver-loop sampled-Lloyd fits = many
  * tiny jobs, so scheduling overhead compounds per job); (b) a creeping
  * plan change (AQE flip, codebook-fit job-count growth).
  *
  * This tool separates them IN ONE JVM: each rep runs e09/e10/e11
  * through the exact SparkEntry bodies (bench session shape: extensions
  * on, bench warm-up), bracketed by the fixed calibration probe, while
  * a SparkListener counts JOBS per query. If the job count is flat
  * rep-to-rep and matches across rounds (it is a pure function of the
  * frozen code), hypothesis (b) is dead and the wall/probe ratio pins
  * how much of the recorded drift is band.
  */
object EmbSeriesAb {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 5
    val spark = Round16Tools.session(withExtensions = true)
    // bench parity: page-cache warm of the one table these queries read
    spark.read.parquet(s"$sfDir/embeddings.parquet").count()

    val jobs = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      })

    val names = Seq("e09_knn_pq_adc", "e10_knn_ivfpq", "e11_knn_ivfpq_rerank")
    val walls = names.map(_ -> scala.collection.mutable.ArrayBuffer.empty[Double]).toMap
    val jobCounts = names.map(_ -> scala.collection.mutable.ArrayBuffer.empty[Long]).toMap
    val probes = scala.collection.mutable.ArrayBuffer.empty[Double]
    Round16Tools.calib(spark, "EMBAB", "warmup")
    for (rep <- 1 to reps) {
      probes += Round16Tools.calib(spark, "EMBAB", s"rep$rep")
      for (name <- names) {
        val fn = graft.SparkEntry.queries(name)
        val j0 = jobs.get()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        // listener events are async; a short settle is plenty for a
        // measurement tool (job-start events lag by milliseconds)
        Thread.sleep(300)
        val nj = jobs.get() - j0
        walls(name) += sec
        jobCounts(name) += nj
        println(f"EMBAB rep$rep $name%-22s $sec%8.2f s  jobs=$nj")
      }
    }
    probes += Round16Tools.calib(spark, "EMBAB", "end")
    for (name <- names) {
      val w = walls(name)
      val j = jobCounts(name)
      println(f"EMBAB SUMMARY $name%-22s min=${w.min}%6.2f s  " +
        f"median=${w.sorted.apply(w.size / 2)}%6.2f s  " +
        s"jobs=${j.distinct.mkString("/")} (flat=${j.distinct.size == 1})")
    }
    println(f"EMBAB probes min=${probes.min}%.3f s  max=${probes.max}%.3f s  " +
      f"median=${probes.sorted.apply(probes.size / 2)}%.3f s")
    spark.stop()
  }
}

/** VERDICT r15 item 6: pin the scoped-refresh ratio the way the forest
  * pin was pinned — refreshLabels vs refreshComponents alternated in
  * ONE JVM over the same store (A B A B, min per variant), instead of
  * the matched-band judgment across separated sfx100 phases that the
  * r15 0.44× headline rests on. refreshComponents pays BOTH narrow
  * rebuilds (labels + certificate); refreshLabels pays labels only, so
  * the expected ratio is labels/(labels+forest) on this corpus.
  */
object RefreshAbTool {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = Round16Tools.session()
    import graft.sources.GraphIO
    val raw = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey").cast("long").as("src"),
        (col("l_partkey").cast("long") + 4000000000L).as("dst"))
      .distinct()
      .localCheckpoint()
    val verts = raw.select(col("src").as("id"))
      .union(raw.select(col("dst"))).distinct().localCheckpoint()
    val name = "r16_refab"
    def timed(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"REFAB $label%-22s $sec%8.2f s")
      sec
    }
    Round16Tools.calib(spark, "REFAB", "warmup")
    Round16Tools.calib(spark, "REFAB", "start")
    val g = graft.core.Graph.index(verts, raw, directed = true)
    timed(s"build(${raw.count()})") {
      GraphIO.writeBucketed(g, name, buckets = 32)
    }
    timed("buildComponents") { GraphIO.buildComponents(spark, name) }
    timed("buildForest") { GraphIO.buildForest(spark, name) }
    val lab = scala.collection.mutable.ArrayBuffer.empty[Double]
    val both = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (rep <- 1 to reps) {
      Round16Tools.calib(spark, "REFAB", s"rep$rep")
      lab += timed(s"refreshLabels#$rep") { GraphIO.refreshLabels(spark, name) }
      both += timed(s"refreshComponents#$rep") { GraphIO.refreshComponents(spark, name) }
    }
    Round16Tools.calib(spark, "REFAB", "end")
    println(f"REFAB min labels=${lab.min}%.2f s  both=${both.min}%.2f s  " +
      f"ratio=${lab.min / both.min}%.3f")
    Seq("_vertices", "_edges", "_degrees", "_components", "_forest",
      "_refresh_pending").foreach(s =>
      spark.sql(s"DROP TABLE IF EXISTS $name$s"))
    spark.stop()
  }
}
