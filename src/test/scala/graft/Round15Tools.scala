import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-15 stress harness (test scope, run by hand like Round13Tools):
  *
  *   sbt 'Test/runMain ForestScaleStress /tmp/sfx100 1000'
  *
  * One store build serves three VERDICT r14 measurements:
  *  - item 2: `refreshLabels` (labels only) vs `refreshComponents`
  *    (both tables) — the scoped face must sit materially below the
  *    both-tables wall, band-adjusted against the same-run CC build;
  *  - item 3: the `parentForest` certificate build vs the same-run CC
  *    wall (the ≤1× goal, re-measured after the persist/repartition
  *    rework), certificate rows still exactly the spanning bound;
  *  - item 5: the replacement-edge repair at BATCH scale — cut(N) in
  *    ONE delete (the bulk-retirement shape; most cuts re-witness on
  *    this dense bipartite corpus) and a leaf-cut wave built from
  *    forest-degree-1 vertices (true splits, N new singletons), each
  *    verified `repaired ≡ refreshed` by row count, component count
  *    AND a bit_xor row fingerprint.
  *
  * Results land in BASELINE.md per round.
  */
object ForestScaleStress {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val batchN = if (args.length > 1) args(1).toInt else 1000
    val spark = Round15Tools.session()
    val raw = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey").cast("long").as("src"),
        (col("l_partkey").cast("long") + 4000000000L).as("dst"))
      .distinct()
      .localCheckpoint()
    val verts = raw.select(col("src").as("id"))
      .union(raw.select(col("dst"))).distinct().localCheckpoint()
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"FORESTSCALE $label%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    // the Bench calibration convention carried into the stress record:
    // a fixed 2M-row/1000-group shuffle probe between phases, so each
    // row's HOST band is written next to it (this host swings 2–4.5×
    // WITHIN a run — round-14/15 notes in BASELINE.md)
    def calib(at: String): Unit = {
      val t0 = System.nanoTime()
      spark.range(0L, 2000000L, 1L, 8)
        .select(pmod(hash(col("id")), lit(1000)).as("k"))
        .groupBy(col("k")).count()
        .agg(sum(col("count"))).collect()
      val label = s"calib[$at]"
      println(f"FORESTSCALE $label%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    calib("warmup"); calib("start")
    val name = "stress_fs"
    val g = graft.core.Graph.index(verts, raw, directed = true)
    timed(s"build(${raw.count()})") {
      graft.sources.GraphIO.writeBucketed(g, name, buckets = 32)
    }
    calib("pre-cc")
    // the band ruler every other row is quoted against
    timed("components-build") {
      graft.sources.GraphIO.buildComponents(spark, name)
    }
    calib("pre-forest")
    // item 3: the BFS certificate build after the sym persist/
    // repartition rework — target ≤ 1× the components-build wall
    timed("forest-build") {
      graft.sources.GraphIO.buildForest(spark, name)
    }
    calib("post-forest")
    val fs = graft.sources.GraphIO.forestStats(spark, name).head()
    println(s"FORESTSCALE stats rows=${fs.getAs[Long]("forest_rows")} " +
      s"bound=${fs.getAs[Long]("spanning_bound")} " +
      f"ratio=${fs.getAs[Double]("bloat_ratio")}%.4f")
    // item 2: the scoped face vs the both-tables wall
    timed("refresh-labels") {
      graft.sources.GraphIO.refreshLabels(spark, name)
    }
    calib("post-rlabels")
    timed("refresh-both") {
      graft.sources.GraphIO.refreshComponents(spark, name)
    }
    calib("post-rboth")

    def compFingerprint(): (Long, Long, Long) = {
      val c = graft.sources.GraphIO.readComponents(spark, name)
      val r = c.agg(
        count(lit(1)).as("n"),
        countDistinct(col("component")).as("k"),
        expr("bit_xor(xxhash64(id, component))").as("fp")).head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    // raw edges keyed by the same surrogate hash the index uses, for
    // classifying batches by certificate membership (public function,
    // replayed here — the ForestGuardStress device)
    def keyed(): DataFrame = raw.select(
      col("src"), col("dst"),
      xxhash64(col("src").cast("string")).as("ks"),
      xxhash64(col("dst").cast("string")).as("kd"))
      .select(col("src"), col("dst"),
        least(col("ks"), col("kd")).as("fsrc"),
        greatest(col("ks"), col("kd")).as("fdst"))

    // item 5a: cut(N) in ONE batch — arbitrary certificate edges (most
    // re-witness through the dense non-forest mass)
    val forest1 = graft.sources.GraphIO.readForest(spark, name)
      .select(col("src").as("fsrc"), col("dst").as("fdst"))
    val cutBatch = keyed().join(forest1, Seq("fsrc", "fdst"), "left_semi")
      .select(col("src"), col("dst"))
      .orderBy(col("src"), col("dst")).limit(batchN).localCheckpoint()
    println(s"FORESTSCALE cut-batch=${cutBatch.count()}")
    timed(s"delete-cutbatch($batchN)") {
      graft.sources.GraphIO.deleteEdges(spark, name, cutBatch)
    }
    calib("post-cutbatch")
    val (n1, k1, f1) = compFingerprint()
    timed("refresh-after-cutbatch") {
      graft.sources.GraphIO.refreshComponents(spark, name)
    }
    val (n1r, k1r, f1r) = compFingerprint()
    println(s"FORESTSCALE cutbatch repaired=(n=$n1,k=$k1,fp=$f1) " +
      s"refreshed=(n=$n1r,k=$k1r,fp=$f1r) " +
      s"exact=${(n1, k1, f1) == ((n1r, k1r, f1r))}")

    // item 5b: leaf-cut(N) — certificate edges whose canonical SRC side
    // is a forest-degree-1 vertex: cutting them strands true singletons,
    // the maximal-split shape of a batch retirement. Read the forest
    // FRESH (the refresh above rebuilt it).
    val forest2 = graft.sources.GraphIO.readForest(spark, name)
      .select(col("src"), col("dst")).localCheckpoint()
    val fdeg = forest2.select(col("src").as("_vid"))
      .unionAll(forest2.select(col("dst").as("_vid")))
      .groupBy(col("_vid")).agg(count(lit(1)).as("_d"))
      .filter(col("_d") === 1L).select(col("_vid"))
    val leafPairs = forest2
      .join(fdeg.select(col("_vid").as("src")), Seq("src"), "left_semi")
      .select(col("src").as("fsrc"), col("dst").as("fdst"))
    val leafBatch = keyed().join(leafPairs, Seq("fsrc", "fdst"), "left_semi")
      .select(col("src"), col("dst"))
      .orderBy(col("src"), col("dst")).limit(batchN).localCheckpoint()
    println(s"FORESTSCALE leaf-batch=${leafBatch.count()}")
    timed(s"delete-leafbatch($batchN)") {
      graft.sources.GraphIO.deleteEdges(spark, name, leafBatch)
    }
    calib("post-leafbatch")
    val (n2, k2, f2) = compFingerprint()
    timed("refresh-after-leafbatch") {
      graft.sources.GraphIO.refreshComponents(spark, name)
    }
    val (n2r, k2r, f2r) = compFingerprint()
    println(s"FORESTSCALE leafbatch repaired=(n=$n2,k=$k2,fp=$f2) " +
      s"refreshed=(n=$n2r,k=$k2r,fp=$f2r) " +
      s"exact=${(n2, k2, f2) == ((n2r, k2r, f2r))}")
    Seq("vertices", "edges", "degrees", "components", "forest",
      "refresh_pending").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS ${name}_$t"))
    spark.sql(s"DROP TABLE IF EXISTS ${name}__epoch")
    spark.stop()
  }
}

/** args: SF_DIR [CAP]. The DedupIndex bucket-health pass at corpus
  * scale (VERDICT r14 item 7's stress row): build the MinHash index
  * over the documents table, time the ONE-PASS [[bucketStats]]
  * aggregation against the index build it meters, and print the
  * health row at the given hot-bucket cap — the cost an ingest
  * cadence pays per tick.
  */
object BucketStatsStress {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cap = if (args.length > 1) args(1).toInt else 64
    val spark = Round15Tools.session()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).localCheckpoint()
    val n = docs.count()
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"BUCKETSTATS $label%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val idx = timed(s"build(n=$n)") {
      val b = graft.dedup.DedupIndex.build(docs, "doc_id", "text",
        shingleSize = 3, numHashes = 128, bands = 32)
      b.buckets.count(); b
    }
    val s = timed(s"bucketStats(cap=$cap)") {
      graft.dedup.DedupIndex.bucketStats(idx, cap).head()
    }
    println(s"BUCKETSTATS rows=${s.getAs[Long]("bucket_rows")} " +
      s"buckets=${s.getAs[Long]("distinct_buckets")} " +
      s"max=${s.getAs[Long]("max_occupancy")} " +
      s"p99=${s.getAs[Long]("occupancy_p99")} " +
      s"hot=${s.getAs[Long]("hot_bucket_count")} " +
      f"capped_frac=${s.getAs[Double]("capped_row_fraction")}%.6f")
    spark.stop()
  }
}

private object Round15Tools {
  def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
