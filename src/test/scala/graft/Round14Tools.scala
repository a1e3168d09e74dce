import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-14 stress harness (test scope, run by hand like Round13Tools):
  *
  *   sbt 'Test/runMain ForestBloatStress /tmp/sfx10 12'
  *
  * Results land in BASELINE.md per round.
  */

/** args: SF_DIR [BATCHES]. Certificate bloat under a long append stream
  * (VERDICT r13 item 3): `appendEdges` adds EVERY component-crossing
  * batch edge to the forest — correct but monotone, so a stream of
  * redundantly-bridging batches pushes |F| past the V−C spanning bound
  * and the false-repair rate creeps up. Build the star-per-order graph
  * (millions of small components), fire BATCHES append batches that
  * bridge fresh component groups redundantly (crossing-edge cliques far
  * past what a spanning forest needs), then
  * measure: the one-pass `forestStats` wall, the tripped
  * `retightenForestIfBloated` compaction, and the restored ratio.
  * (Bridges are 10-cliques of fresh components — 45 crossing edges
  * per clique where a spanning certificate needs 9.)
  */
object ForestBloatStress {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val batches = if (args.length > 1) args(1).toInt else 12
    val spark = Round14Tools.session()
    // 1% slice of the star-per-order graph: bloat_ratio is a GLOBAL
    // metric (rows / spanning bound), so the trip point is a function
    // of append volume RELATIVE to corpus size — a 40-batch stream
    // against the full 6M-vertex store moves the ratio by ~0.3% (the
    // honest shape: compaction is a long-stream maintenance device).
    // The slice reproduces the long-stream state in bounded wall time;
    // the full-scale ONE-PASS forestStats wall is measured inside
    // ForestGuardStress against the 60M-edge store.
    val raw = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .filter(col("l_orderkey") % 100L === 0L)
      .select(col("l_orderkey").cast("long").as("src"),
        (col("l_orderkey").cast("long") * 8L + col("l_linenumber").cast("long")
          + 4000000000L).as("dst"))
      .localCheckpoint()
    val verts = raw.select(col("src").as("id"))
      .union(raw.select(col("dst"))).distinct().localCheckpoint()
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"FORESTBLOAT $label%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val g = graft.core.Graph.index(verts, raw, directed = true)
    timed(s"build(${raw.count()})") {
      graft.sources.GraphIO.writeBucketed(g, "stress_fb", buckets = 32)
    }
    timed("components-build") {
      graft.sources.GraphIO.buildComponents(spark, "stress_fb")
    }
    timed("forest-build") {
      graft.sources.GraphIO.buildForest(spark, "stress_fb")
    }
    def stats(label: String): Unit = {
      val s = timed(s"forestStats[$label]") {
        graft.sources.GraphIO.forestStats(spark, "stress_fb").head()
      }
      println(s"FORESTBLOAT stats[$label] rows=${s.getAs[Long]("forest_rows")} " +
        s"bound=${s.getAs[Long]("spanning_bound")} " +
        f"ratio=${s.getAs[Double]("bloat_ratio")}%.4f " +
        s"components=${s.getAs[Long]("component_count")}")
    }
    stats("fresh")
    // each batch bridges 90 fresh component 10-CLIQUES: 45 crossing
    // edges per clique where a spanning certificate needs 9 — the
    // redundantly-bridging stream shape that actually accumulates
    // bloat. Orders are the components' label vertices (smallest ids).
    def cliques(ids: Array[Long]): Seq[(Long, Long)] =
      ids.grouped(10).filter(_.length == 10).flatMap { t =>
        for (i <- 0 until 10; j <- (i + 1) until 10) yield (t(i), t(j))
      }.toSeq
    val orderIds = raw.select(col("src")).distinct()
      .orderBy(col("src")).limit(batches * 900).collect().map(_.getLong(0))
    import spark.implicits._
    timed(s"append-bursts($batches x 90 cliques)") {
      (0 until batches).foreach { b =>
        val edges = cliques(orderIds.slice(b * 900, (b + 1) * 900))
        graft.sources.GraphIO.appendEdges(spark, "stress_fb",
          // the append path keys on the RAW schema (src, dst)
          edges.toDF("src", "dst"))
      }
    }
    stats("bloated")
    val ran = timed("retighten(1.1)") {
      graft.sources.GraphIO.retightenForestIfBloated(spark, "stress_fb", maxRatio = 1.1)
    }
    println(s"FORESTBLOAT retightened=$ran")
    stats("compacted")
    // the compacted certificate still guards: cut one certificate edge,
    // repair, and the component count matches a full refresh
    val cut = graft.sources.GraphIO.readForest(spark, "stress_fb")
      .orderBy(col("src"), col("dst")).limit(1).localCheckpoint()
    // map the canonical certificate pair back to a raw edge: the store
    // was indexed, so ids ARE xxhash64 surrogates; probe the raw frame
    val keyed = raw.union(cliques(orderIds).toDF("src", "dst"))
      .select(col("src"), col("dst"),
        xxhash64(col("src").cast("string")).as("ks"),
        xxhash64(col("dst").cast("string")).as("kd"))
      .select(col("src"), col("dst"),
        least(col("ks"), col("kd")).as("fsrc"),
        greatest(col("ks"), col("kd")).as("fdst"))
    val cutRaw = keyed.join(
        cut.select(col("src").as("fsrc"), col("dst").as("fdst")),
        Seq("fsrc", "fdst"), "left_semi")
      .select(col("src"), col("dst")).limit(1).localCheckpoint()
    timed("delete-forestcut(1)") {
      graft.sources.GraphIO.deleteEdges(spark, "stress_fb", cutRaw)
    }
    val c1 = graft.sources.GraphIO.readComponents(spark, "stress_fb")
      .select(col("component")).distinct().count()
    timed("full-refresh") {
      graft.sources.GraphIO.refreshComponents(spark, "stress_fb")
    }
    val c2 = graft.sources.GraphIO.readComponents(spark, "stress_fb")
      .select(col("component")).distinct().count()
    println(s"FORESTBLOAT components repaired=$c1 refreshed=$c2 (equal=${c1 == c2})")
    Seq("vertices", "edges", "degrees", "components", "forest").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS stress_fb_$t"))
    spark.sql("DROP TABLE IF EXISTS stress_fb__epoch")
    spark.stop()
  }
}

private object Round14Tools {
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
