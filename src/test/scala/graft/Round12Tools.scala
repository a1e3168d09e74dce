import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-12 stress harnesses (test scope, run by hand like Round11Tools):
  *
  *   sbt 'Test/runMain WarmRankStress /tmp/sfx100 1000'
  *   sbt 'Test/runMain DeleteRepairStress /tmp/sfx100 1000'
  *   sbt 'Test/runMain SkewStress /tmp/sfx10 1000000'
  *   sbt 'Test/runMain G58Phases /root/testdata/sf0.1'
  *
  * Results land in BASELINE.md per round.
  */

/** args: SF_DIR [BATCH_EDGES]. The warm-start rank story (VERDICT r11
  * item 3) at corpus scale: cold `buildRanks` over the stored
  * orderkey->partkey graph, a 1000-edge append, then `refreshRanks`
  * warm-started from the stored vector vs a second cold build — wall
  * time AND executed round counts (the perturbation of a batch-sized
  * append re-converges in a small fraction of the cold rounds).
  */
object WarmRankStress {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val batchN = if (args.length > 1) args(1).toInt else 1000
    val tolArg = if (args.length > 2) args(2).toDouble else 1e-8
    val spark = Round12Tools.session()
    val raw = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey").cast("long").as("src"),
        (col("l_partkey").cast("long") + 4000000000L).as("dst"))
      .localCheckpoint()
    val verts = raw.select(col("src").as("id"))
      .union(raw.select(col("dst"))).distinct().localCheckpoint()
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"WARMRANK $label%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val g = graft.core.Graph.index(verts, raw, directed = true)
    timed(s"build(${raw.count()})") {
      graft.sources.GraphIO.writeBucketed(g, "stress_wr", buckets = 32)
    }
    val tol = Some(tolArg)
    val coldRounds = timed("ranks-cold") {
      graft.sources.GraphIO.buildRanks(spark, "stress_wr",
        maxIterations = 60, tolerance = tol)
    }
    val srcs = raw.select(col("src")).distinct().orderBy(col("src")).limit(100)
    val dsts = raw.select(col("dst")).distinct().orderBy(col("dst"))
      .limit(math.max(1, batchN / 100))
    val batch = srcs.crossJoin(dsts).localCheckpoint()
    println(s"WARMRANK batch=${batch.count()}")
    timed("append") {
      graft.sources.GraphIO.appendEdges(spark, "stress_wr", batch)
    }
    val warmRounds = timed("ranks-warm") {
      graft.sources.GraphIO.refreshRanks(spark, "stress_wr",
        maxIterations = 60, tolerance = tol)
    }
    val warm = graft.sources.GraphIO.readRanks(spark, "stress_wr")
      .localCheckpoint()
    val coldRounds2 = timed("ranks-cold-again") {
      graft.sources.GraphIO.buildRanks(spark, "stress_wr",
        maxIterations = 60, tolerance = tol)
    }
    val cold = graft.sources.GraphIO.readRanks(spark, "stress_wr")
    val maxDiff = warm.as("w").join(cold.as("c"), Seq("id"))
      .agg(max(abs(col("w.rank") - col("c.rank")))).head().getDouble(0)
    println(s"WARMRANK rounds cold=$coldRounds warm=$warmRounds " +
      s"cold_again=$coldRounds2 max_diff=$maxDiff")
    Seq("vertices", "edges", "degrees", "ranks").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS stress_wr_$t"))
    spark.stop()
  }
}

/** args: SF_DIR [BATCH_EDGES]. Bounded component repair under deletes
  * (VERDICT r11 item 5) at corpus scale: the star-per-order graph
  * (component count tracks the corpus), delete a batch of leaf edges
  * touching `BATCH_EDGES` distinct components, and time the in-place
  * repair against a full `refreshComponents` — repair must cost ∝ the
  * affected component mass (a few leaves each), not the corpus.
  */
object DeleteRepairStress {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val batchN = if (args.length > 1) args(1).toInt else 1000
    val spark = Round12Tools.session()
    val raw = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey").cast("long").as("src"),
        (col("l_orderkey").cast("long") * 8L + col("l_linenumber").cast("long")
          + 4000000000L).as("dst"))
      .localCheckpoint()
    val verts = raw.select(col("src").as("id"))
      .union(raw.select(col("dst"))).distinct().localCheckpoint()
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"DELREPAIR $label%-20s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val g = graft.core.Graph.index(verts, raw, directed = true)
    timed(s"build(${raw.count()})") {
      graft.sources.GraphIO.writeBucketed(g, "stress_dr", buckets = 32)
    }
    timed("components-build") {
      graft.sources.GraphIO.buildComponents(spark, "stress_dr")
    }
    // one leaf edge from each of batchN distinct orders: deleting it
    // splits that leaf off its star — batchN affected components, each
    // a handful of vertices
    val batch = raw.filter(col("dst") % 8L === 1L)
      .orderBy(col("src")).limit(batchN).localCheckpoint()
    println(s"DELREPAIR batch=${batch.count()}")
    timed("delete+repair") {
      graft.sources.GraphIO.deleteEdges(spark, "stress_dr", batch)
    }
    val c1 = graft.sources.GraphIO.readComponents(spark, "stress_dr")
      .select(col("component")).distinct().count()
    timed("delete-redeliver") {
      graft.sources.GraphIO.deleteEdges(spark, "stress_dr", batch)
    }
    timed("full-refresh") {
      graft.sources.GraphIO.refreshComponents(spark, "stress_dr")
    }
    val c2 = graft.sources.GraphIO.readComponents(spark, "stress_dr")
      .select(col("component")).distinct().count()
    println(s"DELREPAIR components repaired=$c1 refreshed=$c2 " +
      s"(equal=${c1 == c2})")
    Seq("vertices", "edges", "degrees", "components").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS stress_dr_$t"))
    spark.stop()
  }
}

/** args: SF_DIR [HUB_DEGREE]. The planted-hub skew story end to end
  * (VERDICT r11 item 4): the sf orderkey->partkey graph UNIONED with
  * one hub vertex adjacent to HUB_DEGREE fresh leaves (default 1e6 —
  * three orders past any organic degree in the corpus), pushed through
  * ConnectedComponents (Pregel) with salting off vs on, then
  * LabelPropagation and PageRank (whose aggregations are decomposable
  * — partial map-side combine is their built-in skew device). Outputs
  * are checksummed: salting must change the wall profile, never a row.
  */
object SkewStress {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val hubDeg = if (args.length > 1) args(1).toInt else 1000000
    val spark = Round12Tools.session()
    val base = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey").cast("long").as("src"),
        (col("l_partkey").cast("long") + 4000000000L).as("dst"))
    // hub id 9e18-ish can overflow surrogate hashing paths — use a flat
    // disjoint range instead: hub = 8e18? keep it simple and SAFE:
    // hub = 7_000_000_000L, leaves above it
    val hub = 7000000000L
    val leaves = spark.range(1, hubDeg + 1)
      .select(lit(hub).as("src"), (col("id") + hub).as("dst"))
    val raw = base.unionByName(leaves).localCheckpoint()
    val verts = raw.select(col("src").as("id"))
      .union(raw.select(col("dst"))).distinct().localCheckpoint()
    val g = graft.core.Graph.index(verts, raw, directed = true)
    val pinned = graft.core.Graph(
      g.vertices.localCheckpoint(), g.edges.localCheckpoint(), g.directed)
    println(s"SKEW corpus edges=${pinned.edges.count()} hub_degree=$hubDeg")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"SKEW $label%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def checksum(df: org.apache.spark.sql.DataFrame): Long =
      df.select(xxhash64(df.columns.map(col).toIndexedSeq: _*).as("_h"))
        .agg(coalesce(bit_xor(col("_h")), lit(0L))).head().getLong(0)
    val ccOff = timed("cc-salt-off") {
      checksum(graft.algorithms.ConnectedComponents(maxIterations = 20).run(pinned))
    }
    val ccOn = timed("cc-salt-32") {
      checksum(graft.algorithms.ConnectedComponents(
        maxIterations = 20, saltBuckets = 32).run(pinned))
    }
    println(s"SKEW cc checksums off=$ccOff on=$ccOn identical=${ccOff == ccOn}")
    timed("labelprop") {
      checksum(graft.algorithms.LabelPropagation(maxIterations = 5).run(pinned))
    }
    timed("pagerank") {
      checksum(graft.algorithms.PageRank(maxIterations = 5).run(pinned))
    }
    spark.stop()
  }
}

/** args: [SF_DIR]. The g58 bench row split into its five phases
  * (VERDICT r11 item 6): the aggregate 6 s number hides which phase a
  * regression lands in — record per-phase walls in BASELINE.md each
  * round so an eager-materialization regression is visible in the
  * round record, not only at stress scale.
  */
object G58Phases {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = Round12Tools.session()
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"G58PHASE $label%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val all = spark.read.parquet(s"$sfDir/orders.parquet").select(
      col("o_custkey").cast("long").as("src"),
      (pmod(col("o_orderkey"), lit(211)) + lit(1000000L)).cast("long").as("dst"),
      pmod(col("o_orderkey"), lit(10L)).as("_slice"))
    def vertsOfE(e: org.apache.spark.sql.DataFrame) =
      e.select(col("src").as("id")).union(e.select(col("dst"))).distinct()
    val e90 = all.filter(col("_slice") =!= 0L).drop("_slice")
    val e10 = all.filter(col("_slice") === 0L).drop("_slice")
    val name = "g58phases"
    timed("index+write") {
      graft.sources.GraphIO.writeBucketed(
        graft.core.Graph.index(vertsOfE(e90), e90, directed = true), name, buckets = 8)
    }
    timed("components") {
      graft.sources.GraphIO.buildComponents(spark, name)
    }
    timed("append-verts") {
      graft.sources.GraphIO.appendVertices(spark, name, vertsOfE(e10))
    }
    timed("append-edges") {
      graft.sources.GraphIO.appendEdges(spark, name, e10)
    }
    timed("read-back") {
      val v = spark.table(s"${name}_vertices")
      graft.sources.GraphIO.readDegrees(spark, name)
        .join(v.select(col("id"), col("old_id")), Seq("id"))
        .select(col("old_id"), col("out_degree"), col("in_degree"))
        .count()
    }
    Seq("vertices", "edges", "degrees", "components").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS ${name}_$t"))
    spark.stop()
  }
}

/** args: SF_DIR [BATCH_DOCS]. The incremental near-dup cluster
  * lifecycle (VERDICT r11 item 2) at corpus scale: persisted index over
  * the documents table, ONE full closure (`buildNearClusters` — the
  * d35-standalone cost), then a batch of near-dup variants folded
  * through `mergeBucketed` — the advance must cost ∝ batch + the
  * O(reps) narrow relabel, never the closure. A second full closure is
  * timed for the comparison row.
  */
object NearClusterStress {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val batchN = if (args.length > 1) args(1).toInt else 1000
    val spark = Round12Tools.session()
    import graft.dedup.DedupIndex
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"NEARCLUSTER $label%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .localCheckpoint()
    val name = "stress_ncl"
    def dropAll(): Unit =
      Seq("clusters", "shingles", "buckets", "meta", "nearclusters", "nclmeta")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS ${name}_$t"))
    dropAll()
    try {
      timed(s"index-build(${docs.count()})") {
        DedupIndex.writeBucketed(
          DedupIndex.build(docs, "doc_id", "text"), name)
      }
      timed("closure-once") {
        DedupIndex.buildNearClusters(spark, name, threshold = 0.4,
          maxBucketSize = 64)
      }
      // batch: near-dup VARIANTS of existing docs under fresh ids —
      // most verify as pairs and many fire live cluster merges
      val batch = docs.orderBy(col("doc_id")).limit(batchN)
        .select((col("doc_id") + 20000000000000L).as("doc_id"),
          concat(col("text"), lit(" zz qq")).as("text"))
        .localCheckpoint()
      println(s"NEARCLUSTER batch=${batch.count()}")
      // compute-only faces first (no table writes — the O(reps) narrow
      // rewrite is the same for both paths, so this isolates the CLUSTER
      // work: batch-sized advance vs the full pair-graph closure)
      val idx0 = DedupIndex.readBucketed(spark, name)
      val ncl0 = DedupIndex.readNearClusters(spark, name).localCheckpoint()
      val m = timed("merge-compute") {
        DedupIndex.mergeDetailed(idx0, batch, "doc_id", "text")
      }
      timed("advance-compute") {
        DedupIndex.advanceClusters(m, ncl0, 0.4, maxBucketSize = 64).count()
      }
      timed("closure-compute") {
        m.index.nearClusters(0.4, maxBucketSize = 64).count()
      }
      timed("merge+advance") {
        DedupIndex.mergeBucketed(spark, name, batch, "doc_id", "text")
      }
      val n = DedupIndex.readNearClusters(spark, name).count()
      val c = DedupIndex.readNearClusters(spark, name)
        .select(col("cluster_id")).distinct().count()
      println(s"NEARCLUSTER reps=$n clusters=$c")
      timed("closure-again") {
        DedupIndex.buildNearClusters(spark, name, threshold = 0.4,
          maxBucketSize = 64)
      }
    } finally dropAll()
    spark.stop()
  }
}

private object Round12Tools {
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
