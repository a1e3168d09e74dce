import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-13 stress harnesses (test scope, run by hand like Round12Tools):
  *
  *   sbt 'Test/runMain ForestGuardStress /tmp/sfx100 1000'
  *
  * Results land in BASELINE.md per round.
  */

/** args: SF_DIR [BATCH_EDGES]. The spanning-forest delete guard at the
  * WORST-CASE corpus shape (VERDICT r12 item 2): the orderkey->partkey
  * bipartite graph is essentially ONE giant component, where any
  * component repair ≈ a full CC (the documented 84.6 s at sfx100).
  * With the forest maintained, a batch delete of NON-forest edges must
  * skip repair outright (cost ≈ the table rewrites alone), while a
  * forest CUT still pays the full bounded repair — measured side by
  * side with a cold refreshComponents for scale.
  */
object ForestGuardStress {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val batchN = if (args.length > 1) args(1).toInt else 1000
    val spark = Round13Tools.session()
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
      println(f"FORESTGUARD $label%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val g = graft.core.Graph.index(verts, raw, directed = true)
    timed(s"build(${raw.count()})") {
      graft.sources.GraphIO.writeBucketed(g, "stress_fg", buckets = 32)
    }
    timed("components-build") {
      graft.sources.GraphIO.buildComponents(spark, "stress_fg")
    }
    val nComp = graft.sources.GraphIO.readComponents(spark, "stress_fg")
      .select(col("component")).distinct().count()
    println(s"FORESTGUARD components=$nComp (worst case wants ~1 giant)")
    timed("forest-build") {
      graft.sources.GraphIO.buildForest(spark, "stress_fg")
    }
    // (r14) the certificate-health pass at full scale: one column-pruned
    // aggregation over the two narrow tables
    val fs = timed("forestStats") {
      graft.sources.GraphIO.forestStats(spark, "stress_fg").head()
    }
    println(s"FORESTGUARD stats rows=${fs.getAs[Long]("forest_rows")} " +
      s"bound=${fs.getAs[Long]("spanning_bound")} " +
      f"ratio=${fs.getAs[Double]("bloat_ratio")}%.4f")
    // classify raw edges by certificate membership via the same
    // surrogate hash the index uses (public function, replayed here)
    val keyed = raw.select(
      col("src"), col("dst"),
      xxhash64(col("src").cast("string")).as("ks"),
      xxhash64(col("dst").cast("string")).as("kd"))
      .select(col("src"), col("dst"),
        least(col("ks"), col("kd")).as("fsrc"),
        greatest(col("ks"), col("kd")).as("fdst"))
    val forest = graft.sources.GraphIO.readForest(spark, "stress_fg")
      .select(col("src").as("fsrc"), col("dst").as("fdst"))
    val nonForestBatch = keyed.join(forest, Seq("fsrc", "fdst"), "left_anti")
      .select(col("src"), col("dst"))
      .orderBy(col("src"), col("dst")).limit(batchN).localCheckpoint()
    val forestBatch = keyed.join(forest, Seq("fsrc", "fdst"), "left_semi")
      .select(col("src"), col("dst"))
      .orderBy(col("src"), col("dst")).limit(10).localCheckpoint()
    println(s"FORESTGUARD non-forest batch=${nonForestBatch.count()} " +
      s"forest-cut batch=${forestBatch.count()}")
    // the headline row: repair SKIPPED, cost = rewrites alone
    timed(s"delete-nonforest($batchN)") {
      graft.sources.GraphIO.deleteEdges(spark, "stress_fg", nonForestBatch)
    }
    // FAST-ERASE row: vertices that are certificate leaves and not
    // component labels — the right-to-be-forgotten shape. Candidates:
    // exactly one forest edge touches them, and they label nothing.
    val fNow = graft.sources.GraphIO.readForest(spark, "stress_fg")
    val fdeg = fNow.select(col("src").as("_vid"))
      .unionAll(fNow.select(col("dst").as("_vid")))
      .groupBy(col("_vid")).agg(count(lit(1)).as("_d"))
      .filter(col("_d") === 1L).select(col("_vid"))
    val labels = graft.sources.GraphIO.readComponents(spark, "stress_fg")
      .select(col("component").as("_vid")).distinct()
    val candSid = fdeg.join(labels, Seq("_vid"), "left_anti")
    val rawIds = verts.select(col("id"),
      xxhash64(col("id").cast("string")).as("_vid"))
    // HIGH id range, so the erase cannot consume the forest-cut batch's
    // (low-id-biased) edges measured below
    val eraseBatch = rawIds.join(candSid, Seq("_vid"), "left_semi")
      .select(col("id")).orderBy(col("id").desc).limit(100).localCheckpoint()
    println(s"FORESTGUARD fast-erase batch=${eraseBatch.count()}")
    timed("delete-vertices-fast(100)") {
      graft.sources.GraphIO.deleteVertices(spark, "stress_fg", eraseBatch)
    }
    // contrast: certificate-INTERIOR vertices (2+ forest edges) force
    // the full bounded repair — ≈ CC + re-span here by construction.
    // Read the forest FRESH: the erase above swapped the table files,
    // and the pre-erase frame pins the old listing (and old rows)
    val fAfter = graft.sources.GraphIO.readForest(spark, "stress_fg")
    val interior = fAfter.select(col("src").as("_vid"))
      .unionAll(fAfter.select(col("dst").as("_vid")))
      .groupBy(col("_vid")).agg(count(lit(1)).as("_d"))
      .filter(col("_d") >= 2L).select(col("_vid"))
    val slowBatch = rawIds.join(interior, Seq("_vid"), "left_semi")
      .join(eraseBatch, Seq("id"), "left_anti")
      .select(col("id")).orderBy(col("id").desc).limit(10).localCheckpoint()
    println(s"FORESTGUARD interior-erase batch=${slowBatch.count()}")
    timed("delete-vertices-repair(10)") {
      graft.sources.GraphIO.deleteVertices(spark, "stress_fg", slowBatch)
    }
    // the still-honest row: a real cut pays the bounded repair (≈ full
    // CC here by construction — the guard's point is paying it only
    // when an actual cut demands it)
    timed("delete-forestcut(10)") {
      graft.sources.GraphIO.deleteEdges(spark, "stress_fg", forestBatch)
    }
    val c1 = graft.sources.GraphIO.readComponents(spark, "stress_fg")
      .select(col("component")).distinct().count()
    timed("full-refresh") {
      graft.sources.GraphIO.refreshComponents(spark, "stress_fg")
    }
    val c2 = graft.sources.GraphIO.readComponents(spark, "stress_fg")
      .select(col("component")).distinct().count()
    println(s"FORESTGUARD components repaired=$c1 refreshed=$c2 (equal=${c1 == c2})")
    Seq("vertices", "edges", "degrees", "components", "forest").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS stress_fg_$t"))
    spark.sql("DROP TABLE IF EXISTS stress_fg__epoch")
    spark.stop()
  }
}

/** args: SF_DIR [GROWTH]. AnnIndex quantizer drift at corpus scale
  * (VERDICT r12 item 4): build the IVF index over the embeddings
  * table, append GROWTH× the corpus as a SHIFTED distribution (every
  * component displaced by +4 — a new region the frozen quantizer never
  * partitioned), and measure what drift costs and what the triggered
  * re-fit restores: driftStats before/after, probe recall@10 against
  * brute force for shifted queries, and the probed-list fat-cell
  * fraction the over-scan rides on.
  */
object AnnDriftStress {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val growth = if (args.length > 1) args(1).toInt else 3
    val spark = Round13Tools.session()
    import graft.similarity.{Ann, AnnIndex}
    val items = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    val n = items.count()
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"ANNDRIFT $label%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val k = math.max(8, math.sqrt(n.toDouble).toInt / 4)
    val idx = timed(s"build(n=$n,k=$k)") {
      val b = AnnIndex.build(items, "vec_id", "embedding", k = k,
        maxIterations = 4, fitSampleSize = 4096)
      b.cells.count(); b
    }
    // shifted ingest: GROWTH norm-preserving transforms (reverse /
    // negate / both) — genuinely new regions for the frozen quantizer
    // WITHOUT inflating norms (an additive shift would turn dot-product
    // retrieval into scattered MIPS, which no IVF partition serves —
    // measured: recall 0.02 post-refit on that construction)
    val variants = Seq[org.apache.spark.sql.Column => org.apache.spark.sql.Column](
      e => reverse(e),
      e => transform(e, x => -x),
      e => reverse(transform(e, x => -x)))
    val shifted = (1 to growth).map { g =>
      items.select((col("vec_id") + lit(g * 100000000L)).as("vec_id"),
        variants((g - 1) % 3)(col("embedding")).as("embedding"))
    }.reduce(_ unionByName _).localCheckpoint()
    val drifted = timed(s"append(${shifted.count()})") {
      val a = AnnIndex.append(idx, shifted, "vec_id", "embedding")
      AnnIndex.Index(a.centroids, a.cells.localCheckpoint())
    }
    def stats(label: String, ix: AnnIndex.Index): Unit = {
      val s = AnnIndex.driftStats(ix).head()
      val g = s.getAs[Double]("growth")
      val im = s.getAs[Double]("imbalance_now")
      val sk = s.getAs[Double]("growth_skew")
      println(f"ANNDRIFT stats[$label] growth=$g%.2f imbalance_now=$im%.2f growth_skew=$sk%.2f")
    }
    def recall(ix: AnnIndex.Index, qs: org.apache.spark.sql.DataFrame,
        nprobe: Int = 4): Double = {
      val truth = Ann.bruteForceTopK(
        ix.cells.select(col("id").as("vec_id"), col("v").as("embedding")),
        qs, "vec_id", "embedding", k = 10)
        .select(col("qid"), col("nid")).collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      val got = ix.topK(qs, "vec_id", "embedding", k = 10, nprobe = nprobe)
        .select(col("qid"), col("nid")).collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      truth.map { case (q, t) => (got.getOrElse(q, Set.empty) & t).size }.sum
        .toDouble / truth.map(_._2.size).sum
    }
    val qs = shifted.orderBy(col("vec_id")).limit(50).localCheckpoint()
    stats("drifted", drifted)
    val rBefore = timed("recall-drifted") { recall(drifted, qs) }
    val (refit, rebuilt) = timed("rebuildIfDrifted") {
      val r = AnnIndex.rebuildIfDrifted(drifted, maxIterations = 4,
        fitSampleSize = 4096)
      r._1.cells.count(); r
    }
    println(s"ANNDRIFT rebuilt=$rebuilt k_after=${refit.centroids.count()}")
    stats("refit", refit)
    val rAfter = timed("recall-refit") { recall(refit, qs) }
    // equal-scan-budget comparison: the refit has ~2x the cells, so the
    // same fraction of the corpus is nprobe x (k_after/k_before)
    val npEq = math.max(4, (4.0 * refit.centroids.count() / k).round.toInt)
    val rAfterEq = timed(s"recall-refit-np$npEq") { recall(refit, qs, npEq) }
    println(f"ANNDRIFT recall@10 drifted/np4=$rBefore%.3f refit/np4=$rAfter%.3f " +
      f"refit/np$npEq=$rAfterEq%.3f")
    spark.stop()
  }
}

private object Round13Tools {
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
