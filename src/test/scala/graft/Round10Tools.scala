import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harnesses (test scope) for the round-10 BASELINE.md evidence:
  * the pigeonhole hot-bucket cap under a planted degenerate cluster,
  * and native BPE throughput at a 1k-entry merge table.
  */
object HotBucketStress {

  /** args: SF_DIR N_PLANTED [CAP]. Unions N_PLANTED identical templated
    * docs into the corpus — every one of their 4 simhash chunks lands in
    * the same (chunk, value) buckets, so the UNCAPPED candidate join
    * owes N²/2 pairs from that bucket alone — and times the CAPPED run
    * (recall contract: the planted cluster is exactGroups' job).
    */
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val n = args(1).toLong
    val cap = if (args.length > 2) args(2).toInt else 64
    val spark = session()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val boiler = "this content is provided as is without warranty of any " +
      "kind either express or implied including fitness for a purpose"
    val planted = spark.range(n)
      .select((col("id") + 5000000000000L).as("doc_id"), lit(boiler).as("text"))
    val corpus = docs.union(planted).localCheckpoint()
    println(s"HOTBUCKET corpus=${corpus.count()} planted=$n cap=$cap")
    val t0 = System.nanoTime()
    val pairs = graft.dedup.Dedup.simhashDuplicates(
      corpus, "doc_id", "text", maxDist = 3, portableHash = false,
      maxBucketSize = cap).count()
    val label = if (cap > 0) "capped" else "UNCAPPED"
    println(f"HOTBUCKET $label%-8s ${(System.nanoTime() - t0) / 1e9}%8.2f s  pairs=$pairs")
    spark.stop()
  }

  private[this] def session(): SparkSession = Round10Tools.session()
}

object BpeThroughput {

  /** args: SF_DIR. Times three BPE counting forms over the full
    * documents table (forced through an aggregation so projection
    * pruning cannot skip the work): the 40-merge replace chain, the
    * 40-merge native expression, and the native expression with a
    * generated 1000-merge table — the vocabulary scale the plan-bound
    * chain cannot express at all.
    */
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = session()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("text")).localCheckpoint()
    println(s"BPE docs=${docs.count()}")
    val rnd = new scala.util.Random(13)
    val pool = scala.collection.mutable.ArrayBuffer[String](
      "abcdefghijklmnopqrstuvwxyz".map(_.toString): _*)
    val big = (0 until 1000).map { _ =>
      val a = pool(rnd.nextInt(pool.length))
      val b = pool(rnd.nextInt(pool.length))
      pool += (a + b)
      (a, b)
    }
    def time(label: String, c: org.apache.spark.sql.Column): Unit = {
      val t0 = System.nanoTime()
      val s = docs.agg(sum(c)).head().getLong(0)
      println(f"BPE $label%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s  sum=$s")
    }
    import graft.text.TextFunctions
    time("chain-40", TextFunctions.bpeTokenCount(col("text")).cast("long"))
    time("native-40", TextFunctions.bpeTokenCountExact(col("text")).cast("long"))
    time("native-1000", TextFunctions.bpeTokenCountExact(col("text"), big).cast("long"))
    spark.stop()
  }

  private[this] def session(): SparkSession = Round10Tools.session()
}

private object Round10Tools {
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
