import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{CheckpointPolicy, Columns, Graph}
import graft.sources.GraphIO

/** Dev harness (test scope only): the write-once-shuffle-then-iterate
  * measurement — PageRank over the orders graph read three ways:
  *
  *   A. plain frames, routes localCheckpoint-pinned (the g21 default);
  *   B. bucketed catalog table + CheckpointPolicy.Passthrough for the
  *      routing table (per-round src join re-reads the bucketed layout
  *      with zero exchange);
  *
  * plus the one-off bucketed write cost, which at 100 TB is paid once
  * for MANY iterative jobs.
  *
  *   sbt 'Test/runMain BucketedPr /tmp/sfx100 [iterations]'
  */
object BucketedPr {
  import Columns._

  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val iters = if (args.length > 1) args(1).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the g21 graph, DIRECTED so the bucketed layout survives (an
    // undirected run unions reversed edges and re-shuffles anyway)
    val e = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_custkey").as(SRC), pmod(col("o_orderkey"), lit(211)).as(DST))
      .distinct()
    val v = e.select(col(SRC).as(ID)).union(e.select(col(DST))).distinct()
    val g = Graph(v, e.withColumn(EDGE_ID, xxhash64(col(SRC), col(DST))),
      directed = true)

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"BUCKPR $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val plain = time("plain (Local routes)") {
      PageRankRun(g, iters, None)
    }
    time("writeBucketed (one-off)") {
      GraphIO.writeBucketed(g, "bkpr_orders", buckets = cpus.toInt)
    }
    val back = GraphIO.readBucketed(spark, "bkpr_orders")
    val bucketed = time("bucketed (Passthrough routes)") {
      PageRankRun(back, iters, Some(CheckpointPolicy.Passthrough))
    }
    val diff = plain.join(bucketed.withColumnRenamed("rank", "r2"), Seq(ID))
      .agg(max(abs(col("rank") - col("r2")))).head().getDouble(0)
    println(f"BUCKPR max |rank diff| = $diff%.3e")
    spark.sql("DROP TABLE IF EXISTS bkpr_orders_edges")
    spark.sql("DROP TABLE IF EXISTS bkpr_orders_vertices")
    spark.stop()
  }

  private def PageRankRun(g: Graph, iters: Int,
      static: Option[CheckpointPolicy]) = {
    val r = graft.algorithms.PageRank(maxIterations = iters,
      staticCheckpoint = static).run(g)
    r.count() // materialize
    r
  }
}
