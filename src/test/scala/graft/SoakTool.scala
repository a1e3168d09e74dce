import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{CheckpointPolicy, Columns, Graph}
import graft.pregel.Pregel

/** Dev harness (test scope only): deep-iteration Pregel soak. Runs a
  * distance propagation down a long chain for `iters` supersteps with
  * `CheckpointPolicy.Reliable`, printing per-superstep wall time — flat
  * times across 50+ supersteps are the evidence that lineage stays O(1)
  * and reliable checkpointing doesn't accumulate cost. Also reports the
  * checkpoint directory's final size (bounded iff old checkpoints are
  * cleaned as state pins go out of scope).
  *
  *   sbt 'Test/runMain PregelSoak 250000 60'
  */
object PregelSoak {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 250000L
    val iters = if (args.length > 1) args(1).toInt else 60
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val ckDir = s"/tmp/graft_soak_ck_$n"
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // release checkpoint files once their pinned frame is unreachable —
      // without this a deep run's checkpoint dir grows linearly forever
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.setCheckpointDir(ckDir)
    import Columns._

    val vs = spark.range(n).select(col("id"))
    val es = spark.range(n - 1)
      .select(col("id").as(SRC), (col("id") + 1L).as(DST),
        col("id").as(EDGE_ID))
    val g = Graph(vs, es, directed = true)

    val times = scala.collection.mutable.ArrayBuffer.empty[Double]
    val pregel = Pregel(
      initialState = when(col(ID) === 0L, lit(0L)).otherwise(lit(null).cast("long")),
      aggExpr = min(col(MSG)),
      msgToDst = Some(col(STATE) + 1L),
      updateExpr = Some(least(col(STATE), col(MSG))),
      maxIterations = iters,
      checkpoint = CheckpointPolicy.Reliable,
      superstepListener = Some { (i, sec) =>
        times += sec
        println(f"SOAK step $i%3d  $sec%6.2f s")
        if (i % 10 == 0) System.gc() // let the cleaner drop old checkpoints
      })
    val res = pregel.runWithStatus(g)
    val rows = res.state.count()

    val head = times.slice(1, 11)
    val tail = times.takeRight(10)
    def mean(xs: Seq[Double]) = xs.sum / xs.size
    val du = {
      val d = new java.io.File(ckDir)
      def size(f: java.io.File): Long =
        if (f.isFile) f.length
        else Option(f.listFiles).map(_.map(size).sum).getOrElse(0L)
      size(d)
    }
    println(f"SOAK summary: $iters steps, state rows=$rows, " +
      f"steps 2-11 mean=${mean(head.toSeq)}%.2f s, last-10 mean=${mean(tail.toSeq)}%.2f s, " +
      f"ratio=${mean(tail.toSeq) / mean(head.toSeq)}%.2f, checkpoint dir=${du / 1e6}%.1f MB")
    spark.stop()
  }
}
