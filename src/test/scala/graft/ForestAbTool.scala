import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-JVM A/B of the parentForest symmetric-closure pin strategy
  * (throwaway measurement harness for VERDICT r14 item 3):
  *
  *   sbt 'Test/runMain ForestAbTool /tmp/sfx10 2'
  *
  * This host's band swings 2–4.5× BETWEEN runs, so a cross-run
  * comparison of "localCheckpoint sym" vs "repartition+persist sym"
  * measures the band, not the code. Here both variants run alternated
  * inside one JVM (A B A B …), each a full multi-source BFS span over
  * the sfx corpus from the global min-id root — the alternation cancels
  * slow drift and the per-variant MIN cancels bursts.
  */
object ForestAbTool {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = Round15Tools.session()
    val raw = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey").cast("long").as("src"),
        (col("l_partkey").cast("long") + 4000000000L).as("dst"))
      .distinct()
      .localCheckpoint()
    val root = raw.agg(min(col("src"))).head().getLong(0)
    import spark.implicits._
    val roots = Seq(root).toDF("id").localCheckpoint()

    // the BFS loop of BreadthFirstSearch.parentForest, parameterized by
    // how `sym` is pinned (everything else identical)
    def span(label: String, pinSym: DataFrame => DataFrame): Double = {
      val t0 = System.nanoTime()
      val sym = pinSym(
        raw.select(col("src"), col("dst"))
          .union(raw.select(col("dst").as("src"), col("src").as("dst")))
          .filter(col("src") =!= col("dst")))
      var visited = roots
      var frontier = visited
      var forestRows = 0L
      var n = 1L
      var depth = 0
      while (depth < 64 && n > 0L) {
        depth += 1
        val reached =
          sym.join(frontier.select(col("id").as("src")), "src")
            .groupBy(col("dst").as("id")).agg(min(col("src")).as("_parent"))
            .join(visited, Seq("id"), "left_anti")
            .localCheckpoint()
        n = reached.count()
        forestRows += n
        frontier = reached.select(col("id"))
        visited = visited.unionByName(frontier).localCheckpoint()
      }
      sym.unpersist(blocking = true)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"FORESTAB $label%-12s depth=$depth%2d rows=$forestRows ${sec}%8.2f s")
      sec
    }

    val a = scala.collection.mutable.ArrayBuffer.empty[Double]
    val b = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (_ <- 1 to reps) {
      a += span("localckpt", df => df.localCheckpoint())
      b += span("repart+persist", { df =>
        val p = df.repartition(col("src"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        p.count() // materialize now so round 1 isn't charged the build
        p
      })
    }
    println(f"FORESTAB min localckpt=${a.min}%.2f s  repart+persist=${b.min}%.2f s  " +
      f"ratio=${b.min / a.min}%.3f")
    spark.stop()
  }
}
