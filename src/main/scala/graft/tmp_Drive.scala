import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Graph
import graft.algorithms._

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val edges = orders.select(col("o_custkey").as("src"), pmod(col("o_orderkey"), lit(200)).as("dst"))
    val verts = edges.select(col("src").as("id")).union(edges.select(col("dst"))).distinct()
    val g = Graph.index(verts, edges, directed = false)
    println("[drive] vertices=" + g.vertices.count() + " edges=" + g.edges.count())
    println("[drive] triangles=" + TriangleCount().run(g))
    val cc = ConnectedComponents(maxIterations = 20).run(g)
    println("[drive] pregel components=" + cc.select("component").distinct().count())
    val acc = AlternatingConnectedComponents(maxIterations = 20).run(g)
    println("[drive] alternating components=" + acc.select("component").distinct().count())
    spark.stop()
  }
}
