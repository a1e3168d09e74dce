package graft.sources

import org.apache.spark.sql.SparkSession

import graft.core.Graph

/** Parquet persistence for graphs — the library's source/sink pair.
  *
  * Layout: `<path>/vertices/` and `<path>/edges/` parquet datasets plus
  * `<path>/_graft_meta/` (a one-row dataset holding the directedness
  * flag), all written through the standard parquet writer so the usual
  * levers apply (partition count = write parallelism, predicate pushdown
  * and column pruning on read).
  *
  * `partitionByKey = true` buckets nothing but *sorts-within-partitions
  * and repartitions* edges by `src` on write, so a later read feeds
  * src-keyed joins/aggregations with co-located data and parquet row-group
  * min/max stats prune src-range scans.
  */
object GraphIO {

  def write(g: Graph, path: String, partitionByKey: Boolean = false): Unit = {
    import g.vertices.sparkSession.implicits._
    g.vertices.write.mode("overwrite").parquet(s"$path/vertices")
    val e = if (partitionByKey)
      g.edges.repartition(g.edges("src")).sortWithinPartitions("src")
    else g.edges
    e.write.mode("overwrite").parquet(s"$path/edges")
    Seq(g.directed).toDF("directed")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/_graft_meta")
  }

  def read(spark: SparkSession, path: String): Graph = {
    val directed = spark.read.parquet(s"$path/_graft_meta")
      .head().getBoolean(0)
    Graph(
      spark.read.parquet(s"$path/vertices"),
      spark.read.parquet(s"$path/edges"),
      directed)
  }
}
