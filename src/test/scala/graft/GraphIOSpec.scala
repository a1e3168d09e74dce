package graft

import graft.algorithms.PageRank
import graft.sources.GraphIO

class GraphIOSpec extends SparkSpec {

  test("graph parquet round-trip preserves frames and directedness") {
    val g = Fixtures.sample1(spark, directed = false)
    val path = java.nio.file.Files.createTempDirectory("graftio").toString + "/g1"
    GraphIO.write(g, path, partitionByKey = true)
    val back = GraphIO.read(spark, path)
    assert(back.directed === g.directed)
    assert(rowSet(back.vertices) === rowSet(g.vertices))
    assert(rowSet(back.edges) === rowSet(g.edges))
  }

  test("bucketed edges: round-trip + src self-join runs with NO exchange") {
    import org.apache.spark.sql.functions._
    val g = Fixtures.sample1(spark, directed = true)
    GraphIO.writeBucketed(g, "bk_g1", buckets = 4)
    try {
      val back = GraphIO.readBucketed(spark, "bk_g1")
      assert(back.directed === g.directed)
      assert(rowSet(back.vertices) === rowSet(g.vertices))
      assert(rowSet(back.edges) === rowSet(g.edges))
      // the payoff: a src-keyed self-join over the bucketed table plans
      // ZERO shuffles — the write-time bucketing is the exchange
      val e = back.edges.select(col("src"), col("dst"))
      val joined = e.as("a").join(e.as("b"), "src")
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucketed src join must not shuffle:\n$p")
      // and a src-keyed aggregation doesn't shuffle either
      val agg = back.edges.groupBy(col("src")).count()
      agg.collect()
      val p2 = agg.queryExecution.executedPlan.toString
      assert(!p2.contains("Exchange hashpartitioning"),
        s"bucketed src aggregation must not shuffle:\n$p2")
    } finally {
      spark.sql("DROP TABLE IF EXISTS bk_g1_edges")
      spark.sql("DROP TABLE IF EXISTS bk_g1_vertices")
    }
  }

  test("edge-list text ingestion: comments skipped, ids indexed, dups collapse") {
    val dir = java.nio.file.Files.createTempDirectory("graft-edgelist")
    java.nio.file.Files.writeString(dir.resolve("g.tsv"),
      "# snap-style comment\na\tb\nb\tc\na\tb\nc\ta\n")
    val g = graft.sources.GraphIO.readEdgeList(spark, dir.toString)
    assert(g.vertices.count() === 3)
    assert(g.edges.count() === 3, "duplicate a->b must collapse")
    // structure survives re-keying: the 3-cycle is one component
    val cc = graft.algorithms.ConnectedComponents().run(g)
    assert(cc.select("component").distinct().count() === 1)
  }

  test("PageRank: hub of a directed star collects the rank") {
    import spark.implicits._
    // star: 1..5 -> 0; vertex 0 is dangling
    val g = graft.core.Graph.index(
      (0L to 5L).toDF("id"),
      (1L to 5L).map(s => (s, 0L)).toDF("src", "dst"),
      directed = true)
    val pr = PageRank(maxIterations = 20).run(g)
      .join(g.vertices.select($"id", $"old_id"), Seq("id"))
      .select($"old_id", $"rank")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val leafRank = pr.filterKeys(_ != 0L).values
    assert(pr(0L) > leafRank.max * 2, s"hub should dominate: $pr")
    // leaves are symmetric
    assert(leafRank.max - leafRank.min < 1e-12)
    assert(math.abs(pr.values.sum - 1.0) < 1e-9)
  }
}
