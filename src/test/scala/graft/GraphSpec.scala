package graft

import org.apache.spark.sql.functions._

import graft.core.{Columns, Graph, GraphUtil}
import graft.algorithms.TriangleCount

class GraphSpec extends SparkSpec {
  import Columns._

  test("index assigns long ids, dedups, keeps originals, re-keys edges") {
    val g = Fixtures.sample1(spark)
    assert(g.vertices.count() === 6)
    assert(g.edges.count() === 7)
    assert(g.vertices.columns.toSet === Set(OLD_ID, ID))
    assert(Set(EDGE_ID, SRC, DST, OLD_SRC, OLD_DST, "nine").subsetOf(g.edges.columns.toSet))
    // ids deterministic: rebuilding yields identical assignment
    val g2 = Fixtures.sample1(spark)
    assert(rowSet(g.vertices) === rowSet(g2.vertices))
    assert(rowSet(g.edges) === rowSet(g2.edges))
    // edge ids unique
    assert(g.edges.select(EDGE_ID).distinct().count() === 7)
  }

  test("index drops edges with endpoints missing from the vertex table") {
    import spark.implicits._
    val g = Graph.index(
      Seq("a", "b").toDF("id"),
      Seq("a" -> "b", "a" -> "zz").toDF("src", "dst"))
    assert(g.edges.count() === 1)
  }

  test("index rejects reserved columns") {
    import spark.implicits._
    val v = Seq("a").toDF("id").withColumn(OLD_ID, col("id"))
    intercept[IllegalArgumentException] {
      Graph.index(v, Seq("a" -> "a").toDF("src", "dst"))
    }
  }

  test("adjacency includes isolated vertices with empty arrays") {
    val g = Fixtures.sample1(spark)
    val adj = g.adjacency.collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(adj.size === 6)
    val idOf = g.vertices.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(adj(idOf("f")) === Set.empty)
    assert(adj(idOf("a")) === Set(idOf("b"), idOf("c")))
    assert(adj(idOf("b")) === Set(idOf("a"), idOf("c"), idOf("d"), idOf("e")))
  }

  test("undirected adjacency unions reversed edges") {
    val g = Fixtures.sample1(spark, directed = false)
    val adj = g.adjacency.collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val idOf = g.vertices.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(adj(idOf("d")) === Set(idOf("b"), idOf("e")))
  }

  test("degrees: directed = out-degree, undirected = neighbour-set size") {
    val g = Fixtures.sample1(spark)
    val idOf = g.vertices.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val outd = g.outDegrees.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(outd(idOf("b")) === 4)
    val ind = g.inDegrees.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ind(idOf("d")) === 2)
    val und = Fixtures.sample1(spark, directed = false)
      .degrees.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(und(idOf("f")) === 0)
    assert(und(idOf("b")) === 4) // a,c,d,e (dedup of b->a and a->b)
  }

  test("triplets widens edges with prefixed vertex attributes") {
    val g = Fixtures.labelled(spark)
    val t = g.triplets("s_", "d_")
    assert(t.count() === 5)
    assert(t.columns.contains("s_label") && t.columns.contains("d_label"))
    val pairs = t.select("s_label", "d_label").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs === Set(("a", "b"), ("b", "c"), ("c", "a"), ("d", "e"), ("d", "f")))
  }

  test("orderEdges canonicalizes: no self-loops, ascending, deduped") {
    import spark.implicits._
    val e = Seq((3L, 1L), (1L, 3L), (2L, 2L), (1L, 2L)).toDF("src", "dst")
    assert(rowSet(GraphUtil.orderEdges(e)) === Set(Seq(1L, 3L), Seq(1L, 2L)))
  }

  test("triangle count: sample1 = 2, twoComponents = 1 (golden, test_triangle_count.py)") {
    assert(TriangleCount().run(Fixtures.sample1(spark)) === 2L)
    assert(TriangleCount().run(Fixtures.twoComponents(spark)) === 1L)
  }

  test("per-vertex triangle counts on sample1 match hand-enumeration") {
    // sample1 (undirected): triangles {a,b,c} and {b,d,e}
    val g = Fixtures.sample1(spark, directed = false)
    val got = graft.algorithms.TriangleCount.perVertex(g)
      .join(g.vertices, Seq("id"))
      .collect().map(r => r.getAs[String]("old_id") -> r.getAs[Long]("n_triangles"))
      .toMap
    assert(got === Map("a" -> 1L, "b" -> 2L, "c" -> 1L, "d" -> 1L, "e" -> 1L))
  }

  test("withVertexColumn is immutable and chainable") {
    val g = Fixtures.sample1(spark)
    val g2 = g.withVertexColumn("deg2", lit(1))
    assert(!g.vertices.columns.contains("deg2"))
    assert(g2.vertices.columns.contains("deg2"))
  }
}
