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
      spark.sql("DROP TABLE IF EXISTS bk_g1_degrees")
    }
  }

  test("PageRank over a bucketed edge table: routes build plans ZERO exchange, ranks match") {
    import org.apache.spark.sql.functions._
    val g = Fixtures.sample1(spark, directed = true)
    GraphIO.writeBucketed(g, "bk_pr", buckets = 4)
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the exchange count below reflects the
      // partitioning story, not tiny-table broadcasting
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val back = GraphIO.readBucketed(spark, "bk_pr")
      val pr = PageRank(maxIterations = 8)

      // the whole routes build (out-degree agg + src-keyed join) reuses
      // the write-time bucketing: no exchange anywhere in the plan
      val r = pr.routes(back)
      r.collect()
      val p = r.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucketed routes build must not shuffle:\n$p")

      // the per-round message join with the UNPINNED routes plan (the
      // CheckpointPolicy.Passthrough mode for bucketed storage): the
      // routes side re-reads the bucketed table with no exchange, and —
      // since writeBucketed buckets the VERTICES by id with the same
      // bucket count — the rank side is already co-partitioned with the
      // src-bucketed routes, so a round costs exactly ONE exchange: the
      // inherent message groupBy(dst). NONE on the (100 TB-sized) edge
      // routing table, none on the rank side. A localCheckpoint of
      // routes would NOT do this: under AQE the checkpointed frame
      // reports UnknownPartitioning and the src exchange returns.
      val routes2 = pr.routes(back)
      val rank = back.vertices.select(col("id"), lit(1.0).as("rank"))
      val contrib = rank.join(routes2, rank("id") === routes2("src"))
        .groupBy(col("dst")).agg(sum(col("rank") * col("_share")).as("_in"))
      contrib.collect()
      // AQE prints Final + Initial plans; count the executed (final) one
      val pc = contrib.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert("Exchange hashpartitioning".r.findAllIn(pc).size === 1,
        s"bucketed round = the message exchange only:\n$pc")

      // end to end: bucketed-run ranks equal the plain-run ranks
      val a = pr.run(back).collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
      val b = pr.run(g).collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
      assert(a.keySet === b.keySet)
      a.foreach { case (id, v) => assert(math.abs(v - b(id)) < 1e-12, s"id $id") }
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS bk_pr_edges")
      spark.sql("DROP TABLE IF EXISTS bk_pr_vertices")
      spark.sql("DROP TABLE IF EXISTS bk_pr_degrees")
    }
  }

  test("stagedOverwrite recovery: a pending rename is completed, not deleted") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val t = "so_crash_t"
    Seq(s"$t", s"${t}__staged").foreach(x => spark.sql(s"DROP TABLE IF EXISTS `$x`"))
    try {
      // simulate the crash window of a prior mutation: the replacement
      // fully committed to __staged, the live table already dropped,
      // the rename never issued — __staged is the ONLY copy
      Seq(10L, 20L, 30L).toDF("x").write.saveAsTable(s"${t}__staged")
      // the retry's write derives its contents FROM the live table —
      // exactly the read that blind staged-clearing would break twice
      // over (staged copy destroyed AND the source table missing)
      graft.sources.CatalogTables.stagedOverwrite(spark, t) { staged =>
        spark.table(t).select((col("x") + 1).as("x"))
          .localCheckpoint().write.saveAsTable(staged)
      }
      assert(spark.table(t).collect().map(_.getLong(0)).toSet === Set(11L, 21L, 31L))
      assert(!spark.catalog.tableExists(s"${t}__staged"))
    } finally
      Seq(s"$t", s"${t}__staged").foreach(x => spark.sql(s"DROP TABLE IF EXISTS `$x`"))
  }

  test("family epoch guard: mutations bump the generation; a concurrent commit aborts, tables intact") {
    import graft.sources.CatalogTables
    val name = "epoch_g1"
    def dropAll(): Unit =
      Seq("_vertices", "_edges", "_degrees", "_components", "_ranks", "__epoch")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$name$t`"))
    dropAll()
    try {
      val g = Fixtures.sample1(spark, directed = true)
      GraphIO.writeBucketed(g, name, buckets = 4)
      assert(CatalogTables.familyEpoch(spark, name) === 1L,
        "initial build must advance the family from generation 0")
      GraphIO.refreshDegrees(spark, name)
      assert(CatalogTables.familyEpoch(spark, name) === 2L,
        "every committed mutation bumps exactly once")
      // SECOND WRITER: while a guarded mutation is in flight, another
      // process commits (emulated by advancing the generation directly,
      // exactly what its final bump would do). The in-flight mutation's
      // next staged swap must abort BEFORE clobbering that commit.
      val before = rowSet(spark.table(s"${name}_degrees"))
      val ex = intercept[java.util.ConcurrentModificationException] {
        CatalogTables.withFamilyEpochGuard(spark, name) {
          spark.sql(
            s"ALTER TABLE `${name}__epoch` SET TBLPROPERTIES('graft.epoch' = '3')")
          CatalogTables.stagedOverwrite(spark, s"${name}_degrees") { t =>
            spark.sql("SELECT CAST(1 AS BIGINT) AS id, CAST(99 AS BIGINT) AS out_degree, CAST(99 AS BIGINT) AS in_degree")
              .write.saveAsTable(t)
          }
        }
      }
      assert(ex.getMessage.contains("another writer"))
      assert(rowSet(spark.table(s"${name}_degrees")) === before,
        "the aborted mutation must not have touched the data tables")
      assert(CatalogTables.familyEpoch(spark, name) === 3L,
        "the surviving writer's generation stands; the aborted one never bumped")
      // an INSERT-only mutation (no staged swap to check at) is caught
      // by the final check-and-bump instead
      val ex2 = intercept[java.util.ConcurrentModificationException] {
        CatalogTables.withFamilyEpochGuard(spark, name) {
          spark.sql(
            s"ALTER TABLE `${name}__epoch` SET TBLPROPERTIES('graft.epoch' = '9')")
        }
      }
      assert(ex2.getMessage.contains("another writer"))
      // and a clean guarded mutation still commits + bumps afterwards
      GraphIO.refreshDegrees(spark, name)
      assert(CatalogTables.familyEpoch(spark, name) === 10L)
    } finally dropAll()
  }

  test("epoch-conflict retry: the aborted mutation re-invokes cleanly; end state ≡ sequential A-then-B") {
    import graft.sources.CatalogTables
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val name = "epoch_retry"
    def dropAll(): Unit =
      Seq("_left", "_right", "_right__staged", "__epoch")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$name$t`"))
    dropAll()
    try {
      Seq(1L).toDF("x").write.saveAsTable(s"${name}_left")
      Seq(1L).toDF("x").write.saveAsTable(s"${name}_right")
      // writer A's full commit, emulated as the other process would
      // interleave it: write its table, bump the generation
      def writerACommits(): Unit = {
        Seq(100L).toDF("x").write.mode("overwrite").saveAsTable(s"${name}_left")
        val e = CatalogTables.familyEpoch(spark, name)
        if (!spark.catalog.tableExists(s"${name}__epoch"))
          spark.sql(s"CREATE TABLE `${name}__epoch` (epoch BIGINT) USING parquet")
        spark.sql(
          s"ALTER TABLE `${name}__epoch` SET TBLPROPERTIES('graft.epoch' = '${e + 1}')")
      }
      // writer B's mutation — the SAME body both times, exactly what a
      // caller re-invokes after catching the abort
      def writerB(): Unit = CatalogTables.withFamilyEpochGuard(spark, name) {
        CatalogTables.stagedOverwrite(spark, s"${name}_right") { t =>
          spark.table(s"${name}_right").select((col("x") + 10L).as("x"))
            .localCheckpoint().write.saveAsTable(t)
        }
      }
      // first invocation: A commits mid-B → B aborts, its swap unpublished
      intercept[java.util.ConcurrentModificationException] {
        CatalogTables.withFamilyEpochGuard(spark, name) {
          writerACommits()
          CatalogTables.stagedOverwrite(spark, s"${name}_right") { t =>
            spark.table(s"${name}_right").select((col("x") + 10L).as("x"))
              .localCheckpoint().write.saveAsTable(t)
          }
        }
      }
      assert(spark.table(s"${name}_right").collect().map(_.getLong(0)).toSeq === Seq(1L),
        "the aborted swap must not have published")
      assert(spark.table(s"${name}_left").collect().map(_.getLong(0)).toSeq === Seq(100L),
        "the survivor's commit stands")
      // the RETRY CONTRACT: the same mutation, re-invoked against the
      // advanced generation, simply succeeds — no manual cleanup needed
      writerB()
      assert(spark.table(s"${name}_right").collect().map(_.getLong(0)).toSeq === Seq(11L),
        "the retried mutation commits over the advanced generation")
      assert(spark.table(s"${name}_left").collect().map(_.getLong(0)).toSeq === Seq(100L))
      assert(!spark.catalog.tableExists(s"${name}_right__staged"),
        "no staged debris survives the abort-then-retry cycle")
    } finally dropAll()
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
