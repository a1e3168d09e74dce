package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Graph

/** Shared one-session-per-suite harness (cf. reference tests/spark_test.py:6-15). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session

  /** order-insensitive row comparison */
  def rowSet(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      // legacy events layouts store TIMESTAMP(NANOS); read those as raw long ns, the
      // same convention Verify/Bench run under
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

/** Canonical sample graphs — port of reference tests/samples.py:6-35. */
object Fixtures {
  import org.apache.spark.sql.functions._

  private def g(spark: SparkSession,
      vs: Seq[String], es: Seq[(String, String)], directed: Boolean): Graph = {
    import spark.implicits._
    Graph.index(
      vs.toDF("id"),
      es.toDF("src", "dst").withColumn("nine", lit(9)),
      directed)
  }

  /** samples.py:6-11 — 6 vertices a..f, 7 edges incl back-edge b->a; 2 triangles */
  def sample1(spark: SparkSession, directed: Boolean = true): Graph =
    g(spark, Seq("a", "b", "c", "d", "e", "f"),
      Seq("a" -> "b", "a" -> "c", "b" -> "d", "b" -> "c", "b" -> "e", "e" -> "d", "b" -> "a"),
      directed)

  /** samples.py:14-19 — chain with one 3-cycle */
  def sample2(spark: SparkSession, directed: Boolean = true): Graph =
    g(spark, Seq("a", "b", "c", "d", "e", "f"),
      Seq("a" -> "b", "b" -> "c", "c" -> "a", "c" -> "d", "d" -> "e", "e" -> "f"),
      directed)

  /** samples.py:22-27 — 3-cycle {a,b,c} + star {d,e,f}; 1 triangle */
  def twoComponents(spark: SparkSession, directed: Boolean = true): Graph =
    g(spark, Seq("a", "b", "c", "d", "e", "f"),
      Seq("a" -> "b", "b" -> "c", "c" -> "a", "d" -> "e", "d" -> "f"),
      directed)

  /** samples.py:30-35 — long ids 0..5 with a string label column */
  def labelled(spark: SparkSession, directed: Boolean = true): Graph = {
    import spark.implicits._
    Graph.index(
      Seq((0L, "a"), (1L, "b"), (2L, "c"), (3L, "d"), (4L, "e"), (5L, "f"))
        .toDF("id", "label"),
      Seq((0L, 1L), (1L, 2L), (2L, 0L), (3L, 4L), (3L, 5L)).toDF("src", "dst"),
      directed)
  }
}
