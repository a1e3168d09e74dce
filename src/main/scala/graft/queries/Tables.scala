package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet table loaders for the driver testdata layout
  * (`/root/testdata/sf{0.001,0.01,0.1}/<table>.parquet`, repo:TESTDATA.md).
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  /** `events` with `ts` normalized to LONG epoch NANOseconds regardless of
    * the physical parquet type. Generator layouts seen so far: INT64 nanos
    * (read as LONG under `nanosAsLong`) and TIMESTAMP(µs) (read as
    * TIMESTAMP_NTZ / TIMESTAMP). The ns-long canonical form keeps every
    * downstream bucket/window exact-integer in both engines: Spark does
    * `ts div k` on the long, DuckDB mirrors it with `epoch_ns(ts)`.
    * The NTZ→epoch cast is deterministic because every entrypoint pins
    * `spark.sql.session.timeZone=UTC`, matching DuckDB's naive-as-UTC
    * `epoch_ns`. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => raw
      case TimestampNTZType =>
        raw.withColumn("ts", expr("unix_micros(cast(ts as timestamp)) * 1000L"))
      case TimestampType =>
        raw.withColumn("ts", expr("unix_micros(ts) * 1000L"))
      case other =>
        throw new IllegalArgumentException(s"unsupported events.ts type: $other")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
