package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch queries over the `events` table. The parquet stores nanosecond
  * timestamps, which Spark reads as LONG under
  * `spark.sql.legacy.parquet.nanosAsLong=true` (set by Verify/Bench) —
  * bucketing is integer division on nanoseconds, exact in both engines.
  *
  * The same transforms run unchanged on a `readStream` source — see
  * [[graft.streaming.EventStream]] for the streaming (watermark + window +
  * stateful-session) versions.
  */
object EventQueries {
  import Tables._

  private val HOUR_NS = 3600L * 1000 * 1000 * 1000

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s01_hourly_agg" -> ((s, d) =>
      events(s, d)
        .groupBy(
          col("user_id"),
          // integer `div`: Column./ is double division, which loses
          // precision above 2^53 — fatal on ~1.7e18 nanosecond values
          expr(s"ts div ${HOUR_NS}L").as("hour_idx"))
        .agg(
          count(lit(1)).as("n_events"),
          sum(round(col("value") * 100).cast("long")).as("value_cents"))),

    "s02_event_funnel" -> ((s, d) => {
      // per-user ordered event-type transition counts (sessionization-lite):
      // lag window over event time, count transitions per (from, to) pair
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      events(s, d)
        .select(col("user_id"), col("event_type").as("to_type"),
          lag(col("event_type"), 1).over(w).as("from_type"))
        .filter(col("from_type").isNotNull)
        .groupBy(col("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n_transitions"))
    }),

    "s03_sessionize" -> ((s, d) =>
      // session bounds emitted in MICROseconds: DuckDB's TIMESTAMP is
      // µs-precision, so the oracle cannot see the parquet's nanos tail
      graft.streaming.EventStream.sessionizeBatch(events(s, d))
        .select(
          col("user_id"),
          expr("session_start div 1000").as("start_us"),
          expr("session_end div 1000").as("end_us"),
          col("n_events"), col("value_cents"))))

  val oracle: Map[String, String] = Map(
    "s01_hourly_agg" ->
      """SELECT user_id, epoch_ns(ts) // 3600000000000 AS hour_idx,
        | count(*) AS n_events,
        | CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events GROUP BY user_id, hour_idx""".stripMargin,
    "s02_event_funnel" ->
      """WITH seq AS (
        |  SELECT user_id, event_type AS to_type,
        |         lag(event_type) OVER (PARTITION BY user_id
        |                               ORDER BY ts, event_id) AS from_type
        |  FROM events)
        |SELECT from_type, to_type, count(*) AS n_transitions
        |FROM seq WHERE from_type IS NOT NULL
        |GROUP BY from_type, to_type""".stripMargin,
    "s03_sessionize" ->
      """WITH m AS (
        |  SELECT user_id, epoch_ns(ts) AS tns, event_id, value,
        |         lag(epoch_ns(ts)) OVER (PARTITION BY user_id
        |                                 ORDER BY ts, event_id) AS prev
        |  FROM events),
        |s AS (SELECT *, CASE WHEN prev IS NULL OR tns - prev > 1800000000000
        |                     THEN 1 ELSE 0 END AS ns FROM m),
        |c AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY tns, event_id
        |                              ROWS UNBOUNDED PRECEDING) AS sidx FROM s)
        |SELECT user_id, min(tns) // 1000 AS start_us, max(tns) // 1000 AS end_us,
        |       count(*) AS n_events,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM c GROUP BY user_id, sidx""".stripMargin)
}
