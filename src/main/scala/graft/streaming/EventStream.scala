package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming operators over the `events` schema
  * (event_id, ts, user_id, event_type, value). The reference is batch-only
  * (SURVEY.md §2.B: streaming entirely absent); these are the north-star
  * streaming extensions, built so the SAME transform runs on a batch
  * DataFrame or a `readStream` source.
  *
  * Scale notes: windowed aggregation state is bounded by the watermark
  * (late data beyond 10 minutes is dropped, state for closed windows is
  * evicted); sessionization keys state by user_id — the shuffle is a hash
  * partition on user_id and each task holds only its users' open sessions.
  */
object EventStream {

  /** Nanosecond-long `ts` (as read under nanosAsLong) -> TimestampType. */
  def tsFromNanos(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    timestamp_micros((c.cast("long") / lit(1000L)).cast("long"))

  /** Per-user tumbling-window event counts and value sums. Works on batch
    * and streaming inputs; on a stream the 10-minute watermark bounds
    * state and admits late events within the horizon.
    */
  def windowedCounts(events: DataFrame, windowLength: String = "1 hour"): DataFrame = {
    val withTs = events.withColumn("event_time", tsFromNanos(col("ts")))
    val watermarked =
      if (events.isStreaming) withTs.withWatermark("event_time", "10 minutes")
      else withTs
    watermarked
      .groupBy(col("user_id"), window(col("event_time"), windowLength).as("win"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .select(
        col("user_id"),
        col("win.start").as("window_start"),
        col("n_events"), col("value_cents"))
  }

  /** Sliding-window event-type counts — the trending-feed aggregate
    * (s09's streaming face). Each event lands in windowLength/slide
    * windows through the native sliding `window` generator; the count is
    * map-side combinable and, on a stream, the watermark bounds state to
    * the window horizon. The top-k rank stays downstream: the count
    * table is #windows × |event types| — tiny — so a Complete-mode sink
    * or the s09 batch query ranks it without touching the raw stream.
    */
  def trendingCounts(events: DataFrame, windowLength: String = "6 hours",
      slide: String = "3 hours"): DataFrame = {
    val withTs = events.withColumn("event_time", tsFromNanos(col("ts")))
    val watermarked =
      if (events.isStreaming) withTs.withWatermark("event_time", "10 minutes")
      else withTs
    watermarked
      .groupBy(window(col("event_time"), windowLength, slide).as("win"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("win.start").as("window_start"), col("event_type"), col("n"))
  }

  /** Streaming exactly-once ingestion dedup: drop events whose `event_id`
    * was already seen within the watermark horizon. State is bounded —
    * ids older than the watermark are evicted, so memory is
    * O(events per horizon), not O(stream length). On a batch frame this
    * degrades gracefully to a plain `dropDuplicates` over the whole input.
    */
  def dedupStream(events: DataFrame, horizon: String = "10 minutes"): DataFrame = {
    val withTs = events.withColumn("event_time", tsFromNanos(col("ts")))
    if (events.isStreaming)
      withTs.withWatermark("event_time", horizon)
        .dropDuplicatesWithinWatermark("event_id")
        .drop("event_time")
    else withTs.dropDuplicates("event_id").drop("event_time")
  }

  /** Stream-STREAM interval join — the attribution shape (impression
    * stream × conversion stream): pair events of the same user where the
    * right event arrives within `withinSeconds` AFTER the left. Both
    * sides are watermarked with the same horizon and the join condition
    * carries the explicit event-time range, which is what lets Spark
    * evict buffered rows once the opposite watermark passes — without the
    * range bound a stream-stream inner join buffers both streams forever.
    * State is therefore O(events per horizon) per side.
    *
    * Output: (user_id, l_id, r_id, lag_seconds). Works on batch frames
    * too (the watermark is a no-op there), so batch backfill and the live
    * pipeline share one definition.
    */
  def correlateStreams(
      left: DataFrame, right: DataFrame,
      withinSeconds: Long, watermark: String = "1 hour"): DataFrame = {
    def side(df: DataFrame, p: String): DataFrame = {
      val withTs = df.select(
        col("user_id").as(s"${p}_user"),
        col("event_id").as(s"${p}_id"),
        tsFromNanos(col("ts")).as(s"${p}_ts"))
      if (df.isStreaming) withTs.withWatermark(s"${p}_ts", watermark) else withTs
    }
    side(left, "l").join(side(right, "r"),
        col("l_user") === col("r_user") &&
          col("r_ts") >= col("l_ts") &&
          col("r_ts") <= col("l_ts") + expr(s"INTERVAL $withinSeconds SECONDS"))
      .select(
        col("l_user").as("user_id"), col("l_id"), col("r_id"),
        (unix_timestamp(col("r_ts")) - unix_timestamp(col("l_ts")))
          .as("lag_seconds"))
  }

  final case class Event(event_id: Long, ts: Long, user_id: Long,
      event_type: String, value: Double)
  final case class Session(user_id: Long, session_start: Long, session_end: Long,
      n_events: Long, total_value: Double)
  final case class SessionState(start: Long, last: Long, n: Long, total: Double)

  /** Gap-based sessionization with explicit keyed state
    * (`flatMapGroupsWithState`): a session closes when `gapNs` elapses
    * between a user's consecutive events (by processing order within the
    * group iterator, sorted by ts). Emits closed sessions; open sessions
    * remain in state until timeout.
    */
  def sessionize(
      events: Dataset[Event],
      gapNs: Long = 30L * 60 * 1000 * 1000 * 1000): Dataset[Session] = {
    import events.sparkSession.implicits._

    def flush(userId: Long, st: SessionState): Session =
      Session(userId, st.start, st.last, st.n, st.total)

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (userId, it, state: GroupState[SessionState]) =>
          val sorted = it.toSeq.sortBy(e => (e.ts, e.event_id))
          var st = state.getOption.orNull
          val out = scala.collection.mutable.ArrayBuffer.empty[Session]
          for (e <- sorted) {
            if (st == null) st = SessionState(e.ts, e.ts, 1, e.value)
            else if (e.ts - st.last > gapNs) {
              out += flush(userId, st)
              st = SessionState(e.ts, e.ts, 1, e.value)
            } else {
              st = SessionState(st.start, e.ts, st.n + 1, st.total + e.value)
            }
          }
          if (st != null) state.update(st)
          out.iterator
      }
  }

  /** Stream-static as-of enrichment: attach to every (streaming or batch)
    * event the latest `reference` row with `ref.tsCol <= event.tsCol`,
    * per key — the streaming face of [[graft.relational.AsOfJoin]]
    * (whose union + ordered window cannot run on an unbounded stream).
    *
    * The reference is packed ONCE per key into a ts-sorted struct array
    * (`array_sort` on a struct sorts by the leading ts field), the
    * stream equi-joins it (stream-static joins are append-safe, no
    * watermark needed), and a per-row ordered lookup picks the last
    * entry at-or-before the event time. `get(..., size-1)` rather than
    * `element_at(-1)`: ANSI mode makes the latter throw on the
    * empty-candidates case, which here must yield nulls.
    *
    * Scale notes: one shuffle of the reference at packing time, then a
    * broadcast-or-shuffled equi join per micro-batch; per-row lookup
    * cost is linear in that key's history length — intended for
    * dimension-table references (prices, configs, model versions), not
    * for event-to-event joins (use [[graft.relational.AsOfJoin]] in
    * batch for those). A very hot key's array rides inside one row —
    * cap or bucket upstream if a key's history outgrows a few MB.
    */
  def enrichAsOf(
      stream: DataFrame,
      reference: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      payloadCols: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    require(keyCols.nonEmpty, "enrichAsOf requires at least one key column")
    val entry = struct(
      (col(tsCol).as(tsCol) +: payloadCols.map(c => col(c).as(c))): _*)
    val packed = reference
      .groupBy(keyCols.map(col): _*)
      .agg(array_sort(collect_list(entry)).as("_asof_ref"))
    val joined = stream.join(packed, keyCols, "left")
    val cands = filter(col("_asof_ref"), x => x.getField(tsCol) <= col(tsCol))
    val hit = get(cands, size(cands) - 1)
    (tsCol +: payloadCols)
      .foldLeft(joined.withColumn("_asof_hit", hit)) { (df, c) =>
        df.withColumn(prefix + c, col("_asof_hit").getField(c))
      }
      .drop("_asof_ref", "_asof_hit")
  }

  /** Batch-mode sessionization producing ALL sessions (incl. the final
    * open one per user) with pure relational operators — the oracle twin
    * of [[sessionize]]: session boundaries via lag + cumulative sum over a
    * per-user window.
    */
  def sessionizeBatch(events: DataFrame, gapNs: Long = 30L * 60 * 1000 * 1000 * 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val marked = events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull || (col("ts") - col("prev_ts")) > gapNs, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    marked.groupBy(col("user_id"), col("session_idx"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .drop("session_idx")
  }
}
