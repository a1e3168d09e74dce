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

  /** DuckDB-side 48-bit sha256-prefix hash of (event_type|event_id) —
    * the [[graft.sketch.Kmv.portableHash]] replay (the DocQueries
    * sha48Sql device, keyed for this table). */
  private val sha48EventSql =
    """CAST(list_sum([(strpos('0123456789abcdef',
      |        substr(substr(sha256(event_type || '|' ||
      |                             CAST(event_id AS VARCHAR)), 1, 12), j, 1)) - 1)
      |    * CAST(power(16, 12 - j) AS BIGINT)
      |    FOR j IN range(1, 13)]) AS BIGINT)""".stripMargin

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

    "s04_asof_attribution" -> ((s, d) => {
      // last-touch attribution: every click joined to the most recent
      // purchase of the same user at-or-before the click. Runs through
      // graft.relational.AsOfJoin (union + window: one shuffle on
      // user_id, no per-key pair blow-up). The right side is first made
      // unique per (user_id, ts) — max event_id wins — so tie handling
      // is deterministic in both engines.
      // timestamps at MICROsecond granularity: DuckDB's TIMESTAMP cannot
      // see the parquet's nanos tail (same convention as s03)
      val ev = events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"),
          expr("ts div 1000").as("ts_us"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), expr("ts div 1000").as("ts_us"))
        .agg(
          max(col("event_id")).as("p_event_id"),
          round(max_by(col("value"), col("event_id")) * 100).cast("long")
            .as("p_value_cents"))
      graft.relational.AsOfJoin.asOf(
          clicks, purchases, Seq("user_id"), "ts_us",
          Seq("p_event_id", "p_value_cents"))
        .select(
          col("event_id"), col("user_id"), col("ts_us"),
          col("asof_ts_us").as("p_ts_us"),
          col("asof_p_event_id").as("p_event_id"),
          col("asof_p_value_cents").as("p_value_cents"))
    }),

    "s05_interval_join" -> ((s, d) => {
      // conversion window: clicks by the same user within 7 days after
      // each signup. The equi key (user_id) bounds the join — Spark
      // plans a shuffled join on user_id with the range condition as a
      // post-filter, never a cartesian; at 100 TB the key keeps pair
      // counts per-user, and a time-bucket key can be added beside
      // user_id if single users span years of data.
      val ev = events(s, d)
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("event_id"), col("user_id"),
          expr("ts div 1000").as("ts_us"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_uid"),
          expr("ts div 1000").as("c_ts"))
      val windowUs = 7L * 24 * 3600 * 1000 * 1000
      signups.join(clicks,
          col("user_id") === col("c_uid") &&
            col("c_ts") > col("ts_us") &&
            col("c_ts") <= col("ts_us") + lit(windowUs), "left")
        .groupBy(col("event_id"), col("user_id"), col("ts_us"))
        .agg(count(col("c_ts")).as("n_clicks_7d"))
    }),

    "s07_asof_enrich" -> ((s, d) => {
      // the SAME attribution as s04 through the OTHER as-of
      // implementation (graft.streaming.EventStream.enrichAsOf: packed
      // reference + per-row ordered lookup, the streaming-capable path),
      // against the same DuckDB ASOF oracle — the two engines' plans are
      // cross-checked against each other via the shared oracle
      val ev = events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"),
          expr("ts div 1000").as("ts_us"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), expr("ts div 1000").as("ts_us"))
        .agg(
          max(col("event_id")).as("p_event_id"),
          round(max_by(col("value"), col("event_id")) * 100).cast("long")
            .as("p_value_cents"))
      graft.streaming.EventStream.enrichAsOf(
          clicks, purchases, Seq("user_id"), "ts_us",
          Seq("p_event_id", "p_value_cents"))
        .select(
          col("event_id"), col("user_id"), col("ts_us"),
          col("asof_ts_us").as("p_ts_us"),
          col("asof_p_event_id").as("p_event_id"),
          col("asof_p_value_cents").as("p_value_cents"))
    }),

    "s06_props_json" -> ((s, d) =>
      // semi-structured column handling: the props column is a JSON
      // payload; extract a typed field and aggregate. get_json_object is
      // codegen'd path extraction — no UDF, no full from_json schema
      // materialization for a single field
      events(s, d)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"))),

    "s14_transition_matrix" -> ((s, d) => {
      // the product-analytics transition matrix: per user, consecutive
      // event pairs in (ts, event_id) order — lead() over the user
      // window, the s03 sessionize shape — rolled into exact counts and
      // milli-exact row-conditional probabilities P(next=b | cur=a) via
      // one integral division. Type-vocabulary-sized output.
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      events(s, d)
        .select(col("user_id"), col("event_type").as("from_type"),
          lead(col("event_type"), 1).over(w).as("to_type"))
        .filter(col("to_type").isNotNull)
        .groupBy(col("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n_ab"))
        .withColumn("n_a", sum(col("n_ab"))
          .over(Window.partitionBy(col("from_type"))))
        .select(col("from_type"), col("to_type"), col("n_ab"), col("n_a"),
          expr("(1000 * n_ab) div n_a").as("p_milli"))
    }),

    "s13_mad_outliers" -> ((s, d) =>
      // robust per-type outlier gate: exact lower median and MAD (50%
      // breakdown — one wild value cannot drag the gate the way a
      // mean/stddev z-score can), rule |x − med| > 3·MAD. Both medians
      // come from the distinct-value running-count device; the corpus
      // never sorts.
      graft.relational.RobustStats.madOutliers(
        events(s, d), "event_type", "value", k = 3.0)),

    "s12_cooccurrence" -> ((s, d) =>
      // related-items graph from the interaction log: distinct
      // (user, item) collapse, bot-scale actors capped (>64 distinct
      // items — the broadcast anti-join device), actor-keyed pair join,
      // LIFT in milli-exact decimal arithmetic (monotone with PMI, no
      // logs needed). The item id is the typed JSON props field.
      graft.relational.Cooccurrence.itemPairs(
        events(s, d).select(col("user_id"),
          get_json_object(col("props"), "$.k").cast("long").as("item")),
        "user_id", "item", minSupport = 30L, maxActorItems = 64)),

    "s11_value_quantile_gate" -> ((s, d) => {
      // p95 anomaly gate per event type over the CONTINUOUS value
      // column — the exact case (distinct (stratum, value) pairs ≈ the
      // stream) where the mergeable bottom-k rank sketch replaces an
      // exact quantile; k = 128 per type, state bounded regardless of
      // volume, and the streaming face (thresholdStream) runs the same
      // estimator with mapGroupsWithState. Hash, sample membership,
      // rank pick and the >= gate all replay in DuckDB (the d22 device
      // over events).
      val ev = events(s, d).select(col("event_id"), col("event_type"), col("value"))
      val sk = graft.sketch.QuantileSketch.sketch(
        ev, "event_type", "event_id", "value", k = 128)
      val thr = graft.sketch.QuantileSketch.thresholds(sk, "event_type", 0.95)
      ev.join(broadcast(thr), Seq("event_type"))
        .groupBy(col("event_type"), col("n"), col("m"), col("threshold"))
        .agg(count(when(col("value") >= col("threshold"), 1)).as("n_over"))
        .select(col("event_type"), col("n"), col("m"),
          round(col("threshold"), 6).as("threshold"), col("n_over"))
    }),

    "s10_latest_per_user" -> ((s, d) =>
      // CDC compaction / latest-record-per-key: one map-side-combinable
      // max(struct(ts, event_id, ...)) per user — NO window over the
      // corpus, so no single partition ever sees a hot key's full
      // history (the scalable twin of QUALIFY row_number() = 1).
      // (ts, event_id) is a unique total order, so the pick is
      // deterministic; value rides through as exact cents
      events(s, d)
        .groupBy(col("user_id"))
        .agg(max(struct(col("ts"), col("event_id"), col("event_type"),
          round(col("value") * 100).cast("long").as("value_cents"))).as("_m"))
        .select(col("user_id"), col("_m.ts").as("ts"),
          col("_m.event_id").as("event_id"),
          col("_m.event_type").as("event_type"),
          col("_m.value_cents").as("value_cents"))),

    "s09_trending_windows" -> ((s, d) => {
      // sliding-window trending: top-3 event types per 6-hour window
      // sliding every 3 hours. An event at half-window index h belongs
      // to windows h-1 and h — a 2-way explode (narrow), then one
      // combinable (window, type) count; the per-window rank runs over
      // <= |event types| rows, so the window function never sees more
      // than a bounded group. All bucket arithmetic is exact integer
      // division on epoch-nanos longs.
      import org.apache.spark.sql.expressions.Window
      val slide = 3L * 3600 * 1000000000L
      val win = events(s, d)
        .select(col("event_type"), expr(s"ts div $slide").as("h"))
        .select(col("event_type"),
          explode(array(col("h"), col("h") - 1)).as("w"))
      val counts = win.groupBy(col("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val rw = Window.partitionBy(col("w"))
        .orderBy(col("n").desc, col("event_type"))
      counts.withColumn("rank", row_number().over(rw))
        .filter(col("rank") <= 3)
    }),

    "s08_retention_cohorts" -> ((s, d) => {
      // cohort retention matrix: cohort = a user's first active day,
      // cell (cohort_day, day_offset) = how many of that cohort were
      // active `offset` days later. Three map-side-combinable steps —
      // distinct (user, day), min-day per user, count per matrix cell —
      // all keyed by user_id, so at 100 TB the activity set shuffles
      // once and the cohort join is co-partitioned by AQE. Day buckets
      // are exact integer division on epoch-nanos longs.
      val day = events(s, d)
        .select(col("user_id"), expr("ts div 86400000000000").as("day"))
        .distinct()
      val cohort = day.groupBy(col("user_id"))
        .agg(min(col("day")).as("cohort_day"))
      day.join(cohort, "user_id")
        .groupBy(col("cohort_day"),
          (col("day") - col("cohort_day")).as("day_offset"))
        .agg(count(lit(1)).as("n_users"))
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
    "s04_asof_attribution" ->
      """WITH c AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
        |           FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, epoch_us(ts) AS ts_us,
        |             max(event_id) AS p_event_id,
        |             CAST(round(arg_max(value, event_id) * 100) AS BIGINT)
        |               AS p_value_cents
        |      FROM events WHERE event_type = 'purchase'
        |      GROUP BY user_id, epoch_us(ts))
        |SELECT c.event_id, c.user_id, c.ts_us,
        |       p.ts_us AS p_ts_us, p.p_event_id, p.p_value_cents
        |FROM c ASOF LEFT JOIN p
        |  ON c.user_id = p.user_id AND c.ts_us >= p.ts_us""".stripMargin,
    "s05_interval_join" ->
      """WITH s AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
        |           FROM events WHERE event_type = 'signup'),
        |c AS (SELECT user_id, epoch_us(ts) AS c_ts
        |      FROM events WHERE event_type = 'click')
        |SELECT s.event_id, s.user_id, s.ts_us,
        |       count(c.c_ts) AS n_clicks_7d
        |FROM s LEFT JOIN c ON s.user_id = c.user_id
        |  AND c.c_ts > s.ts_us
        |  AND c.c_ts <= s.ts_us + 604800000000
        |GROUP BY 1, 2, 3""".stripMargin,
    "s07_asof_enrich" ->
      """WITH c AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
        |           FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, epoch_us(ts) AS ts_us,
        |             max(event_id) AS p_event_id,
        |             CAST(round(arg_max(value, event_id) * 100) AS BIGINT)
        |               AS p_value_cents
        |      FROM events WHERE event_type = 'purchase'
        |      GROUP BY user_id, epoch_us(ts))
        |SELECT c.event_id, c.user_id, c.ts_us,
        |       p.ts_us AS p_ts_us, p.p_event_id, p.p_value_cents
        |FROM c ASOF LEFT JOIN p
        |  ON c.user_id = p.user_id AND c.ts_us >= p.ts_us""".stripMargin,
    "s06_props_json" ->
      """SELECT event_type,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
        |    AS sum_k,
        |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type""".stripMargin,
    // same lead() window in (ts, event_id) order, same integral division
    "s14_transition_matrix" ->
      """WITH p AS (SELECT user_id, event_type AS from_type,
        |    lead(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |c AS (SELECT from_type, to_type, count(*) AS n_ab FROM p
        |      WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n_ab,
        |  CAST(sum(n_ab) OVER (PARTITION BY from_type) AS BIGINT) AS n_a,
        |  CAST((1000 * n_ab) // sum(n_ab) OVER (PARTITION BY from_type)
        |    AS BIGINT) AS p_milli
        |FROM c""".stripMargin,
    // both medians replayed with the d15 distinct-value running-count
    // device; the gate is one IEEE multiply + compare
    "s13_mad_outliers" ->
      """WITH cc AS (SELECT event_type, value AS v, count(*) AS c
        |            FROM events GROUP BY 1, 2),
        |cw AS (SELECT event_type, v,
        |         sum(c) OVER (PARTITION BY event_type ORDER BY v
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |       FROM cc),
        |n0 AS (SELECT event_type, count(*) AS n FROM events GROUP BY 1),
        |med AS (SELECT cw.event_type, min(cw.v) AS med
        |        FROM cw JOIN n0 ON cw.event_type = n0.event_type
        |        WHERE cw.cum >= CAST(ceil(0.5 * n0.n) AS BIGINT)
        |        GROUP BY cw.event_type),
        |dv AS (SELECT e.event_type, abs(e.value - m.med) AS d, m.med
        |       FROM events e JOIN med m ON e.event_type = m.event_type),
        |dc AS (SELECT event_type, d, count(*) AS c FROM dv GROUP BY 1, 2),
        |dw AS (SELECT event_type, d,
        |         sum(c) OVER (PARTITION BY event_type ORDER BY d
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |       FROM dc),
        |mad AS (SELECT dw.event_type, min(dw.d) AS mad
        |        FROM dw JOIN n0 ON dw.event_type = n0.event_type
        |        WHERE dw.cum >= CAST(ceil(0.5 * n0.n) AS BIGINT)
        |        GROUP BY dw.event_type)
        |SELECT dv.event_type, min(dv.med) AS med, min(mad.mad) AS mad,
        |  count(*) AS n,
        |  CAST(sum(CASE WHEN dv.d > 3.0 * mad.mad THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_outliers
        |FROM dv JOIN mad ON dv.event_type = mad.event_type
        |GROUP BY dv.event_type""".stripMargin,
    // same distinct collapse, hot-actor cap, pair join and decimal lift
    "s12_cooccurrence" ->
      """WITH d0 AS (SELECT DISTINCT user_id AS u,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS i FROM events),
        |hot AS (SELECT u FROM d0 GROUP BY u HAVING count(*) > 64),
        |d AS (SELECT * FROM d0 ANTI JOIN hot USING (u)),
        |nu AS (SELECT CAST(count(DISTINCT u) AS HUGEINT) AS N FROM d),
        |ic AS (SELECT i, count(*) AS n_i FROM d GROUP BY i),
        |p AS (SELECT a.i AS item_a, b.i AS item_b, count(*) AS n_ab
        |      FROM d a JOIN d b ON a.u = b.u AND a.i < b.i GROUP BY 1, 2)
        |SELECT p.item_a, p.item_b, p.n_ab, ia.n_i AS n_a, ib.n_i AS n_b,
        |  CAST((1000 * CAST(p.n_ab AS HUGEINT) * N) // (ia.n_i * ib.n_i)
        |    AS BIGINT) AS lift_milli
        |FROM p JOIN ic ia ON ia.i = p.item_a
        |JOIN ic ib ON ib.i = p.item_b CROSS JOIN nu
        |WHERE p.n_ab >= 30""".stripMargin,
    // the d22 bottom-k rank-sample replay over events.value: same
    // sha256-prefix hash of (type|event_id), same (h, v, rid) sample
    // order, same ceil(0.95*m) rank pick, same >= gate
    "s11_value_quantile_gate" ->
      s"""WITH hh AS (SELECT event_type, value AS v,
         |  $sha48EventSql AS h,
         |  CAST(event_id AS VARCHAR) AS rid FROM events),
         |samp AS (SELECT event_type, v, h, rid,
         |    row_number() OVER (PARTITION BY event_type ORDER BY h, v, rid)
         |      AS rnk
         |  FROM hh),
         |kept AS (SELECT event_type, v, h, rid FROM samp WHERE rnk <= 128),
         |mz AS (SELECT event_type, count(*) AS m FROM kept GROUP BY event_type),
         |vr AS (SELECT event_type, v, h, rid,
         |    row_number() OVER (PARTITION BY event_type ORDER BY v, h, rid)
         |      AS vrnk
         |  FROM kept),
         |thr AS (SELECT vr.event_type, mz.m, vr.v AS threshold
         |        FROM vr JOIN mz ON mz.event_type = vr.event_type
         |        WHERE vr.vrnk = greatest(1, CAST(ceil(0.95 * mz.m) AS BIGINT))),
         |nn AS (SELECT event_type, count(*) AS n FROM events GROUP BY event_type)
         |SELECT e.event_type, nn.n, thr.m, round(thr.threshold, 6) AS threshold,
         |  count(CASE WHEN e.value >= thr.threshold THEN 1 END) AS n_over
         |FROM events e JOIN thr ON thr.event_type = e.event_type
         |JOIN nn ON nn.event_type = e.event_type
         |GROUP BY e.event_type, nn.n, thr.m, thr.threshold""".stripMargin,
    "s10_latest_per_user" ->
      """SELECT user_id, epoch_ns(ts) AS ts, event_id, event_type,
        |  CAST(round(value * 100) AS BIGINT) AS value_cents
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |        ORDER BY ts DESC, event_id DESC) AS rn FROM events)
        |WHERE rn = 1""".stripMargin,
    "s09_trending_windows" ->
      """WITH ev AS (SELECT event_type,
        |              epoch_ns(ts) // 10800000000000 AS h FROM events),
        |win AS (SELECT event_type, unnest([h, h - 1]) AS w FROM ev),
        |c AS (SELECT w, event_type, count(*) AS n FROM win GROUP BY 1, 2)
        |SELECT w, event_type, n, CAST(rank AS INTEGER) AS rank FROM (
        |  SELECT *, row_number() OVER (PARTITION BY w
        |    ORDER BY n DESC, event_type) AS rank FROM c)
        |WHERE rank <= 3""".stripMargin,
    "s08_retention_cohorts" ->
      """WITH a AS (SELECT DISTINCT user_id,
        |             epoch_ns(ts) // 86400000000000 AS day FROM events),
        |c AS (SELECT user_id, min(day) AS cohort_day FROM a GROUP BY user_id)
        |SELECT c.cohort_day, a.day - c.cohort_day AS day_offset,
        |       count(*) AS n_users
        |FROM a JOIN c ON a.user_id = c.user_id
        |GROUP BY 1, 2""".stripMargin,
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
