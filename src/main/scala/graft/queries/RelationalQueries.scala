package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The ten declared oracle queries of SURVEY.md §2.B — one per relational
  * primitive family the reference exercises (projection/filter, equi/theta/
  * anti join, grouped/global aggregation, distinct, window, union, motif
  * self-join, scalar conditionals, top-k).
  *
  * Cross-engine determinism rules (results are hash-compared against DuckDB
  * by the driver):
  *  - double sums only over integer-valued doubles (`l_quantity`) or
  *    cents-quantized prices (`round(x*100)::long`) — exact in IEEE754 in
  *    any summation order, so Spark's partial aggregation and DuckDB's
  *    sequential sum agree bit-for-bit;
  *  - rank windows carry a unique-key tiebreak so ranks are total-order
  *    deterministic;
  *  - raw double columns only pass through untouched (no reassociation).
  */
object RelationalQueries {
  import Tables._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_agg" -> ((s, d) =>
      lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          count(lit(1)).as("cnt"),
          sum(col("l_quantity")).as("sum_qty"),
          sum(round(col("l_extendedprice") * 100).cast("long")).as("rev_cents"),
          avg(col("l_quantity")).as("avg_qty"))),

    "q02_join" -> ((s, d) =>
      orders(s, d)
        .filter(col("o_orderstatus") === "O")
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          count(lit(1)).as("cnt"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("rev_cents"))),

    "q03_anti_join" -> ((s, d) =>
      customer(s, d)
        .join(
          orders(s, d).filter(col("o_orderstatus") === "F"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"))),

    "q04_theta_join" -> ((s, d) => {
      val n = nation(s, d)
      val a = n.select(col("n_nationkey").as("a_key"), col("n_name").as("a_name"))
      val b = n.select(col("n_nationkey").as("b_key"), col("n_name").as("b_name"))
      a.join(b, col("a_key") < col("b_key"))
        .select(col("a_name"), col("b_name"))
    }),

    "q05_window" -> ((s, d) => {
      val byCust = Window.partitionBy(col("o_custkey"))
      val ranked = byCust.orderBy(col("o_totalprice"), col("o_orderkey"))
      orders(s, d).select(
        col("o_orderkey"),
        col("o_custkey"),
        col("o_totalprice"),
        min(col("o_totalprice")).over(byCust).as("min_price"),
        count(lit(1)).over(byCust).as("cust_orders"),
        rank().over(ranked).as("price_rank"))
    }),

    "q06_distinct" -> ((s, d) =>
      lineitem(s, d).agg(
        countDistinct(col("l_orderkey")).as("distinct_orders"),
        countDistinct(col("l_partkey")).as("distinct_parts"),
        countDistinct(col("l_returnflag")).as("distinct_flags"))),

    "q07_union" -> ((s, d) =>
      nation(s, d).select(col("n_nationkey").cast("long").as("key"))
        .union(region(s, d).select(col("r_regionkey").cast("long").as("key")))
        .distinct()),

    "q09_case_scalar" -> ((s, d) =>
      lineitem(s, d).select(
        col("l_orderkey"),
        col("l_linenumber"),
        when(col("l_tax") > 0.04, "hi").otherwise("lo").as("tax_band"),
        least(col("l_tax"), col("l_discount")).as("lo_rate"),
        greatest(col("l_tax"), col("l_discount")).as("hi_rate"))),

    "q10_topk" -> ((s, d) =>
      orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select(col("o_orderkey"), col("o_totalprice"))
        .limit(10)),

    "q11_rollup" -> ((s, d) =>
      // grouping-sets surface: subtotals per (flag, status), per flag, and
      // grand total in ONE pass — Spark plans rollup as a single Expand +
      // aggregate, not three scans
      lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(
          count(lit(1)).as("cnt"),
          sum(col("l_quantity")).as("sum_qty"))),

    "q12_pivot" -> ((s, d) =>
      // pivot surface: one grouped pass producing one column per pivoted
      // value. The value list is EXPLICIT — with an inferred list Spark
      // runs an extra distinct job over the fact table first, a needless
      // full scan at 100 TB (and nondeterministic column order)
      lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("O", "F"))
        .agg(sum(col("l_quantity")))
        .withColumnsRenamed(Map("O" -> "qty_open", "F" -> "qty_filled"))),

    "q14_cube" -> ((s, d) =>
      // full grouping-sets lattice: (flag, status), (flag), (status), ()
      // in one Expand + aggregate pass — completes the rollup (q11) /
      // pivot (q12) grouping surface
      lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(
          count(lit(1)).as("cnt"),
          sum(col("l_quantity")).as("sum_qty"))),

    "q15_grouping_sets" -> ((s, d) =>
      // arbitrary (non-lattice) grouping sets in one Expand pass: the
      // flag×status breakdown, the flag×ship-year breakdown, and the
      // grand total — sets neither rollup (q11) nor cube (q14) produce.
      // Group columns are non-null in the data, so a NULL unambiguously
      // means "aggregated out" without needing grouping_id
      lineitem(s, d)
        .select(col("l_returnflag"), col("l_linestatus"),
          year(col("l_shipdate")).as("ship_year"), col("l_quantity"))
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_returnflag"), col("ship_year")),
            Seq.empty[org.apache.spark.sql.Column]),
          col("l_returnflag"), col("l_linestatus"), col("ship_year"))
        .agg(
          count(lit(1)).as("cnt"),
          sum(col("l_quantity")).as("sum_qty"))),

    "q13_percentile" -> ((s, d) =>
      // exact interpolated percentiles per group (both engines use the
      // 0-based (n-1)*p linear interpolation); quartile fractions of
      // integer-valued quantities are exact binary doubles, so the
      // interpolated results are bit-identical cross-engine
      lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_quantity, 0.25)").as("p25"),
          expr("percentile(l_quantity, 0.5)").as("p50"),
          expr("percentile(l_quantity, 0.75)").as("p75"),
          expr("percentile(l_quantity, array(0.1, 0.9))[1]").as("p90"))))

  val oracle: Map[String, String] = Map(
    "q01_agg" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        | sum(l_quantity) AS sum_qty,
        | CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents,
        | avg(l_quantity) AS avg_qty
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_join" ->
      """SELECT c_mktsegment, count(*) AS cnt,
        | CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderstatus = 'O' GROUP BY c_mktsegment""".stripMargin,
    "q03_anti_join" ->
      """SELECT c_custkey FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')""".stripMargin,
    "q04_theta_join" ->
      """SELECT a.n_name AS a_name, b.n_name AS b_name
        |FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey""".stripMargin,
    "q05_window" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        | min(o_totalprice) OVER (PARTITION BY o_custkey) AS min_price,
        | count(*) OVER (PARTITION BY o_custkey) AS cust_orders,
        | rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey) AS price_rank
        |FROM orders""".stripMargin,
    "q06_distinct" ->
      """SELECT count(DISTINCT l_orderkey) AS distinct_orders,
        | count(DISTINCT l_partkey) AS distinct_parts,
        | count(DISTINCT l_returnflag) AS distinct_flags
        |FROM lineitem""".stripMargin,
    "q07_union" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS key FROM nation
        |UNION
        |SELECT CAST(r_regionkey AS BIGINT) AS key FROM region""".stripMargin,
    "q09_case_scalar" ->
      """SELECT l_orderkey, l_linenumber,
        | CASE WHEN l_tax > 0.04 THEN 'hi' ELSE 'lo' END AS tax_band,
        | least(l_tax, l_discount) AS lo_rate,
        | greatest(l_tax, l_discount) AS hi_rate
        |FROM lineitem""".stripMargin,
    "q10_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q11_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        | sum(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "q12_pivot" ->
      """SELECT l_returnflag,
        | sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS qty_open,
        | sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS qty_filled
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q14_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        | sum(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,
    "q13_percentile" ->
      """SELECT l_returnflag,
        | quantile_cont(l_quantity, 0.25) AS p25,
        | quantile_cont(l_quantity, 0.5) AS p50,
        | quantile_cont(l_quantity, 0.75) AS p75,
        | quantile_cont(l_quantity, 0.9) AS p90
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q15_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, year(l_shipdate) AS ship_year,
        | count(*) AS cnt, sum(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY GROUPING SETS
        | ((l_returnflag, l_linestatus), (l_returnflag, ship_year), ())""".stripMargin)
}
