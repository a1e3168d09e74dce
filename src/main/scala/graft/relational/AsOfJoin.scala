package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, attach the single
  * right row with the greatest `tsCol <= left.tsCol` (backward — the
  * latest fact known at the left row's time) or the smallest
  * `tsCol >= left.tsCol` (forward), matching per `keyCols`, optionally
  * bounded by `tolerance` time units.
  *
  * This is the pandas `merge_asof` / DuckDB `ASOF JOIN` operator, which
  * Spark lacks natively. A naive formulation — equi-join on keys plus a
  * range predicate plus a per-left-row argmax — materializes every
  * (left, right) pair within range before reducing: quadratic per key
  * and a guaranteed 100 TB killer on dense keys.
  *
  * Implemented instead as union + ordered window:
  *
  *  1. tag both inputs and union them by name (right rows carry their
  *     payload packed in one non-null struct);
  *  2. one window partitioned by the keys, ordered by (ts, side) —
  *     right-before-left at equal timestamps makes the match inclusive;
  *  3. `last(struct, ignoreNulls)` over an unbounded-preceding frame
  *     gives every left row its most recent right payload in O(1) per
  *     row after the sort.
  *
  * Cost: ONE hash shuffle of |L|+|R| rows on the keys plus a per-key
  * sort — identical shape to a sort-merge join, no pair blow-up, fully
  * whole-stage-codegen (window `last` is a built-in). Skewed keys
  * behave like any other window (AQE-visible single stage).
  *
  * Packing the payload in a struct (not `last(col, ignoreNulls)` per
  * column) matters for correctness: a legitimately-NULL right attribute
  * must not fall back to an older row's value — the struct itself is
  * the null witness, its fields pass through untouched.
  *
  * Tolerance is applied after matching (like `merge_asof`): a match
  * farther than `tolerance` from the left timestamp nulls the payload,
  * it does not fall back to an older row.
  */
object AsOfJoin {

  /** @param left      probe side; all its columns pass through
    * @param right     reference side; only `keyCols`, `tsCol` and
    *                  `payloadCols` are read
    * @param keyCols   equality keys (the shuffle keys)
    * @param tsCol     ordering column, present on both sides; any
    *                  orderable numeric/timestamp type
    * @param payloadCols right columns to attach; emitted under
    *                  `asofPrefix + name`
    * @param direction "backward" (default) or "forward"
    * @param tolerance max |left.ts - right.ts|; matches farther away are
    *                  nulled. Units are the ts column's own for numeric
    *                  columns, MICROSECONDS for timestamp columns (the
    *                  gap is measured on unix-microsecond casts, since
    *                  timestamp subtraction yields an interval that
    *                  cannot compare against a Long)
    * @param asofPrefix prefix for attached columns, default "asof_";
    *                  the matched right timestamp arrives as
    *                  `asofPrefix + tsCol`
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      payloadCols: Seq[String],
      direction: String = "backward",
      tolerance: Option[Long] = None,
      asofPrefix: String = "asof_"): DataFrame = {
    require(keyCols.nonEmpty, "asOf requires at least one key column")
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val clash = left.columns.toSet
      .intersect((tsCol +: payloadCols).map(asofPrefix + _).toSet)
    require(clash.isEmpty, s"left already has columns ${clash.mkString(", ")}")

    // internal working names must not shadow (and be silently replaced
    // over) user columns on either input
    val taken = left.columns.toSet ++ right.columns
    def fresh(base: String): String =
      Iterator.from(0)
        .map(i => if (i == 0) base else s"$base$i")
        .find(!taken(_)).get
    val side = fresh("_asof_side")
    val pay = fresh("_asof_payload")
    val payload = struct(
      (col(tsCol).as(tsCol) +: payloadCols.map(c => col(c).as(c))): _*)
    val r = right.select(
      (keyCols.map(col) :+ col(tsCol) :+ payload.as(pay) :+ lit(0).as(side)): _*)
    val l = left.withColumn(pay, lit(null).cast(r.schema(pay).dataType))
      .withColumn(side, lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)

    // backward: latest right at-or-before; forward: reverse the time axis
    val ord: Seq[Column] =
      if (direction == "backward") Seq(col(tsCol).asc, col(side).asc)
      else Seq(col(tsCol).desc, col(side).asc)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = unioned
      .withColumn(pay, last(col(pay), ignoreNulls = true).over(w))
      .filter(col(side) === 1)

    // timestamp − timestamp is a DayTimeInterval, which cannot compare
    // against a Long tolerance — measure the gap on a long projection
    // (unix micros for timestamps, identity cast for numerics)
    val tsIsTimestamp = left.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType => true
      case _ => false
    }
    def tsAsLong(c: Column): Column =
      if (tsIsTimestamp) unix_micros(c.cast(org.apache.spark.sql.types.TimestampType))
      else c.cast(org.apache.spark.sql.types.LongType)
    val gap = abs(tsAsLong(col(tsCol)) - tsAsLong(col(pay).getField(tsCol)))
    val bounded = tolerance.fold(matched) { tol =>
      matched.withColumn(pay,
        when(gap <= lit(tol), col(pay)).otherwise(lit(null).cast(r.schema(pay).dataType)))
    }

    val attached = (tsCol +: payloadCols).foldLeft(bounded) { (df, c) =>
      df.withColumn(asofPrefix + c, col(pay).getField(c))
    }
    attached.drop(pay, side)
  }
}
