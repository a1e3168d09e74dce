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
    *                  columns (fractional types compare natively — no
    *                  truncating cast), MICROSECONDS for timestamp
    *                  columns (timestamp subtraction yields an interval
    *                  that cannot compare against a Long, so the gap is
    *                  measured on a micros projection; TIMESTAMP_NTZ is
    *                  decomposed zone-free, immune to session-zone DST)
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
    // against a Long tolerance — measure the gap on a micros projection
    // for timestamp types. Numeric ts columns keep their NATIVE
    // subtraction (a LongType cast would truncate fractional epoch
    // seconds and move matches across the tolerance boundary); the Long
    // tolerance literal promotes to the wider numeric type in the
    // comparison.
    import org.apache.spark.sql.types.{DateType, LongType, TimestampNTZType, TimestampType}
    // NTZ wall-clock → micros WITHOUT going through the session zone: a
    // cast to TimestampType assigns a DST-dependent UTC offset, so two
    // NTZ values straddling a transition would skew the gap by the DST
    // delta. Decomposing the wall clock (date + time-of-day) is
    // zone-free and stays in whole-stage codegen.
    def wallClockMicros(c: Column): Column =
      datediff(c.cast(DateType), to_date(lit("1970-01-01"))).cast(LongType) *
        lit(86400000000L) +
        (hour(c) * lit(3600L) + minute(c) * lit(60L)).cast(LongType) * lit(1000000L) +
        (date_part(lit("SECOND"), c) * lit(1000000)).cast(LongType)
    val gapProj: Column => Column = left.schema(tsCol).dataType match {
      case TimestampType    => c => unix_micros(c)
      case TimestampNTZType => wallClockMicros
      case _                => identity
    }
    val gap = abs(gapProj(col(tsCol)) - gapProj(col(pay).getField(tsCol)))
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
