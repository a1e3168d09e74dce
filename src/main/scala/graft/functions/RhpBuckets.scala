package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

import graft.spark.ColumnBridge

/** Random-hyperplane LSH bucket keys for one embedding vector: `tables`
  * independent signatures of `bits` sign bits each, every bit the sign of
  * the dot product with a pseudo-random hyperplane. Bucket t is
  * `(t << bits) | signBits` so keys are unique across tables and a plain
  * `explode` + equi-join drives candidate generation.
  *
  * Hyperplane components are derived from xxhash64(plane, dim) — no RNG
  * state, so signatures are identical across tasks, retries and sessions.
  *
  * Implemented as a native expression because the equivalent
  * `transform`/`aggregate` lambda nest is interpreted by Spark (no codegen
  * for higher-order functions) and evaluates tables*bits*dim closures per
  * row; here the whole signature is one tight loop, called from generated
  * code so the projection stays inside whole-stage codegen.
  */
case class RhpBuckets(child: Expression, bits: Int, tables: Int)
    extends UnaryExpression {

  require(bits >= 1 && bits <= 24, "bits must be in [1, 24]")
  require(tables >= 1, "tables must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "rhp_buckets"

  /** A vector containing null elements buckets as NULL (no buckets, joins
    * drop it) rather than reading nulls as 0.0 into the hyperplane dots —
    * same malformed-input contract as [[QuantizedDot]]. The prescan
    * compiles away when the schema says containsNull=false. */
  override def nullable: Boolean = true

  private def eltNullable: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    RhpBuckets.compute(input.asInstanceOf[ArrayData], bits, tables, eltNullable)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val res = ctx.freshName("res")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $res =
         |  graft.functions.RhpBuckets.compute($c, $bits, $tables, $eltNullable);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RhpBuckets {

  /** Pseudo-random hyperplane component for (plane, dim), uniform in
    * [-0.999, 0.999]: xxhash64-chained exactly like the SQL
    * `pmod(xxhash64(plane, dim), 1999) - 999`.
    */
  private def planeComponent(plane: Int, dim: Int): Double = {
    val h = XXH64.hashInt(dim, XXH64.hashInt(plane, 42L))
    val m = h % 1999
    ((if (m < 0) m + 1999 else m) - 999) / 1000.0
  }

  /** Whole-signature kernel; public + static-forwarded for generated code.
    * Returns null (→ SQL NULL) when `checkNulls` and any element is null. */
  def compute(vec: ArrayData, bits: Int, tables: Int, checkNulls: Boolean): ArrayData = {
    val n = vec.numElements()
    if (checkNulls) {
      var j = 0
      while (j < n) {
        if (vec.isNullAt(j)) return null
        j += 1
      }
    }
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var acc = 0L
      var b = 0
      while (b < bits) {
        val plane = t * 64 + b
        var dot = 0.0
        var j = 0
        while (j < n) {
          dot += vec.getFloat(j) * planeComponent(plane, j)
          j += 1
        }
        acc = (acc << 1) | (if (dot > 0) 1L else 0L)
        b += 1
      }
      out(t) = (t.toLong << bits) | acc
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point. */
  def apply(vec: Column, bits: Int, tables: Int): Column =
    ColumnBridge.column(RhpBuckets(ColumnBridge.expression(vec), bits, tables))
}
