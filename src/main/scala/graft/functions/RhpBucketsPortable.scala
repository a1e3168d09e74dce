package graft.functions

import java.security.MessageDigest
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

import graft.spark.ColumnBridge

/** [[RhpBuckets]] with a CROSS-ENGINE hyperplane derivation and EXACT
  * integer sign dots, so LSH bucketing is reproducible by any engine with
  * sha256 (DuckDB included) and the whole approximate pipeline becomes
  * oracle-checkable:
  *
  *  - hyperplane component c(plane, dim) = (u % 1999) - 999 where u is
  *    the unsigned 32-bit value of the first 8 hex chars of
  *    sha256("plane:dim") — an integer in [-999, 999], identically
  *    derivable in SQL from the same hex digits;
  *  - the sign bit is `sum_j q(v_j) * c(plane, j) > 0` with
  *    [[QuantizedDot.q]] quantization: an exact i64 dot, deterministic in
  *    any summation order (the float dot in [[RhpBuckets]] is not
  *    cross-engine stable for near-zero projections).
  *
  * Bucket packing matches [[RhpBuckets]]: `(t << bits) | signBits`, plane
  * ids `t * 64 + b`, bit b=0 most significant. The component table is
  * computed once per (bits, tables, dims) and cached process-wide; per row
  * the kernel is the same tight loop as [[RhpBuckets]].
  */
case class RhpBucketsPortable(child: Expression, bits: Int, tables: Int)
    extends UnaryExpression {

  require(bits >= 1 && bits <= 24, "bits must be in [1, 24]")
  require(tables >= 1, "tables must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "rhp_buckets_portable"

  /** Same malformed-input contract as [[RhpBuckets]]. */
  override def nullable: Boolean = true

  private def eltNullable: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    RhpBucketsPortable.compute(
      input.asInstanceOf[ArrayData], bits, tables, eltNullable)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val res = ctx.freshName("res")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $res =
         |  graft.functions.RhpBucketsPortable.compute($c, $bits, $tables, $eltNullable);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RhpBucketsPortable {

  /** c(plane, dim): unsigned 32-bit value of the first 8 hex chars of
    * sha256("plane:dim"), mod 1999, minus 999.
    */
  def planeComponent(plane: Int, dim: Int): Int = {
    val md = MessageDigest.getInstance("SHA-256")
    val d = md.digest(s"$plane:$dim".getBytes("UTF-8"))
    var u = 0L
    var i = 0
    while (i < 4) { u = (u << 8) | (d(i) & 0xffL); i += 1 }
    ((u % 1999L) - 999L).toInt
  }

  // component tables are tiny (tables * bits * dims ints) and shared by
  // every task in the process
  private val cache = new ConcurrentHashMap[(Int, Int, Int), Array[Array[Int]]]()

  private def components(bits: Int, tables: Int, dims: Int): Array[Array[Int]] =
    cache.computeIfAbsent((bits, tables, dims), _ =>
      Array.tabulate(tables * bits, dims) { (tb, j) =>
        val t = tb / bits
        val b = tb % bits
        planeComponent(t * 64 + b, j)
      })

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
    val comp = components(bits, tables, n)
    val q = new Array[Long](n)
    var j = 0
    while (j < n) { q(j) = QuantizedDot.q(vec.getFloat(j)); j += 1 }
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var acc = 0L
      var b = 0
      while (b < bits) {
        val c = comp(t * bits + b)
        var dot = 0L
        var i = 0
        while (i < n) { dot += q(i) * c(i); i += 1 }
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
    ColumnBridge.column(RhpBucketsPortable(ColumnBridge.expression(vec), bits, tables))
}
