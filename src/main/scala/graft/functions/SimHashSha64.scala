package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

import graft.spark.ColumnBridge

/** [[SimHash64]] with a CROSS-ENGINE token hash: the first 8 bytes of
  * sha256 (big-endian), i.e. the value spelled by the first 16 hex chars
  * of `sha2(token, 256)`. Any engine with sha256 — DuckDB included —
  * reproduces the identical signature bit for bit, which makes the whole
  * near-dup pipeline oracle-checkable end to end; the xxhash64-based
  * [[SimHash64]] remains the throughput path (one sha256 per token costs
  * ~10x an xxhash64).
  *
  * Same vote rule as [[SimHash64]]: every hash bit votes +1/-1 over the
  * token multiset, output bit b is set when bit b's total is positive.
  * Kernel is a plain static call so the projection stays inside
  * whole-stage codegen; the MessageDigest instance is thread-cached.
  */
case class SimHashSha64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash_sha64"

  override def nullSafeEval(input: Any): Any =
    SimHashSha64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashSha64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashSha64 {

  private val digest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("SHA-256"))

  /** One-pass kernel; public + static-forwarded for generated code.
    * Null tokens are skipped (no vote), matching [[SimHash64]].
    */
  def compute(toks: ArrayData): Long = {
    val n = toks.numElements()
    val votes = new Array[Int](64)
    val md = digest.get()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        md.reset()
        // UTF-8 bytes, same input as Spark's sha2(token, 256)
        val d = md.digest(toks.getUTF8String(i).getBytes)
        var h = 0L
        var k = 0
        while (k < 8) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Column-API entry point. */
  def apply(toks: Column): Column =
    ColumnBridge.column(SimHashSha64(ColumnBridge.expression(toks)))
}
