package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.spark.ColumnBridge

/** 64-bit SimHash of a token multiset (Charikar, STOC'02): every token is
  * xxhash64'd (same bytes-and-seed scheme as Spark's `xxhash64`, so values
  * match the SQL-composed variant), each hash bit votes +1/-1, and output
  * bit b is set when bit b's vote total is positive.
  *
  * A native expression because the SQL form — a 64-element `transform`
  * with a nested `aggregate` over the tokens — is interpreted (no codegen
  * for higher-order functions) and costs 64 x n_tokens closure evaluations
  * per document; this kernel is one pass over the tokens with a 64-slot
  * counter array, called from generated code so the projection stays
  * inside whole-stage codegen.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {

  /** One-pass kernel; public + static-forwarded for generated code.
    * Null tokens are skipped (no vote), matching SQL-lambda null flow.
    */
  def compute(toks: ArrayData): Long = {
    val n = toks.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        // same value as Spark's xxhash64(token): UTF8 bytes, seed 42
        val h = XXH64.hashUTF8String(toks.getUTF8String(i), 42L)
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
    ColumnBridge.column(SimHash64(ColumnBridge.expression(toks)))
}
