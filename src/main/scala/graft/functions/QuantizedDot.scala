package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

import graft.spark.ColumnBridge

/** Exact quantized dot product of two `array<float>` embedding vectors:
  * each component is rounded half-away-from-zero to 1e-3 (matching
  * DuckDB/C `round()`), multiplied in 64-bit integers and summed.
  * Deterministic in any summation order, so results are bit-identical
  * across engines, partitionings and retries — which floating-point dot
  * products are not.
  *
  * A native Catalyst expression rather than a `zip_with`+`aggregate`
  * composition because Spark's higher-order functions are interpreted
  * (closure per element, boxed accumulators); `doGenCode` emits a tight
  * primitive loop that stays inside whole-stage codegen. On the ANN
  * benchmarks this is ~20x faster per pair than the lambda form.
  */
case class QuantizedDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "quantized_dot"

  /** Malformed input is NULL, not a silently wrong product: vectors of
    * different lengths and vectors containing null elements both yield
    * null — matching the `zip_with`+`aggregate` lambda this expression
    * replaced (zip_with pads with nulls, which poison the lambda sum).
    */
  override def nullable: Boolean = true

  /** Element null checks compile away when both schemas say
    * containsNull=false. */
  private def eltNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  })

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    val checkElts = eltNullable
    var acc = 0L
    var i = 0
    while (i < n) {
      if (checkElts && (x.isNullAt(i) || y.isNullAt(i))) return null
      acc += QuantizedDot.q(x.getFloat(i)) * QuantizedDot.q(y.getFloat(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val eltCheck =
        if (eltNullable)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |final int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $eltCheck
         |    $acc += graft.functions.QuantizedDot.q($a.getFloat($i))
         |          * graft.functions.QuantizedDot.q($b.getFloat($i));
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object QuantizedDot {
  /** Quantize one component: x*1000 rounded half-away-from-zero (C/DuckDB
    * `round` semantics). Public + static-forwarded so generated code can
    * call it.
    */
  def q(x: Float): Long = {
    val r = x.toDouble * 1000.0
    if (r >= 0) math.floor(r + 0.5d).toLong else math.ceil(r - 0.5d).toLong
  }

  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      QuantizedDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
