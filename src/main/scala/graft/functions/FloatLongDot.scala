package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

import graft.spark.ColumnBridge

/** Exact dot of a float vector against an INTEGER vector: sum of
  * `q(a_i) * b_i` with the same half-away-from-zero 1e-3 quantization as
  * [[QuantizedDot]]. The integer side is typically an un-normalized
  * centroid — the per-cell SUM of quantized components — so IVF cell
  * probing and k-means assignment can rank by exact integers (divided by
  * the cell count only at the very end, one correctly-rounded IEEE-754 op)
  * instead of by engine-dependent floating-point means. Deterministic in
  * any summation order; bit-identical across engines.
  *
  * Native for the same reason as [[QuantizedDot]]: the `zip_with` +
  * `aggregate` composition is interpreted per element, and assignment
  * evaluates corpus x k pairs.
  */
case class FloatLongDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, array<bigint>), " +
          s"got ${l.catalogString} and ${r.catalogString}")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "float_long_dot"

  /** Same malformed-input contract as [[QuantizedDot]]: length mismatch or
    * null elements yield NULL, never a silently wrong product. */
  override def nullable: Boolean = true

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
      acc += QuantizedDot.q(x.getFloat(i)) * y.getLong(i)
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
         |          * $b.getLong($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object FloatLongDot {
  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      FloatLongDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
