package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

import graft.spark.ColumnBridge

/** Exact dot of two INTEGER vectors (`array<bigint>`): Σ aᵢ·bᵢ in 64-bit
  * arithmetic. The workhorse for already-quantized representations —
  * int8 scalar-quantized embeddings, integer-sum centroids against
  * integer codes — where [[QuantizedDot]]'s float-side 1e-3 quantization
  * would be a second, wrong rounding. Deterministic in any summation
  * order; bit-identical across engines.
  *
  * Native for the same reason as [[QuantizedDot]]: the hot path
  * evaluates corpus × queries pairs and the `zip_with`+`aggregate`
  * lambda form is interpreted per element.
  */
case class LongLongDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, array<bigint>), " +
          s"got ${l.catalogString} and ${r.catalogString}")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "long_long_dot"

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
      acc += x.getLong(i) * y.getLong(i)
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
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LongLongDot {
  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      LongLongDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
