package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

import graft.spark.ColumnBridge

/** Whole MinHash signature of a set column in one pass: element s of the
  * output is `min over items x of h_s(x)` where `h_s` is splitmix64
  * applied to `xxhash64(x) + GOLDEN * s` — one real hash per item, then
  * `numHashes` 5-op avalanche mixes, instead of `numHashes` full
  * xxhash64 evaluations per item.
  *
  * This replaces the explode + `numHashes`-column min-aggregation
  * pipeline: the signature is computed per ROW (no shuffle at all), the
  * kernel is a tight primitive loop called from generated code, and the
  * multiply-heavy mixing lives in Java land where ANSI overflow checks
  * don't apply (two's-complement wraparound is exactly what splitmix64
  * wants).
  *
  * The per-seed functions are splitmix64 streams off one xxhash64 —
  * not strictly min-wise independent (no practical family is), but an
  * avalanche-grade universal family: the standard LSH banding analysis
  * (pair at similarity s agrees on a band of r hashes with prob s^r)
  * holds to measurement precision. Accepts `array<string>` (shingles)
  * and `array<long>` (e.g. adjacency ids); null elements are skipped.
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes >= 1, "numHashes must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) | ArrayType(LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> or array<long>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "minhash_sig"

  private def isString: Boolean = child.dataType match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], numHashes, isString)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashSig.compute($c, $numHashes, $isString)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {

  private final val GOLDEN = 0x9e3779b97f4a7c15L

  /** splitmix64 finalizer (Steele et al., "Fast splittable pseudorandom
    * number generators", OOPSLA'14 — public domain reference constants).
    */
  private def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** One-pass kernel; public + static-forwarded for generated code.
    * Empty input yields an all-Long.MaxValue signature (callers filter
    * empty sets before banding, same as the aggregation form did).
    */
  def compute(items: ArrayData, numHashes: Int, isString: Boolean): ArrayData = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val n = items.numElements()
    var i = 0
    while (i < n) {
      if (!items.isNullAt(i)) {
        // same base value as Spark's xxhash64(element): seed 42
        val x =
          if (isString) XXH64.hashUTF8String(items.getUTF8String(i), 42L)
          else XXH64.hashLong(items.getLong(i), 42L)
        var s = 0
        var z = x
        while (s < numHashes) {
          val h = mix(z)
          if (h < sig(s)) sig(s) = h
          z += GOLDEN
          s += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** Column-API entry point. */
  def apply(items: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(items), numHashes))
}
