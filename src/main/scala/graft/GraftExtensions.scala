package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{FloatLongDot, HtmlEntityDecode, LongLongDot,
  MinHashSig, QuantizedDot, RhpBuckets, RhpBucketsPortable, SimHash64,
  SimHashSha64}

/** Registers graft's native expressions as SQL functions, making them
  * callable from `spark.sql(...)` and usable over Spark Connect / JDBC:
  *
  *  - `graft_quantized_dot(a, b)`      — exact quantized embedding dot
  *  - `graft_float_long_dot(v, s)`     — exact dot vs an integer-sum vector
  *  - `graft_long_long_dot(a, b)`      — exact dot of two integer vectors
  *  - `graft_rhp_buckets(v, bits, t)`  — random-hyperplane LSH bucket keys
  *  - `graft_rhp_buckets_portable(v, bits, t)` — sha256-derived, oracle-able
  *  - `graft_simhash64(tokens)`        — 64-bit SimHash of a token array
  *  - `graft_simhash_sha64(tokens)`    — sha256-prefix SimHash, oracle-able
  *  - `graft_minhash_sig(items, n)`    — n-element MinHash signature
  *  - `graft_html_entity_decode(s)`    — one-pass HTML character references
  *
  * Enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` — the
  * standard `SparkSessionExtensions` injection point, so no session code
  * changes are needed. The Column API (`Ann.quantizedDot`,
  * `Ann.rhpBuckets`, `Dedup.simhash`) does not require the extension.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, fn: String, pos: Int): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn argument $pos must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_quantized_dot"),
      new ExpressionInfo(classOf[QuantizedDot].getName, "graft_quantized_dot"),
      (args: Seq[Expression]) => QuantizedDot(args(0), args(1))))

    ext.injectFunction((
      new FunctionIdentifier("graft_rhp_buckets"),
      new ExpressionInfo(classOf[RhpBuckets].getName, "graft_rhp_buckets"),
      (args: Seq[Expression]) => RhpBuckets(
        args(0),
        intArg(args(1), "graft_rhp_buckets", 1),
        intArg(args(2), "graft_rhp_buckets", 2))))

    ext.injectFunction((
      new FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
      (args: Seq[Expression]) => SimHash64(args(0))))

    ext.injectFunction((
      new FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash_sig"),
      (args: Seq[Expression]) => MinHashSig(
        args(0), intArg(args(1), "graft_minhash_sig", 1))))

    ext.injectFunction((
      new FunctionIdentifier("graft_float_long_dot"),
      new ExpressionInfo(classOf[FloatLongDot].getName, "graft_float_long_dot"),
      (args: Seq[Expression]) => FloatLongDot(args(0), args(1))))

    ext.injectFunction((
      new FunctionIdentifier("graft_long_long_dot"),
      new ExpressionInfo(classOf[LongLongDot].getName, "graft_long_long_dot"),
      (args: Seq[Expression]) => LongLongDot(args(0), args(1))))

    ext.injectFunction((
      new FunctionIdentifier("graft_rhp_buckets_portable"),
      new ExpressionInfo(classOf[RhpBucketsPortable].getName, "graft_rhp_buckets_portable"),
      (args: Seq[Expression]) => RhpBucketsPortable(
        args(0),
        intArg(args(1), "graft_rhp_buckets_portable", 1),
        intArg(args(2), "graft_rhp_buckets_portable", 2))))

    ext.injectFunction((
      new FunctionIdentifier("graft_simhash_sha64"),
      new ExpressionInfo(classOf[SimHashSha64].getName, "graft_simhash_sha64"),
      (args: Seq[Expression]) => SimHashSha64(args(0))))

    ext.injectFunction((
      new FunctionIdentifier("graft_html_entity_decode"),
      new ExpressionInfo(classOf[HtmlEntityDecode].getName, "graft_html_entity_decode"),
      (args: Seq[Expression]) => HtmlEntityDecode(args(0))))
  }
}
