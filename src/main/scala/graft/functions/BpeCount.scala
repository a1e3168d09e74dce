package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.spark.ColumnBridge

/** Exact BPE token count under an arbitrary-size ranked merge table — the
  * native-expression form of [[graft.text.TextFunctions.bpeTokenCount]].
  *
  * The literal-replace chain is the CROSS-ENGINE face (any SQL engine
  * replays it bit for bit) but it embeds one `replace` per merge in the
  * plan, so it caps out at toy vocabularies — a 50k GPT-2-style table
  * cannot ship as 50k chained replaces (plan/codegen size). This
  * expression applies the same semantics from a compiled table instead:
  * the [[BpeTable]] rides the expression's reference array into the task
  * binary — shipped once per task like a broadcast, never per row — and
  * the kernel is a tight int-array loop called from generated code.
  *
  * Semantics are EXACTLY the replace chain's (the FunctionsSpec golden
  * pins equality on the 40-merge table and a generated 1k-merge table):
  * words split on single spaces (empties dropped), symbols start as code
  * points, and each rule in rank order makes ONE leftmost,
  * non-overlapping pass over the word's symbols — the same application
  * order the wrapped-symbol `replace` performs. Merges never cross word
  * boundaries.
  */
case class BpeCount(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  require(merges.nonEmpty, "merge table must not be empty")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "bpe_count"

  @transient private lazy val table: BpeTable = BpeTable.compile(merges)

  override def nullSafeEval(input: Any): Any =
    table.countAll(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table, classOf[BpeTable].getName)
    defineCodeGen(ctx, ev, c => s"$ref.countAll($c.toString())")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeCount {
  /** Column-API entry point. */
  def apply(text: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeCount(ColumnBridge.expression(text), merges))
}

/** The SEGMENTING face of [[BpeCount]]: the BPE token array itself, not
  * just its length — the form tokenizer-aligned chunking needs (windows
  * cut at TOKEN boundaries, which may fall mid-word, exactly like real
  * context-window packing). Same compiled table, same rank-order-pass
  * semantics; each symbol is a contiguous source character range, so
  * tokens materialize as substrings without re-concatenation.
  *
  * Word-boundary convention (the GPT-2 leading-space device): every
  * word-initial token EXCEPT the document's first carries a leading
  * space, so `concat(tokens)` reproduces the whitespace-normalized
  * document and `concat` of any token window is the chunk's readable
  * text (lead-trim the window if it starts mid-document).
  */
case class BpeSegment(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  require(merges.nonEmpty, "merge table must not be empty")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)

  override def prettyName: String = "bpe_segment"

  @transient private lazy val table: BpeTable = BpeTable.compile(merges)

  override def nullSafeEval(input: Any): Any =
    table.segmentAll(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table, classOf[BpeTable].getName)
    defineCodeGen(ctx, ev, c => s"$ref.segmentAll($c.toString())")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeSegment {
  /** Column-API entry point. */
  def apply(text: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeSegment(ColumnBridge.expression(text), merges))
}

/** Compiled ranked merge table: symbols are interned to int ids (output
  * symbol = the CONCATENATED string, so two rules producing the same
  * string produce the same symbol — the replace chain's semantics), rules
  * are flat (a, b, merged) id triples in rank order, and initial
  * code-point lookup is an ASCII array with a map fallback. Serializable
  * — the instance is constructed once on the driver and rides the task
  * binary; per-thread scratch (symbol buffer + generation-stamped
  * presence marks) is `@transient` and rebuilt lazily per executor
  * thread, so evaluation allocates nothing per row beyond the
  * UTF8String -> String copy.
  */
final class BpeTable private (
    private val ruleA: Array[Int],
    private val ruleB: Array[Int],
    private val ruleM: Array[Int],
    private val asciiId: Array[Int],
    private val wideId: java.util.HashMap[Integer, Integer],
    private val vocabSize: Int) extends Serializable {

  @transient private lazy val scratch: ThreadLocal[BpeTable.Scratch] =
    ThreadLocal.withInitial(() => new BpeTable.Scratch(vocabSize))

  /** Total BPE token count of `text`: words split on single spaces
    * (empties dropped), each word encoded independently. */
  def countAll(text: String): Int = {
    var total = 0
    val len = text.length
    var start = 0
    var i = 0
    while (i <= len) {
      if (i == len || text.charAt(i) == ' ') {
        if (i > start) total += countWord(text, start, i)
        start = i + 1
      }
      i += 1
    }
    total
  }

  /** Token array of `text` under the [[BpeSegment]] word-boundary
    * convention: word-initial tokens after the first word carry a
    * leading space. */
  def segmentAll(text: String): ArrayData = {
    val out = new java.util.ArrayList[AnyRef]()
    val len = text.length
    var start = 0
    var i = 0
    var firstWord = true
    while (i <= len) {
      if (i == len || text.charAt(i) == ' ') {
        if (i > start) {
          segmentWord(text, start, i, prefixSpace = !firstWord, out)
          firstWord = false
        }
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray())
  }

  /** The merge passes of [[countWord]] with parallel (start, end) char
    * ranges: merges only ever concatenate ADJACENT symbols, so every
    * symbol is a contiguous substring of the word and materializes
    * without re-concatenation. Kept separate from the count path so
    * counting never pays the range bookkeeping. */
  private def segmentWord(
      s: String, from: Int, until: Int, prefixSpace: Boolean,
      out: java.util.ArrayList[AnyRef]): Unit = {
    val sc = scratch.get()
    sc.nextGen()
    val g = sc.gen
    val stamp = sc.stamp
    var ids = sc.ids
    var starts = sc.starts
    var ends = sc.ends
    // the three arrays grow independently (the count path grows only
    // `ids`), so each is checked on its own
    val need = until - from
    if (ids.length < need) { ids = new Array[Int](need); sc.ids = ids }
    if (starts.length < need) { starts = new Array[Int](need); sc.starts = starts }
    if (ends.length < need) { ends = new Array[Int](need); sc.ends = ends }
    var n = 0
    var p = from
    while (p < until) {
      val cp = s.codePointAt(p)
      val id =
        if (cp < 128) asciiId(cp)
        else {
          val v = wideId.get(cp)
          if (v == null) 0 else v.intValue()
        }
      ids(n) = id
      starts(n) = p
      p += Character.charCount(cp)
      ends(n) = p
      if (id != 0) stamp(id) = g
      n += 1
    }
    val nRules = ruleA.length
    var r = 0
    while (r < nRules && n > 1) {
      val a = ruleA(r)
      val b = ruleB(r)
      if (stamp(a) == g && stamp(b) == g) {
        val m = ruleM(r)
        var i = 0
        var j = 0
        while (i < n) {
          if (i + 1 < n && ids(i) == a && ids(i + 1) == b) {
            ids(j) = m
            starts(j) = starts(i)
            ends(j) = ends(i + 1)
            stamp(m) = g
            i += 2
          } else {
            ids(j) = ids(i)
            starts(j) = starts(i)
            ends(j) = ends(i)
            i += 1
          }
          j += 1
        }
        n = j
      }
      r += 1
    }
    var k = 0
    while (k < n) {
      val sym = s.substring(starts(k), ends(k))
      out.add(UTF8String.fromString(
        if (k == 0 && prefixSpace) " " + sym else sym))
      k += 1
    }
  }

  private def countWord(s: String, from: Int, until: Int): Int = {
    val sc = scratch.get()
    sc.nextGen()
    val g = sc.gen
    val stamp = sc.stamp
    var ids = sc.ids
    if (ids.length < until - from) {
      ids = new Array[Int](until - from)
      sc.ids = ids
    }
    // initial symbols: one per code point; unknown code points get the
    // reserved id 0, which no rule operand can equal
    var n = 0
    var p = from
    while (p < until) {
      val cp = s.codePointAt(p)
      val id =
        if (cp < 128) asciiId(cp)
        else {
          val v = wideId.get(cp)
          if (v == null) 0 else v.intValue()
        }
      ids(n) = id
      if (id != 0) stamp(id) = g
      n += 1
      p += Character.charCount(cp)
    }
    // rank-order passes; a rule is skipped unless both operands have been
    // seen this word (the presence marks are add-only — merged-away
    // symbols stay marked — so skipping is conservative, never wrong)
    val nRules = ruleA.length
    var r = 0
    while (r < nRules && n > 1) {
      val a = ruleA(r)
      val b = ruleB(r)
      if (stamp(a) == g && stamp(b) == g) {
        val m = ruleM(r)
        var i = 0
        var j = 0
        while (i < n) {
          if (i + 1 < n && ids(i) == a && ids(i + 1) == b) {
            ids(j) = m
            stamp(m) = g
            i += 2
          } else {
            ids(j) = ids(i)
            i += 1
          }
          j += 1
        }
        n = j
      }
      r += 1
    }
    n
  }
}

object BpeTable {

  /** Per-thread mutable state: the symbol id buffer and the
    * generation-stamped presence array (stamp(id) == gen ⇔ symbol seen in
    * the current word — O(1) clear per word instead of O(vocab)). */
  private[functions] final class Scratch(vocabSize: Int) {
    var ids: Array[Int] = new Array[Int](64)
    var starts: Array[Int] = new Array[Int](64)
    var ends: Array[Int] = new Array[Int](64)
    val stamp: Array[Int] = new Array[Int](vocabSize)
    var gen: Int = 0
    def nextGen(): Unit = {
      gen += 1
      if (gen == Int.MaxValue) { // wraparound safety: clear and restart
        java.util.Arrays.fill(stamp, 0)
        gen = 1
      }
    }
  }

  def compile(merges: Seq[(String, String)]): BpeTable = {
    val vocab = new java.util.HashMap[String, Integer]()
    def intern(sym: String): Int = {
      val v = vocab.get(sym)
      if (v != null) v.intValue()
      else {
        val id = vocab.size() + 1 // 0 is reserved for unknown code points
        vocab.put(sym, id)
        id
      }
    }
    val nR = merges.length
    val ra = new Array[Int](nR)
    val rb = new Array[Int](nR)
    val rm = new Array[Int](nR)
    var r = 0
    merges.foreach { case (a, b) =>
      ra(r) = intern(a)
      rb(r) = intern(b)
      rm(r) = intern(a + b)
      r += 1
    }
    // single-code-point vocab entries are the initial-symbol alphabet
    val ascii = new Array[Int](128)
    val wide = new java.util.HashMap[Integer, Integer]()
    vocab.forEach { (sym, id) =>
      if (sym.codePointCount(0, sym.length) == 1) {
        val cp = sym.codePointAt(0)
        if (cp < 128) ascii(cp) = id.intValue() else wide.put(cp, id)
      }
    }
    new BpeTable(ra, rb, rm, ascii, wide, vocab.size() + 1)
  }
}
