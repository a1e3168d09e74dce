package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.spark.ColumnBridge

/** Registrable domain (eTLD+1) under a FULL public-suffix list — the
  * loader the built-in [[graft.text.Urls.MultiPartTlds]] subset was
  * designed to be swapped for (VERDICT r16 item 5: `github.io`-style
  * private suffixes misgroup under the subset).
  *
  * The list compiles to hash tables riding the task binary (the
  * [[BpeCount]] pattern) and evaluation is an O(labels) suffix walk —
  * zero shuffle, zero join, strictly cheaper at 100 TB than exploding
  * candidate suffixes into a broadcast join and re-grouping. Rules
  * follow the publicsuffix.org algorithm:
  *
  *  - a plain rule (`com`, `co.uk`, `github.io`) marks itself a public
  *    suffix;
  *  - a wildcard rule (`*.ck`) marks every DIRECT child of its base a
  *    public suffix;
  *  - an exception rule (`!www.ck`) overrides a wildcard: the rule
  *    minus its leftmost label is the public suffix (so `www.ck` is
  *    itself registrable). Exceptions beat everything; otherwise the
  *    LONGEST matching rule wins; no match falls back to the implicit
  *    `*` rule (the bare TLD is the public suffix).
  *
  * The registrable domain is the public suffix plus one label. A host
  * that IS a public suffix (`co.uk`, `other.ck` under `*.ck`) has no
  * registrable domain and yields NULL — gate or coalesce at the call
  * site. Hosts are lowercased and FQDN trailing dots stripped first
  * (the [[graft.text.Urls.registrableDomain]] convention).
  */
case class PslDomain(child: Expression, table: PslTable)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "psl_domain"

  override def nullSafeEval(input: Any): Any = {
    val r = table.registrable(input.asInstanceOf[UTF8String].toString)
    if (r == null) null else UTF8String.fromString(r)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("pslTable", table, classOf[PslTable].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("psl")
      s"""String $tmp = $ref.registrable($c.toString());
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($tmp); }
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PslDomain {
  /** Column-API entry point. */
  def apply(host: Column, table: PslTable): Column =
    ColumnBridge.column(PslDomain(ColumnBridge.expression(host), table))
}

/** Compiled public-suffix rule set. Build once on the driver
  * ([[PslTable.compile]] from rule strings, or [[PslTable.fromDataFrame]]
  * from a loaded list — the real PSL is ~10k rules, a trivial driver
  * collect); the instance serializes into each task like a broadcast. */
final class PslTable private (
    private val plain: java.util.HashMap[String, Integer],
    private val wildcardBase: java.util.HashMap[String, Integer],
    private val exception: java.util.HashMap[String, Integer],
    private val maxRuleLabels: Int) extends Serializable {

  /** Registrable domain of `host`, or null when the host is itself a
    * public suffix (or empty). */
  def registrable(host: String): String = {
    var h = host.toLowerCase(java.util.Locale.ROOT)
    var end = h.length
    while (end > 0 && h.charAt(end - 1) == '.') end -= 1
    if (end == 0) return null
    if (end != h.length) h = h.substring(0, end)

    // label start offsets, right to left
    val starts = new java.util.ArrayList[Integer]()
    var i = h.length - 1
    while (i >= 0) {
      if (h.charAt(i) == '.') starts.add(i + 1)
      i -= 1
    }
    starts.add(0)
    val nLabels = starts.size()

    // walk suffixes short -> long; exceptions win outright, otherwise
    // the longest matching rule (wildcards count one label deeper)
    var best = 1 // the implicit '*' rule
    var k = 1
    val maxK = math.min(nLabels, maxRuleLabels + 1)
    var exceptionPs = -1
    while (k <= maxK && exceptionPs < 0) {
      val suffix = h.substring(starts.get(k - 1))
      val ex = exception.get(suffix)
      if (ex != null) exceptionPs = ex.intValue()
      else {
        val p = plain.get(suffix)
        if (p != null && p.intValue() > best) best = p.intValue()
        val w = wildcardBase.get(suffix)
        if (w != null && w.intValue() > best) best = w.intValue()
      }
      k += 1
    }
    val psLen = if (exceptionPs >= 0) exceptionPs else best
    if (nLabels <= psLen) null
    else h.substring(starts.get(psLen))
  }
}

object PslTable {

  private def labelCount(s: String): Int = s.count(_ == '.') + 1

  /** Compile publicsuffix.org-format rules. Comment lines (`//`) and
    * blanks are skipped so a raw PSL file's lines load as-is. */
  def compile(rules: Seq[String]): PslTable = {
    val plain = new java.util.HashMap[String, Integer]()
    val wild = new java.util.HashMap[String, Integer]()
    val exc = new java.util.HashMap[String, Integer]()
    var maxLabels = 1
    rules.iterator
      .map(_.trim.toLowerCase(java.util.Locale.ROOT))
      .filter(r => r.nonEmpty && !r.startsWith("//"))
      .foreach { r =>
        if (r.startsWith("!")) {
          val body = r.substring(1)
          // public suffix = the rule minus its leftmost label
          exc.put(body, labelCount(body) - 1)
          maxLabels = math.max(maxLabels, labelCount(body))
        } else if (r.startsWith("*.")) {
          val base = r.substring(2)
          // any direct child of the base is a public suffix
          wild.put(base, labelCount(base) + 1)
          maxLabels = math.max(maxLabels, labelCount(base) + 1)
        } else {
          plain.put(r, labelCount(r))
          maxLabels = math.max(maxLabels, labelCount(r))
        }
      }
    new PslTable(plain, wild, exc, maxLabels)
  }

  /** Load rules from the first column of a DataFrame (e.g.
    * `spark.read.text(pslPath)`). The PSL is ~10k rows: a bounded
    * driver collect, compiled once, shipped with the task binary. */
  def fromDataFrame(df: DataFrame): PslTable = {
    val colName = df.columns.head
    compile(df.select(colName).collect().map(_.getString(0)).toSeq)
  }
}
