package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.spark.ColumnBridge

/** Full HTML character-reference decoding in ONE linear pass — the
  * native-expression upgrade of the old five-entity regexp chain
  * (VERDICT r16 item 2): decimal (`&#8217;`) and hex (`&#x2019;`)
  * numeric references plus the common named set ([[EntityTable.Named]]:
  * the XML five, `&nbsp;`, the full Latin-1 block, and the HTML4
  * typography/arrow/math commons) decode from a compiled table riding
  * the task binary (the [[BpeCount]] pattern — shipped once per task,
  * never per row).
  *
  * Semantics (shared bit for bit with the DuckDB oracle mirror, which
  * replays the SAME regex as a split/extract interleave —
  * [[graft.text.Html.Sql.decodeEntities]]):
  *
  *  - a reference is `&` + (`#` + 1..7 decimal digits | `#x`/`#X` +
  *    1..6 hex digits | a table name) + `;` — the semicolon is
  *    REQUIRED (HTML5's legacy semicolonless forms stay literal);
  *  - one pass, never re-decoded: `&amp;mdash;` yields the literal
  *    text `&mdash;` (the standard double-escape order);
  *  - numeric codepoints in `0x80–0x9F` remap through windows-1252
  *    (HTML5 §13.2.5.72 table: `&#147;` is `“`, the broken-CMS
  *    smart quote every real crawl contains);
  *  - invalid codepoints (0, surrogates, > 0x10FFFF) and unknown names
  *    stay literal;
  *  - `&nbsp;`/`&#160;` decode to a REAL U+00A0 (the table is pure);
  *    [[graft.text.Html]]'s whitespace normalization folds it to a
  *    plain space afterwards.
  */
case class HtmlEntityDecode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "html_entity_decode"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      EntityTable.decode(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("entityTable", EntityTable,
      EntityTable.getClass.getName)
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"$ref.decode($c.toString()))")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HtmlEntityDecode {
  /** Column-API entry point. */
  def apply(text: Column): Column =
    ColumnBridge.column(HtmlEntityDecode(ColumnBridge.expression(text)))
}

/** The compiled reference table + decoder shared by the expression and
  * the oracle-SQL renderer. A singleton: the name set is fixed, so the
  * codegen reference is one serializable object. */
object EntityTable extends Serializable {

  /** Named references → codepoint. XML five + `nbsp` + the Latin-1
    * block (HTML 2.0/3.2 standard names, both cases) + the HTML4
    * typography / currency / arrow / math commons. All single
    * codepoints. */
  val Named: Seq[(String, Int)] = {
    val xml = Seq(
      "amp" -> 38, "lt" -> 60, "gt" -> 62, "quot" -> 34, "apos" -> 39)
    val latin1Symbols = Seq(
      "nbsp" -> 160, "iexcl" -> 161, "cent" -> 162, "pound" -> 163,
      "curren" -> 164, "yen" -> 165, "brvbar" -> 166, "sect" -> 167,
      "uml" -> 168, "copy" -> 169, "ordf" -> 170, "laquo" -> 171,
      "not" -> 172, "shy" -> 173, "reg" -> 174, "macr" -> 175,
      "deg" -> 176, "plusmn" -> 177, "sup2" -> 178, "sup3" -> 179,
      "acute" -> 180, "micro" -> 181, "para" -> 182, "middot" -> 183,
      "cedil" -> 184, "sup1" -> 185, "ordm" -> 186, "raquo" -> 187,
      "frac14" -> 188, "frac12" -> 189, "frac34" -> 190, "iquest" -> 191,
      "times" -> 215, "divide" -> 247)
    val latin1Letters = Seq(
      "Agrave" -> 192, "Aacute" -> 193, "Acirc" -> 194, "Atilde" -> 195,
      "Auml" -> 196, "Aring" -> 197, "AElig" -> 198, "Ccedil" -> 199,
      "Egrave" -> 200, "Eacute" -> 201, "Ecirc" -> 202, "Euml" -> 203,
      "Igrave" -> 204, "Iacute" -> 205, "Icirc" -> 206, "Iuml" -> 207,
      "ETH" -> 208, "Ntilde" -> 209, "Ograve" -> 210, "Oacute" -> 211,
      "Ocirc" -> 212, "Otilde" -> 213, "Ouml" -> 214, "Oslash" -> 216,
      "Ugrave" -> 217, "Uacute" -> 218, "Ucirc" -> 219, "Uuml" -> 220,
      "Yacute" -> 221, "THORN" -> 222, "szlig" -> 223,
      "agrave" -> 224, "aacute" -> 225, "acirc" -> 226, "atilde" -> 227,
      "auml" -> 228, "aring" -> 229, "aelig" -> 230, "ccedil" -> 231,
      "egrave" -> 232, "eacute" -> 233, "ecirc" -> 234, "euml" -> 235,
      "igrave" -> 236, "iacute" -> 237, "icirc" -> 238, "iuml" -> 239,
      "eth" -> 240, "ntilde" -> 241, "ograve" -> 242, "oacute" -> 243,
      "ocirc" -> 244, "otilde" -> 245, "ouml" -> 246, "oslash" -> 248,
      "ugrave" -> 249, "uacute" -> 250, "ucirc" -> 251, "uuml" -> 252,
      "yacute" -> 253, "thorn" -> 254, "yuml" -> 255)
    val typography = Seq(
      "OElig" -> 338, "oelig" -> 339, "Scaron" -> 352, "scaron" -> 353,
      "Yuml" -> 376, "fnof" -> 402, "circ" -> 710, "tilde" -> 732,
      "ensp" -> 8194, "emsp" -> 8195, "thinsp" -> 8201,
      "zwnj" -> 8204, "zwj" -> 8205, "lrm" -> 8206, "rlm" -> 8207,
      "ndash" -> 8211, "mdash" -> 8212,
      "lsquo" -> 8216, "rsquo" -> 8217, "sbquo" -> 8218,
      "ldquo" -> 8220, "rdquo" -> 8221, "bdquo" -> 8222,
      "dagger" -> 8224, "Dagger" -> 8225, "bull" -> 8226,
      "hellip" -> 8230, "permil" -> 8240, "prime" -> 8242,
      "Prime" -> 8243, "lsaquo" -> 8249, "rsaquo" -> 8250,
      "oline" -> 8254, "frasl" -> 8260, "euro" -> 8364, "trade" -> 8482)
    val mathArrows = Seq(
      "larr" -> 8592, "uarr" -> 8593, "rarr" -> 8594, "darr" -> 8595,
      "harr" -> 8596, "minus" -> 8722, "lowast" -> 8727, "infin" -> 8734,
      "ne" -> 8800, "le" -> 8804, "ge" -> 8805, "asymp" -> 8776,
      "equiv" -> 8801)
    xml ++ latin1Symbols ++ latin1Letters ++ typography ++ mathArrows
  }

  /** HTML5 §13.2.5.72: numeric references in 0x80–0x9F are
    * windows-1252 bytes, not C1 controls. The five unmapped slots
    * (0x81, 0x8D, 0x8F, 0x90, 0x9D) stay as their raw codepoints. */
  val Cp1252Remap: Seq[(Int, Int)] = Seq(
    128 -> 8364, 130 -> 8218, 131 -> 402, 132 -> 8222, 133 -> 8230,
    134 -> 8224, 135 -> 8225, 136 -> 710, 137 -> 8240, 138 -> 352,
    139 -> 8249, 140 -> 338, 142 -> 381, 145 -> 8216, 146 -> 8217,
    147 -> 8220, 148 -> 8221, 149 -> 8226, 150 -> 8211, 151 -> 8212,
    152 -> 732, 153 -> 8482, 154 -> 353, 155 -> 8250, 156 -> 339,
    158 -> 382, 159 -> 376)

  /** The shared reference regex (group 1 = the payload between `&` and
    * `;`): numeric alternatives first, then names LONGEST FIRST so
    * prefix pairs resolve identically under leftmost-first (Java) and
    * any alternation order (RE2) — though the mandatory `;` already
    * disambiguates every pair in the table. */
  val ReferencePattern: String =
    "&(#[0-9]{1,7}|#[xX][0-9a-fA-F]{1,6}|" +
      Named.map(_._1).sortBy(n => (-n.length, n)).mkString("|") + ");"

  private val names: java.util.HashMap[String, String] = {
    val m = new java.util.HashMap[String, String]()
    Named.foreach { case (n, cp) => m.put(n, new String(Character.toChars(cp))) }
    m
  }

  private val remap: java.util.HashMap[Integer, Integer] = {
    val m = new java.util.HashMap[Integer, Integer]()
    Cp1252Remap.foreach { case (from, to) => m.put(from, to) }
    m
  }

  @transient private lazy val pattern: java.util.regex.Pattern =
    java.util.regex.Pattern.compile(ReferencePattern)

  private def decodeValue(v: String, full: String): String =
    if (v.charAt(0) == '#') {
      val isHex = v.length > 1 && (v.charAt(1) == 'x' || v.charAt(1) == 'X')
      // lengths are regex-capped (7 dec / 6 hex digits), so parse fits Int
      val cp0 = if (isHex) Integer.parseInt(v.substring(2), 16)
        else Integer.parseInt(v.substring(1))
      if (cp0 < 1 || cp0 > 0x10FFFF || (cp0 >= 0xD800 && cp0 <= 0xDFFF)) full
      else {
        val r = remap.get(cp0)
        new String(Character.toChars(if (r == null) cp0 else r.intValue()))
      }
    } else names.get(v) // regex only matches table names: never null

  /** One left-to-right pass: each reference match is replaced by its
    * decoded form (or left literal when numerically invalid); the
    * output is never rescanned. */
  def decode(s: String): String = {
    val m = pattern.matcher(s)
    if (!m.find()) return s // fast path: most blocks carry no entity
    val sb = new java.lang.StringBuilder(s.length)
    var last = 0
    do {
      sb.append(s, last, m.start())
      sb.append(decodeValue(m.group(1), m.group()))
      last = m.end()
    } while (m.find())
    sb.append(s, last, s.length)
    sb.toString
  }
}
