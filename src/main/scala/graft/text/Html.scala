package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Raw-HTML ingestion: markup strip + boilerplate block filtering —
  * the stage every crawled-corpus pipeline runs BEFORE the text surface
  * ([[TextFunctions.qualityScore]], dedup, PII) sees a byte (VERDICT
  * r15 item 3; the reference's tests feed plain text, so this is
  * engine-added surface like the rest of the LLM-pipeline family).
  *
  * Everything is a pure `Column` composition of built-in regexp/array
  * functions — codegen'd, zero shuffle, same contract as
  * [[TextFunctions]] — so extraction runs as a narrow map over a
  * 100 TB crawl with no exchange of its own. The design follows the
  * published jusText/trafilatura shape: drop non-content elements
  * outright, split what remains into BLOCKS at block-level tag
  * boundaries, then keep blocks that look like prose (enough
  * characters, low link density) and drop navigation/footer chrome
  * (short, link-dense).
  *
  * Cross-engine notes (the DuckDB oracle replays every step): patterns
  * avoid Java-only regex features — no backreferences (script/style get
  * one alternation each instead of `</\1>`), no lookaround, explicit
  * `[ \t\n\r]` whitespace classes (Java `\s` and RE2 `\s` disagree on
  * vertical tab) — so Java regex (Spark) and RE2 (DuckDB) match
  * identically. Entity decoding is the native
  * [[graft.functions.HtmlEntityDecode]] expression (decimal/hex numeric
  * references + the common named table, one linear pass, applied AFTER
  * tag stripping); the [[Sql]] mirror replays the same reference regex
  * as a split/extract interleave with the same table rendered into the
  * SQL, so both engines decode — and refuse to decode — identically.
  */
object Html {

  /** Elements whose CONTENT is dropped wholesale (not just the tags):
    * code, styling, and non-rendered metadata. One alternation per
    * element because RE2 has no backreferences. */
  private val DropContent = Seq("script", "style", "noscript", "svg", "head")

  /** Block-level boundary tags — opening OR closing occurrences split
    * the document into candidate text blocks (inline tags like <a>,
    * <b>, <span> do NOT split: their text belongs to the enclosing
    * block). */
  val BlockTags: Seq[String] = Seq(
    "p", "div", "li", "ul", "ol", "h1", "h2", "h3", "h4", "h5", "h6",
    "table", "tr", "td", "th", "section", "article", "header", "footer",
    "nav", "aside", "blockquote", "pre", "form", "main", "body", "html",
    "title", "br", "hr")

  private val blockSplitPattern =
    "(?i)</?(?:" + BlockTags.mkString("|") + ")(?:[ \t\n\r][^>]*)?/?>"

  /** Strip comments and drop-content elements (script/style/…): the
    * shared first pass of [[stripMarkup]] and [[blocks]]. */
  def dropNonContent(html: Column): Column = {
    val noComments = regexp_replace(html, "(?s)<!--.*?-->", " ")
    DropContent.foldLeft(noComments) { (c, tag) =>
      regexp_replace(c, s"(?is)<$tag(?:[ \t\n\r][^>]*)?>.*?</$tag[ \t\n\r]*>", " ")
    }
  }

  /** Remove every remaining tag and decode character references;
    * collapse runs of whitespace to one space and trim. The TAG-ONLY
    * strip — fast path when block filtering is not wanted. */
  def stripTags(fragment: Column): Column =
    normalizeSpace(decodeEntities(
      regexp_replace(fragment, "<[^>]*>", " ")))

  /** Full character-reference decoding, applied AFTER tag stripping:
    * decimal/hex numeric references and the common named set in ONE
    * linear pass of the native [[graft.functions.HtmlEntityDecode]]
    * expression (VERDICT r16 item 2 — the old five-entity regexp chain
    * left `&#8217;`/`&mdash;` as literal junk in main_text). Single
    * pass means `&amp;mdash;` stays the literal `&mdash;` (the
    * standard double-escape order); `&nbsp;`/`&#160;` decode to a real
    * U+00A0, which [[normalizeSpace]] folds to a plain space. */
  def decodeEntities(text: Column): Column =
    graft.functions.HtmlEntityDecode(text)

  /** Whitespace collapse; U+00A0 is in the class because
    * [[decodeEntities]] emits real no-break spaces. */
  private def normalizeSpace(text: Column): Column =
    trim(regexp_replace(text, "[ \t\n\r\u00a0]+", " "))

  /** Whole-document markup strip: comments + script/style content out,
    * all tags out, entities decoded, whitespace normalized. The
    * boilerplate REMAINS (nav text, footers) — use [[extractMainText]]
    * to drop it. */
  def stripMarkup(html: Column): Column = stripTags(dropNonContent(html))

  /** Candidate text blocks with per-block boilerplate features — an
    * array of structs `(text, n_chars, link_chars, n_words,
    * stop_words)`:
    *
    *  - `text`: the block's visible text (tags stripped, entities
    *    decoded, space-normalized); empty blocks are dropped here so
    *    downstream counts are split-semantics-independent;
    *  - `n_chars`: its length;
    *  - `link_chars`: characters of visible text sitting INSIDE
    *    `<a>…</a>` — `link_chars / n_chars` is the jusText link
    *    density, the single most effective chrome discriminator
    *    (menus are nearly 100% anchor text, prose nearly 0%);
    *  - `n_words` / `stop_words`: whitespace-token count and how many
    *    of them (lowercased) are [[TextFunctions.DefaultStopwords]] —
    *    `stop_words / n_words` is jusText's OTHER load-bearing signal
    *    (VERDICT r16 item 3): prose carries function words, while
    *    short non-link boilerplate ("Posted by admin on …") does not.
    *    English-list caveat: a non-English pipeline swaps the list by
    *    composing these ops with its own stopword set.
    */
  def blocks(html: Column): Column = {
    val raw = split(dropNonContent(html), blockSplitPattern)
    val stops = array(TextFunctions.DefaultStopwords.map(lit): _*)
    val withFeatures = transform(raw, b => {
      val anchorTexts =
        regexp_extract_all(b,
          lit("(?is)<a(?:[ \t\n\r][^>]*)?>(.*?)</a[ \t\n\r]*>"), lit(1))
      val linkChars = aggregate(
        anchorTexts, lit(0L),
        (acc, a) => acc + length(stripTags(a)).cast("long"))
      val text = stripTags(b)
      val toks = filter(split(text, " "), t => t =!= lit(""))
      struct(
        text.as("text"),
        length(text).cast("long").as("n_chars"),
        linkChars.as("link_chars"),
        size(toks).cast("long").as("n_words"),
        size(filter(toks, t => array_contains(stops, lower(t))))
          .cast("long").as("stop_words"))
    })
    filter(withFeatures, b => b.getField("n_chars") > 0L)
  }

  /** Boilerplate-filtered extraction: keep blocks with at least
    * `minChars` of visible text and link density at most
    * `maxLinkDensity`, joined with newlines — the trafilatura-lite main
    * text. Short link-dense chrome (navigation, footers, tag clouds,
    * cookie banners) drops; prose survives.
    *
    * Density compares as `link_chars * DENSITY_SCALE <= maxLinkDensity
    * * n_chars * DENSITY_SCALE` in exact integers (both sides Long), so
    * the oracle replays the predicate with no float rounding concerns —
    * `maxLinkDensity` and `minStopFrac` are quantized to 1/1000ths.
    *
    * `minStopFrac` (default 0 = off, bit-exact no-op) is the jusText
    * stopword-density gate: keep a block only when
    * `stop_words / n_words >= minStopFrac` — the signal that drops
    * short NON-link boilerplate ("Posted by admin on …") that the
    * link-density gate cannot see (VERDICT r16 item 3). */
  def extractMainText(
      html: Column, minChars: Int = 25, maxLinkDensity: Double = 0.33,
      minStopFrac: Double = 0.0): Column = {
    val mil = math.round(maxLinkDensity * 1000).toInt
    val msf = math.round(minStopFrac * 1000).toInt
    val kept = filter(blocks(html), b =>
      b.getField("n_chars") >= minChars.toLong &&
        b.getField("link_chars") * lit(1000L) <= b.getField("n_chars") * lit(mil.toLong) &&
        b.getField("stop_words") * lit(1000L) >= b.getField("n_words") * lit(msf.toLong))
    array_join(transform(kept, _.getField("text")), "\n")
  }

  /** All `href` attribute values of `<a>` tags — double-quoted
    * attributes first, then single-quoted, then unquoted
    * (`href=/x`, legal HTML4/5 and common in old crawls — VERDICT r16),
    * each group in document order — the outlink extractor feeding a
    * crawl graph (pair with [[Urls.resolve]] / [[Urls.canonicalizeUrl]] /
    * [[Urls.registrableDomain]] and [[graft.core.Graph.index]] to build
    * page→domain edges). The `href` name must be preceded by tag
    * whitespace, so a `data-href="evil"` attribute can no longer donate
    * a false outlink through its suffix (ADVICE r16). Relative URLs
    * come back as written — [[Urls.resolve]] against the page URL is
    * the caller's next map. */
  def extractLinks(html: Column): Column = {
    val cleaned = dropNonContent(html)
    val pre = "(?is)<a[ \t\n\r](?:[^>]*[ \t\n\r])?href[ \t\n\r]*=[ \t\n\r]*"
    val dq = regexp_extract_all(cleaned, lit(pre + "\"([^\"]*)\""), lit(1))
    val sq = regexp_extract_all(cleaned, lit(pre + "'([^']*)'"), lit(1))
    val uq = regexp_extract_all(cleaned,
      lit(pre + "([^ \t\n\r>\"'][^ \t\n\r>]*)"), lit(1))
    concat(dq, sq, uq)
  }

  /** DuckDB-dialect SQL mirrors of every op above, for the oracle gate:
    * each takes a SQL expression string and wraps it in the SAME regex
    * passes the Column face applies (patterns byte-identical modulo
    * whitespace-escape spelling — the Column face embeds real tab/LF
    * characters, the SQL face spells `\t`/`\n`, which RE2 reads as the
    * same characters). DuckDB `regexp_replace` is first-match-only by
    * default, hence the explicit 'g' everywhere. */
  object Sql {
    private def replaceAll(e: String, pat: String, rep: String): String =
      s"regexp_replace($e, '$pat', '$rep', 'g')"

    def dropNonContent(e: String): String =
      DropContent.foldLeft(replaceAll(e, "(?s)<!--.*?-->", " ")) { (c, tag) =>
        replaceAll(c,
          s"(?is)<$tag(?:[ \\t\\n\\r][^>]*)?>.*?</$tag[ \\t\\n\\r]*>", " ")
      }

    /** The [[graft.functions.HtmlEntityDecode]] pass as a DuckDB
      * split/extract interleave: the text splits on the SAME reference
      * regex the expression compiles, and each match decodes through
      * the SAME table ([[graft.functions.EntityTable.Named]] /
      * `Cp1252Remap` rendered as CASE arms) — numeric values parse via
      * TRY_CAST ('0x'-prefixed for hex), invalid codepoints fall back
      * to the literal match text exactly like the JVM face. DuckDB
      * evaluates CASE branches lazily, so the guarded `chr()` never
      * sees a surrogate (probed; see tools/notes). */
    def decodeEntities(e: String): String = {
      import graft.functions.EntityTable
      val pat = EntityTable.ReferencePattern
      val parts = s"regexp_split_to_array($e, '$pat')"
      val vals = s"(regexp_extract_all($e, '$pat', 1))[i]"
      val fulls = s"(regexp_extract_all($e, '$pat', 0))[i]"
      val named = EntityTable.Named.map { case (n, cp) =>
        s"WHEN '$n' THEN chr($cp)" }.mkString(" ")
      val remap = EntityTable.Cp1252Remap.map { case (f, t) =>
        s"WHEN $f THEN $t" }.mkString(" ")
      def guarded(cp: String) =
        s"(CASE WHEN $cp BETWEEN 1 AND 1114111 AND " +
          s"NOT ($cp BETWEEN 55296 AND 57343) " +
          s"THEN chr(CASE $cp $remap ELSE $cp END) ELSE $fulls END)"
      val hexCp = s"TRY_CAST(('0x' || substr($vals, 3)) AS INT)"
      val decCp = s"TRY_CAST(substr($vals, 2) AS INT)"
      val decoded =
        s"(CASE WHEN starts_with($vals, '#x') OR starts_with($vals, '#X') " +
          s"THEN ${guarded(hexCp)} " +
          s"WHEN starts_with($vals, '#') THEN ${guarded(decCp)} " +
          s"ELSE (CASE $vals $named ELSE $fulls END) END)"
      s"""array_to_string(list_transform(range(1, len($parts) + 1),
         | i -> ($parts)[i] || coalesce($decoded, '')), '')""".stripMargin
    }

    def normalizeSpace(e: String): String =
      s"trim(${replaceAll(e, "[ \\t\\n\\r\\x{00A0}]+", " ")})"

    def stripTags(e: String): String =
      normalizeSpace(decodeEntities(replaceAll(e, "<[^>]*>", " ")))

    def stripMarkup(e: String): String = stripTags(dropNonContent(e))

    private val blockSplitSql =
      "(?i)</?(?:" + BlockTags.mkString("|") + ")(?:[ \\t\\n\\r][^>]*)?/?>"
    private val anchorSql =
      "(?is)<a(?:[ \\t\\n\\r][^>]*)?>(.*?)</a[ \\t\\n\\r]*>"

    /** Two-stage transform (same passes as the Column face): stage one
      * strips each block ONCE (`text`) and runs the anchor pass on the
      * raw block; stage two derives every count from the small `s.text`
      * reference — keeps the entity-decode interleave from being
      * inlined five times per block lambda, which made the generated
      * expression tree quadratic for DuckDB's executor. */
    def blocks(e: String): String = {
      val linkChars =
        "coalesce(list_sum(list_transform(" +
          s"regexp_extract_all(b, '$anchorSql', 1), " +
          s"a -> length(${stripTags("a")}))), 0)"
      val stopSet = graft.text.TextFunctions.DefaultStopwords
        .map(s => s"'$s'").mkString("[", ", ", "]")
      val toks = "list_filter(string_split(s.text, ' '), x -> x <> '')"
      s"""list_filter(list_transform(list_transform(
         |  regexp_split_to_array(${dropNonContent(e)}, '$blockSplitSql'),
         |  b -> {'text': ${stripTags("b")},
         |        'link_chars': CAST($linkChars AS BIGINT)}),
         |  s -> {'text': s.text,
         |        'n_chars': CAST(length(s.text) AS BIGINT),
         |        'link_chars': s.link_chars,
         |        'n_words': CAST(len($toks) AS BIGINT),
         |        'stop_words': CAST(len(list_filter($toks,
         |          x -> list_contains($stopSet, lower(x)))) AS BIGINT)}),
         | s -> s.n_chars > 0)""".stripMargin
    }

    def extractMainText(
        e: String, minChars: Int = 25, maxLinkDensity: Double = 0.33,
        minStopFrac: Double = 0.0): String = {
      val mil = math.round(maxLinkDensity * 1000).toInt
      val msf = math.round(minStopFrac * 1000).toInt
      // coalesce: DuckDB array_to_string([]) is NULL, Spark array_join
      // over an all-filtered page is ''
      s"""coalesce(array_to_string(list_transform(list_filter(${blocks(e)},
         |  k -> k.n_chars >= $minChars AND k.link_chars * 1000 <= k.n_chars * $mil
         |    AND k.stop_words * 1000 >= k.n_words * $msf),
         |  k -> k.text), chr(10)), '')""".stripMargin
    }

    def extractLinks(e: String): String = {
      val cleaned = dropNonContent(e)
      val pre = "(?is)<a[ \\t\\n\\r](?:[^>]*[ \\t\\n\\r])?href[ \\t\\n\\r]*=[ \\t\\n\\r]*"
      val dq = pre + "\"([^\"]*)\""
      val sq = pre + "''([^'']*)''"
      val uq = pre + "([^ \\t\\n\\r>\"''][^ \\t\\n\\r>]*)"
      s"""list_concat(list_concat(regexp_extract_all($cleaned, '$dq', 1),
         |  regexp_extract_all($cleaned, '$sq', 1)),
         |  regexp_extract_all($cleaned, '$uq', 1))""".stripMargin
    }
  }
}
