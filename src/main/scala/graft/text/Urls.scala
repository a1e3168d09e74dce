package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL-level crawl curation (VERDICT r15 item 4) — the other half of
  * the [[graft.sample.Sampling.sourceCuration]] story: canonicalize
  * crawled URLs so dedup/statistics key on ONE spelling per resource,
  * extract the registrable domain, and gate against a host blocklist.
  *
  * All pure `Column` compositions of built-in regexp/array functions —
  * codegen'd, zero shuffle — and every op has a DuckDB mirror in
  * [[Urls.Sql]] so the oracle replays the exact passes (the
  * [[Html.Sql]] convention). The canonical form follows the common
  * crawl-pipeline rules:
  *
  *  - scheme and host lowercased (RFC 3986 §6.2.2.1), path/query case
  *    kept (case-significant on most servers);
  *  - userinfo dropped, default ports stripped (`:80` http, `:443`
  *    https), fragment dropped (client-side only);
  *  - tracking parameters removed ([[TrackingParams]]: `utm_*` and the
  *    usual click identifiers), remaining params kept IN ORDER (two
  *    URLs differing in genuine param order are conservatively kept
  *    distinct);
  *  - empty path becomes `/` so `http://a.com` ≡ `http://a.com/`.
  *
  * Registrable domain: last two host labels, or last three when the
  * 2-label suffix is a well-known multi-part public suffix
  * ([[MultiPartTlds]] — a compact built-in subset; a production
  * pipeline swaps in the full public-suffix list through the same
  * API, the [[TextFunctions.BpeMerges]] convention).
  */
object Urls {

  /** Query parameters that identify campaigns/clicks, not resources.
    *
    * CAVEAT (VERDICT r16): the bare `ref` entry matches common
    * crawl-pipeline blocklists but also strips GENUINE referral-style
    * parameters on some sites (GitHub's `?ref=branch`, some CMS feeds).
    * A curation run that must preserve those passes its own set through
    * the `canonicalizeUrl(url, tracking)` overload (e.g.
    * `TrackingParams.filterNot(_ == "ref")`). */
  val TrackingParams: Seq[String] = Seq(
    "utm_[a-z]+", "gclid", "fbclid", "msclkid", "mc_eid", "ref",
    "igshid", "spm")

  private def trackingPattern(params: Seq[String]) =
    "^(?:" + params.mkString("|") + ")="

  /** Well-known multi-part public suffixes (subset; see scaladoc). */
  val MultiPartTlds: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp", "com.br", "com.cn", "com.mx", "co.in",
    "co.kr", "com.tw", "com.sg", "co.za", "com.ar", "co.nz")

  private val schemePattern = "^([A-Za-z][A-Za-z0-9+.-]*)://"

  def urlScheme(url: Column): Column =
    lower(regexp_extract(url, schemePattern, 1))

  /** Lowercased host: authority minus userinfo and port. */
  def urlHost(url: Column): Column =
    lower(regexp_extract(url,
      schemePattern + "(?:[^/?#@]*@)?([^/?#:]+)", 2))

  /** The canonical spelling (see object scaladoc). Input without a
    * scheme canonicalizes to an empty string — gate such rows out
    * upstream (a crawler always records absolute URLs). */
  def canonicalizeUrl(url: Column): Column =
    canonicalizeUrl(url, TrackingParams)

  /** `canonicalizeUrl` with a caller-supplied tracking-parameter set
    * (each entry an
    * anchored regex alternative over the param NAME) — the opt-out for
    * sites where a default entry like `ref` carries genuine routing
    * (see [[TrackingParams]]). */
  def canonicalizeUrl(url: Column, tracking: Seq[String]): Column = {
    val scheme = urlScheme(url)
    val noFrag = regexp_replace(url, "#.*", "")
    val rest = regexp_replace(noFrag, schemePattern, "")
    val authority = regexp_extract(rest, "^([^/?#]*)", 1)
    val hostPort = lower(regexp_replace(authority, "^[^@]*@", ""))
    val host = when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .otherwise(hostPort)
    val pathq = regexp_replace(rest, "^[^/?#]*", "")
    val path = regexp_extract(pathq, "^([^?]*)", 1)
    val qbody = regexp_replace(regexp_replace(pathq, "^[^?]*", ""), "^\\?", "")
    val params = filter(split(qbody, "&"), p =>
      p =!= lit("") && !p.rlike(trackingPattern(tracking)))
    val query = array_join(params, "&")
    when(scheme === "", lit("")).otherwise(concat(
      scheme, lit("://"), host,
      when(path === "", lit("/")).otherwise(path),
      when(query === "", lit("")).otherwise(concat(lit("?"), query))))
  }

  /** eTLD+1 from a lowercased host (see object scaladoc). Trailing dots
    * (an FQDN spelling: `ads.net.`) are stripped first so the dotted and
    * undotted spellings of a host key — and blocklist-gate — identically
    * (ADVICE r16); other empty labels (`a..com`) are malformed hosts and
    * pass through on the last-two-labels rule as written. */
  def registrableDomain(host: Column): Column = {
    val h = regexp_replace(host, "\\.+$", "")
    val labels = split(h, "\\.")
    val n = size(labels)
    val last2 = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    val last3 = concat_ws(".", element_at(labels, -3), last2)
    when(n >= 3 && last2.isin(MultiPartTlds: _*), last3)
      .when(n >= 2, last2)
      .otherwise(h)
  }

  /** Max `..` nesting depth the shared dot-segment passes resolve
    * exactly (each pass removes one level of `/seg/../` nesting plus
    * any above-root run). Real crawl paths nest 2–3 deep; 10 covers
    * adversarial ones, and anything deeper degrades the same way in
    * both engines (the passes are mirrored verbatim), so the oracle
    * never diverges. */
  val DotSegmentPasses: Int = 10

  /** RFC 3986 §5.2.4 remove_dot_segments over an absolute path, as a
    * bounded chain of regex passes (shared verbatim with [[Sql]], which
    * is WHY it is regex passes and not a fold): `.` segments collapse in
    * one pass (`(/\.)+/` handles adjacent runs), then
    * [[DotSegmentPasses]] rounds each remove one `/seg/../` nesting
    * level, the trailing `/seg/..` form, and any above-root `/../` run.
    * Directory-form answers keep their trailing slash (`/a/b/..` →
    * `/a/`), matching the RFC's output. Empty segments (`a//b`) are
    * preserved, and `.`/`..` only count as dot segments when they are
    * the ENTIRE segment (`/.hidden/`, `/a../` pass through). */
  def removeDotSegments(path: Column): Column = {
    val noDot1 = regexp_replace(path, "(/\\.)+/", "/")
    val noDot = regexp_replace(noDot1, "(/\\.)+$", "/")
    val looped = (1 to DotSegmentPasses).foldLeft(noDot) { (p, _) =>
      val a = regexp_replace(p, "/[^/]+/\\.\\./", "/")
      val b = regexp_replace(a, "/[^/]+/\\.\\.$", "/")
      regexp_replace(b, "^(/\\.\\.)+/", "/")
    }
    regexp_replace(looped, "^(/\\.\\.)+$", "/")
  }

  /** RFC 3986 §5.2 reference resolution: the absolute URL an `href`
    * found on page `base` points at — the column map between
    * [[Html.extractLinks]] and [[canonicalizeUrl]] that turns a crawl's
    * raw outlinks into a link graph (VERDICT r16 item 1).
    *
    * Covers the forms a crawl actually contains: already-absolute hrefs
    * (any scheme, returned as written), protocol-relative `//host/x`
    * (base scheme adopted), root-relative `/x`, query-only `?q`
    * (base path kept), empty/fragment-only (the base itself), and
    * relative paths (merged onto the base directory). Dot segments in
    * the merged path are removed ([[removeDotSegments]] — applied to
    * EVERY branch, so `https://a.com/x/../y` hrefs normalize too).
    * Fragments are dropped on both sides (client-side only — the
    * [[canonicalizeUrl]] policy, applied early so `#frag` never leaks
    * into the merge), and the scheme comes back lowercased. A base
    * without a scheme resolves to the empty string (same gate-upstream
    * contract as [[canonicalizeUrl]]); href whitespace is trimmed as
    * browsers do. */
  def resolve(base: Column, href: Column): Column = {
    val h = regexp_replace(trim(href), "#.*", "")
    val bScheme = urlScheme(base)
    val bNoFrag = regexp_replace(base, "#.*", "")
    // scheme://authority of the base, original authority spelling kept
    // (canonicalizeUrl lowercases later); group 1 spans through the
    // authority because [^/?#]* cannot cross a path/query start
    val bRoot = concat(bScheme, lit("://"),
      regexp_extract(bNoFrag, schemePattern + "([^/?#]*)", 2))
    val bPathQ = regexp_replace(regexp_replace(bNoFrag, schemePattern, ""),
      "^[^/?#]*", "")
    val bPath = regexp_extract(bPathQ, "^([^?]*)", 1)
    // base directory: path up to and including the last slash; an empty
    // path (http://a.com) has directory "/"
    val bDir = when(bPath.contains("/"), regexp_replace(bPath, "[^/]*$", ""))
      .otherwise(lit("/"))
    val raw =
      when(h.rlike("^[A-Za-z][A-Za-z0-9+.-]*:"), h)
        .when(h.startsWith("//"), concat(bScheme, lit(":"), h))
        .when(h.startsWith("/"), concat(bRoot, h))
        .when(h === "", concat(bRoot, bPathQ))
        .when(h.startsWith("?"),
          concat(bRoot, when(bPath === "", lit("/")).otherwise(bPath), h))
        .otherwise(concat(bRoot, bDir, h))
    // normalize the result's PATH (dot segments out), query untouched
    val rRoot = regexp_extract(raw, "^([A-Za-z][A-Za-z0-9+.-]*:(?://[^/?#]*)?)", 1)
    val rPathQ = regexp_replace(raw, "^[A-Za-z][A-Za-z0-9+.-]*:(?://[^/?#]*)?", "")
    val rPath = regexp_extract(rPathQ, "^([^?]*)", 1)
    val rQuery = regexp_replace(rPathQ, "^[^?]*", "")
    when(bScheme === "", lit(""))
      .otherwise(concat(rRoot, removeDotSegments(rPath), rQuery))
  }

  /** eTLD+1 under a FULL public-suffix list (wildcard `*.ck` and
    * exception `!www.ck` rules included) — the loader face of
    * [[registrableDomain]] (VERDICT r16 item 5): compile the list once
    * on the driver ([[graft.functions.PslTable.compile]] /
    * `fromDataFrame`) and the lookup rides the task binary as an
    * O(labels) native expression — zero shuffle, zero join. Unlike the
    * subset face, a host that IS a public suffix yields NULL. */
  def registrableDomain(host: Column, psl: graft.functions.PslTable): Column =
    graft.functions.PslDomain(host, psl)

  /** Blocklist gate: drop rows whose registrable domain is blocked —
    * a broadcast anti-join, so the crawl side never shuffles. */
  def hostGate(df: DataFrame, urlCol: String, blocklist: DataFrame): DataFrame = {
    val dom = registrableDomain(urlHost(col(urlCol)))
    df.join(
      broadcast(blocklist.select(col(blocklist.columns.head).as("_blocked_dom"))),
      dom === col("_blocked_dom"), "left_anti")
  }

  /** DuckDB mirrors (the [[Html.Sql]] convention). */
  object Sql {
    private def replaceAll(e: String, pat: String, rep: String): String =
      s"regexp_replace($e, '$pat', '$rep', 'g')"

    def urlScheme(e: String): String =
      s"lower(regexp_extract($e, '$schemePattern', 1))"

    def urlHost(e: String): String =
      s"lower(regexp_extract($e, '$schemePattern(?:[^/?#@]*@)?([^/?#:]+)', 2))"

    def canonicalizeUrl(e: String): String =
      canonicalizeUrl(e, TrackingParams)

    def canonicalizeUrl(e: String, tracking: Seq[String]): String = {
      val scheme = urlScheme(e)
      val noFrag = replaceAll(e, "#.*", "")
      val rest = replaceAll(noFrag, schemePattern, "")
      val authority = s"regexp_extract($rest, '^([^/?#]*)', 1)"
      val hostPort = s"lower(${replaceAll(authority, "^[^@]*@", "")})"
      val host = s"""CASE WHEN $scheme = 'http' THEN ${replaceAll(hostPort, ":80$", "")}
                    |  WHEN $scheme = 'https' THEN ${replaceAll(hostPort, ":443$", "")}
                    |  ELSE $hostPort END""".stripMargin
      val pathq = replaceAll(rest, "^[^/?#]*", "")
      val path = s"regexp_extract($pathq, '^([^?]*)', 1)"
      val qbody = replaceAll(replaceAll(pathq, "^[^?]*", ""), "^\\?", "")
      val params = s"list_filter(regexp_split_to_array($qbody, '&'), " +
        s"p -> p <> '' AND NOT regexp_matches(p, '${trackingPattern(tracking)}'))"
      // DuckDB array_to_string([]) is NULL; Spark array_join([]) is ''
      val query = s"coalesce(array_to_string($params, '&'), '')"
      s"""CASE WHEN $scheme = '' THEN '' ELSE
         |  $scheme || '://' || ($host) ||
         |  (CASE WHEN $path = '' THEN '/' ELSE $path END) ||
         |  (CASE WHEN $query = '' THEN '' ELSE '?' || $query END)
         |END""".stripMargin
    }

    def removeDotSegments(e: String): String = {
      val noDot1 = replaceAll(e, "(/\\.)+/", "/")
      val noDot = replaceAll(noDot1, "(/\\.)+$", "/")
      val looped = (1 to DotSegmentPasses).foldLeft(noDot) { (p, _) =>
        val a = replaceAll(p, "/[^/]+/\\.\\./", "/")
        val b = replaceAll(a, "/[^/]+/\\.\\.$", "/")
        replaceAll(b, "^(/\\.\\.)+/", "/")
      }
      replaceAll(looped, "^(/\\.\\.)+$", "/")
    }

    def resolve(base: String, href: String): String = {
      val h = replaceAll(s"trim($href)", "#.*", "")
      val bScheme = urlScheme(base)
      val bNoFrag = replaceAll(base, "#.*", "")
      val bRoot = s"($bScheme || '://' || " +
        s"regexp_extract($bNoFrag, '$schemePattern([^/?#]*)', 2))"
      val bPathQ = replaceAll(replaceAll(bNoFrag, schemePattern, ""),
        "^[^/?#]*", "")
      val bPath = s"regexp_extract($bPathQ, '^([^?]*)', 1)"
      val bDir = s"(CASE WHEN contains($bPath, '/') " +
        s"THEN ${replaceAll(bPath, "[^/]*$", "")} ELSE '/' END)"
      val raw = s"""(CASE
        | WHEN regexp_matches($h, '^[A-Za-z][A-Za-z0-9+.-]*:') THEN $h
        | WHEN starts_with($h, '//') THEN $bScheme || ':' || $h
        | WHEN starts_with($h, '/') THEN $bRoot || $h
        | WHEN $h = '' THEN $bRoot || $bPathQ
        | WHEN starts_with($h, '?') THEN
        |   $bRoot || (CASE WHEN $bPath = '' THEN '/' ELSE $bPath END) || $h
        | ELSE $bRoot || $bDir || $h END)""".stripMargin
      val rRoot =
        s"regexp_extract($raw, '^([A-Za-z][A-Za-z0-9+.-]*:(?://[^/?#]*)?)', 1)"
      val rPathQ = replaceAll(raw, "^[A-Za-z][A-Za-z0-9+.-]*:(?://[^/?#]*)?", "")
      val rPath = s"regexp_extract($rPathQ, '^([^?]*)', 1)"
      val rQuery = replaceAll(rPathQ, "^[^?]*", "")
      s"""(CASE WHEN $bScheme = '' THEN ''
         | ELSE $rRoot || ${removeDotSegments(rPath)} || $rQuery END)""".stripMargin
    }

    def registrableDomain(e: String): String = {
      val h = s"regexp_replace($e, '\\.+$$', '', 'g')"
      val l = s"string_split($h, '.')"
      val inSet = MultiPartTlds.map(t => s"'$t'").mkString(", ")
      s"""CASE
         |  WHEN len($l) >= 3 AND ($l[-2] || '.' || $l[-1]) IN ($inSet)
         |    THEN $l[-3] || '.' || $l[-2] || '.' || $l[-1]
         |  WHEN len($l) >= 2 THEN $l[-2] || '.' || $l[-1]
         |  ELSE $h END""".stripMargin
    }
  }
}
