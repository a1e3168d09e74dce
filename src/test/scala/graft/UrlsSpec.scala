package graft

import org.apache.spark.sql.functions._

import graft.text.Urls

/** Fixtures for URL canonicalization, registrable-domain extraction and
  * the blocklist gate (VERDICT r15 item 4). */
class UrlsSpec extends SparkSpec {

  private def canon(url: String): String = {
    import spark.implicits._
    Seq(url).toDF("u").select(Urls.canonicalizeUrl(col("u"))).head().getString(0)
  }

  private def dom(host: String): String = {
    import spark.implicits._
    Seq(host).toDF("h").select(Urls.registrableDomain(col("h"))).head().getString(0)
  }

  test("canonicalizeUrl: case, ports, userinfo, fragments, tracking params") {
    // scheme+host lowercase; path case preserved
    assert(canon("HTTP://WWW.Example.COM/A/Path") === "http://www.example.com/A/Path")
    // default ports strip per scheme; non-default ports stay
    assert(canon("http://a.com:80/x") === "http://a.com/x")
    assert(canon("https://a.com:443/x") === "https://a.com/x")
    assert(canon("http://a.com:8080/x") === "http://a.com:8080/x")
    assert(canon("https://a.com:80/x") === "https://a.com:80/x")
    // userinfo dropped, fragment dropped, empty path becomes /
    assert(canon("https://user:pw@Secret.Host.net#frag") === "https://secret.host.net/")
    // tracking params out, genuine params kept in order, ? dropped when empty
    assert(canon("http://a.com/p?utm_source=f&id=7&utm_campaign=x&b=2") ===
      "http://a.com/p?id=7&b=2")
    assert(canon("http://a.com/p?gclid=abc") === "http://a.com/p")
    assert(canon("http://a.com/p?fbclid=1&ref=tw") === "http://a.com/p")
    // a param NAMED like a prefix of a tracker is kept (anchored match)
    assert(canon("http://a.com/p?refresh=1") === "http://a.com/p?refresh=1")
    // idempotent: canonicalizing a canonical URL is a no-op
    val once = canon("HTTP://U@A.com:80/P?utm_x=1&q=2#f")
    assert(canon(once) === once)
    // no scheme -> empty (gate upstream)
    assert(canon("not a url") === "")
  }

  test("registrableDomain: eTLD+1 with multi-part suffixes") {
    assert(dom("www.example.com") === "example.com")
    assert(dom("a.b.c.example.org") === "example.org")
    assert(dom("blog.example.co.uk") === "example.co.uk")
    assert(dom("example.co.uk") === "example.co.uk")
    assert(dom("news.site.com.au") === "site.com.au")
    assert(dom("example.com") === "example.com")
    // degenerate hosts are total, never throw (ANSI element_at guards)
    assert(dom("localhost") === "localhost")
    assert(dom("co.uk") === "co.uk")
    // FQDN trailing dots strip, so the dotted spelling of a blocklisted
    // domain cannot evade the host gate (ADVICE r16)
    assert(dom("ads.net.") === "ads.net")
    assert(dom("www.example.com.") === "example.com")
    assert(dom("com.") === "com")
  }

  test("canonicalizeUrl: caller-supplied tracking set keeps genuine ref params") {
    import spark.implicits._
    val noRef = Urls.TrackingParams.filterNot(_ == "ref")
    val got = Seq("https://github.com/a/b?ref=main&utm_source=x").toDF("u")
      .select(Urls.canonicalizeUrl(col("u"), noRef)).head().getString(0)
    assert(got === "https://github.com/a/b?ref=main")
  }

  test("registrableDomain(psl): full list semantics — wildcard, exception, private suffixes") {
    import spark.implicits._
    val psl = graft.functions.PslTable.compile(Seq(
      "// comment lines and blanks load as-is (raw PSL file shape)",
      "", "com", "co.uk", "uk", "github.io", "jp",
      "*.ck", "!www.ck", "*.kawasaki.jp", "!city.kawasaki.jp"))
    def d(host: String): Option[String] = {
      val r = Seq(host).toDF("h")
        .select(Urls.registrableDomain(col("h"), psl)).head()
      if (r.isNullAt(0)) None else Some(r.getString(0))
    }
    // plain rules, longest wins
    assert(d("foo.com") === Some("foo.com"))
    assert(d("a.b.foo.com") === Some("foo.com"))
    assert(d("blog.example.co.uk") === Some("example.co.uk"))
    // the github.io case the built-in subset misgroups (VERDICT r16):
    // the PRIVATE suffix makes each user its own registrable domain
    assert(d("user.github.io") === Some("user.github.io"))
    assert(d("a.user.github.io") === Some("user.github.io"))
    // wildcard: every direct child of ck is a public suffix
    assert(d("bar.other.ck") === Some("bar.other.ck"))
    assert(d("other.ck") === None) // it IS a public suffix
    // exception beats the wildcard
    assert(d("www.ck") === Some("www.ck"))
    assert(d("foo.www.ck") === Some("www.ck"))
    assert(d("x.city.kawasaki.jp") === Some("city.kawasaki.jp"))
    assert(d("y.z.kawasaki.jp") === Some("y.z.kawasaki.jp"))
    // unknown TLD falls back to the implicit '*' rule
    assert(d("example.unknown") === Some("example.unknown"))
    assert(d("com") === None)
    // case and FQDN trailing dots normalize like the subset face
    assert(d("WWW.Example.COM.") === Some("example.com"))
  }

  private def res(base: String, href: String): String = {
    import spark.implicits._
    Seq((base, href)).toDF("b", "h")
      .select(Urls.resolve(col("b"), col("h"))).head().getString(0)
  }

  test("resolve: RFC 3986 normal examples (base http://a/b/c/d;p?q)") {
    val b = "http://a/b/c/d;p?q"
    // the RFC 5.4.1 table, minus fragments (dropped by policy)
    assert(res(b, "g") === "http://a/b/c/g")
    assert(res(b, "./g") === "http://a/b/c/g")
    assert(res(b, "g/") === "http://a/b/c/g/")
    assert(res(b, "/g") === "http://a/g")
    assert(res(b, "//g") === "http://g")
    assert(res(b, "?y") === "http://a/b/c/d;p?y")
    assert(res(b, "g?y") === "http://a/b/c/g?y")
    assert(res(b, "") === "http://a/b/c/d;p?q")
    assert(res(b, "#s") === "http://a/b/c/d;p?q") // fragment-only: the page itself
    assert(res(b, ".") === "http://a/b/c/")
    assert(res(b, "./") === "http://a/b/c/")
    assert(res(b, "..") === "http://a/b/")
    assert(res(b, "../") === "http://a/b/")
    assert(res(b, "../g") === "http://a/b/g")
    assert(res(b, "../..") === "http://a/")
    assert(res(b, "../../") === "http://a/")
    assert(res(b, "../../g") === "http://a/g")
  }

  test("resolve: RFC 3986 abnormal examples and crawl edge cases") {
    val b = "http://a/b/c/d;p?q"
    // .. above root drops (RFC 5.4.2)
    assert(res(b, "../../../g") === "http://a/g")
    assert(res(b, "../../../../g") === "http://a/g")
    assert(res(b, "/./g") === "http://a/g")
    assert(res(b, "/../g") === "http://a/g")
    // dots that are PART of a segment are not dot segments
    assert(res(b, "g.") === "http://a/b/c/g.")
    assert(res(b, ".g") === "http://a/b/c/.g")
    assert(res(b, "g..") === "http://a/b/c/g..")
    assert(res(b, "..g") === "http://a/b/c/..g")
    assert(res(b, "./../g") === "http://a/b/g")
    assert(res(b, "g/./h") === "http://a/b/c/g/h")
    assert(res(b, "g/../h") === "http://a/b/c/h")
    // dot-ish sequences in the QUERY are untouched
    assert(res(b, "g?y/./x") === "http://a/b/c/g?y/./x")
    // absolute hrefs pass through (own scheme kept), dot segments still out
    assert(res(b, "https://other.org/x/../y?k") === "https://other.org/y?k")
    assert(res(b, "mailto:x@y.z") === "mailto:x@y.z")
    // protocol-relative adopts the base scheme
    assert(res("https://s.com/p", "//cdn.net/lib.js") === "https://cdn.net/lib.js")
    // empty base path: directory is /
    assert(res("http://a.com", "g") === "http://a.com/g")
    assert(res("http://a.com", "?q") === "http://a.com/?q")
    // base authority spelling (userinfo, port, case) survives resolve —
    // canonicalizeUrl owns that cleanup
    assert(res("HTTP://U:p@A.com:80/d/e?x", "../f") === "http://U:p@A.com:80/f")
    // href whitespace trims; schemeless base gates to ''
    assert(res(b, "  g  ") === "http://a/b/c/g")
    assert(res("not a url", "/x") === "")
  }

  test("hostGate: broadcast anti-join on registrable domain; plan never shuffles the crawl side") {
    import spark.implicits._
    val crawl = Seq(
      1L -> "https://www.good.com/a",
      2L -> "https://ads.tracker.net/pixel",
      3L -> "https://sub.Tracker.NET/x",
      4L -> "https://good.co.uk/b").toDF("id", "url")
    val block = Seq("tracker.net", "good.co.uk").toDF("domain")
    val kept = Urls.hostGate(crawl, "url", block)
    assert(kept.select("id").collect().map(_.getLong(0)).sorted.toSeq === Seq(1L))
    val plan = kept.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"the gate must broadcast the blocklist:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"the crawl side must not shuffle:\n$plan")
  }
}
