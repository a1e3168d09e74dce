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
