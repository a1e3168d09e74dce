package graft

import org.apache.spark.sql.functions._

import graft.text.Html

/** Hand-built fixture pages for the raw-HTML ingestion surface
  * (VERDICT r15 item 3): markup strip, entity decode, block features,
  * and the jusText-shaped boilerplate filter. */
class HtmlSpec extends SparkSpec {

  private def page(html: String) = {
    import spark.implicits._
    Seq(html).toDF("html")
  }

  private def one(html: String, c: org.apache.spark.sql.Column): Any =
    page(html).select(c.as("v")).head().get(0)

  test("stripMarkup: tags out, script/style/comment content out, entities decoded") {
    assert(one("<html><body><p>Hello <b>world</b></p></body></html>",
      Html.stripMarkup(col("html"))) === "Hello world")
    assert(one("<p>a</p><script>var x = '<p>not text</p>';</script><p>b</p>",
      Html.stripMarkup(col("html"))) === "a b")
    assert(one("<style type=\"text/css\">p { color: red }</style>body text",
      Html.stripMarkup(col("html"))) === "body text")
    assert(one("before<!-- a <p>comment</p> -->after",
      Html.stripMarkup(col("html"))) === "before after")
    // head content (title, meta) never reaches the text
    assert(one("<head><title>T</title><meta x=1></head><body>real</body>",
      Html.stripMarkup(col("html"))) === "real")
    // entities, including the double-escape order (&amp;lt; -> &lt;)
    assert(one("<p>1 &lt; 2 &amp;&amp; 3 &gt; 2, &quot;q&#39;s&quot;&nbsp;end</p>",
      Html.stripMarkup(col("html"))) === "1 < 2 && 3 > 2, \"q's\" end")
    assert(one("literal &amp;lt; stays",
      Html.stripMarkup(col("html"))) === "literal &lt; stays")
    // whitespace normalization: newlines/tabs/runs collapse to one space
    assert(one("<p>a\n\t b</p>\n<p>c</p>",
      Html.stripMarkup(col("html"))) === "a b c")
    // case-insensitive and attribute-bearing script tags
    assert(one("x<SCRIPT src=\"a.js\">junk()</SCRIPT >y",
      Html.stripMarkup(col("html"))) === "x y")
  }

  test("decodeEntities: numeric, hex, named table, cp1252 remap, invalid stays literal") {
    def strip(s: String) = one(s, Html.stripMarkup(col("html"))).asInstanceOf[String]
    // decimal + hex numeric references (VERDICT r16 item 2)
    assert(strip("<p>it&#8217;s &#x2014; fine</p>") === "it’s — fine")
    // common named set beyond the XML five
    assert(strip("caf&eacute; &mdash; &ldquo;ok&rdquo; 3&frac12;&deg;") ===
      "café — “ok” 3½°")
    // HTML5 numeric refs in 0x80-0x9F are windows-1252, not C1 controls
    assert(strip("broken &#147;smart&#148; &#150; quotes") === "broken “smart” – quotes")
    // invalid codepoints and unknown names stay literal
    assert(strip("keep &#xD800; &#0; &#1114112; &wat; &amp") ===
      "keep &#xD800; &#0; &#1114112; &wat; &amp")
    // ONE pass: a double-escaped entity decodes exactly one level
    assert(strip("x &amp;mdash; y") === "x &mdash; y")
    // nbsp (named or numeric) folds into the whitespace normalization
    assert(strip("a&nbsp;&#160;  b") === "a b")
    // semicolonless legacy forms stay literal
    assert(strip("fish &amp chips") === "fish &amp chips")
  }

  test("blocks: block-level tags split; inline tags don't; features count anchor text") {
    import org.apache.spark.sql.Row
    val rows = page(
      "<div>first block</div><p>second <b>with</b> <a href=\"/x\">a link</a></p>" +
        "<span>tail outside any block tag</span>")
      .select(explode(Html.blocks(col("html"))).as("b"))
      .select(col("b.text"), col("b.n_chars"), col("b.link_chars"))
      .collect().toSeq
    assert(rows === Seq(
      Row("first block", 11L, 0L),
      Row("second with a link", 18L, 6L),
      Row("tail outside any block tag", 26L, 0L)))
    // a pure-menu block is ~all anchor chars
    val menu = page("<nav><a href=\"/\">home</a> <a href=\"/a\">about</a></nav>")
      .select(explode(Html.blocks(col("html"))).as("b"))
      .select(col("b.n_chars"), col("b.link_chars")).head()
    assert(menu.getLong(0) === 10L) // "home about"
    assert(menu.getLong(1) === 9L)  // "home" + "about"
  }

  test("blocks: stopword features; extractMainText minStopFrac drops stopword-free boilerplate") {
    import org.apache.spark.sql.Row
    val rows = page("<p>This is the first real paragraph of the page</p>" +
        "<div>Posted by admin on 2020-01-01</div>")
      .select(explode(Html.blocks(col("html"))).as("b"))
      .select(col("b.n_words"), col("b.stop_words"))
      .collect().toSeq
    // prose: This,is,the,first,real,paragraph,of,the,page -> is,the,of,the = 4
    // boilerplate: Posted,by,admin,on,2020-01-01 -> on = 1 (case-insensitive)
    assert(rows === Seq(Row(9L, 4L), Row(5L, 1L)))
    // the stopword gate (VERDICT r16 item 3): at 0.25 the short non-link
    // boilerplate drops while equally-short prose survives — the case
    // the link-density gate cannot see
    val html = "<p>This is the first real paragraph of the page</p>" +
      "<div>Posted by admin on March third</div>"
    val gated = one(html, Html.extractMainText(col("html"),
      minChars = 10, maxLinkDensity = 0.33, minStopFrac = 0.25))
      .asInstanceOf[String]
    assert(gated === "This is the first real paragraph of the page")
    // default minStopFrac = 0 is a bit-exact no-op: both blocks kept
    val ungated = one(html, Html.extractMainText(col("html"), minChars = 10))
      .asInstanceOf[String]
    assert(ungated ===
      "This is the first real paragraph of the page\nPosted by admin on March third")
  }

  test("extractMainText: prose survives, link-dense chrome and short fragments drop") {
    val html =
      "<html><head><title>Irrelevant</title><style>.x{}</style></head><body>" +
        "<nav><a href=\"/\">home</a> <a href=\"/about\">about us</a> " +
        "<a href=\"/contact\">contact</a></nav>" +
        "<h1>A headline that is long enough to keep around here</h1>" +
        "<p>This is the first real paragraph of the page, with plenty of " +
        "prose and even an inline <a href=\"/ref\">reference link</a> that " +
        "must not disqualify it.</p>" +
        "<p>ok</p>" + // too short: dropped by minChars
        "<div class=\"footer\"><a href=\"/tos\">terms</a> &amp; " +
        "<a href=\"/privacy\">privacy</a></div>" +
        "</body></html>"
    val out = one(html, Html.extractMainText(col("html"))).asInstanceOf[String]
    val lines = out.split("\n").toSeq
    assert(lines.size === 2)
    assert(lines.head === "A headline that is long enough to keep around here")
    assert(lines(1).startsWith("This is the first real paragraph"))
    assert(lines(1).contains("reference link"))
    assert(!out.contains("home"))
    assert(!out.contains("privacy"))
    assert(!out.contains("Irrelevant"))
    // threshold faces: a link-density cap of 1.0 keeps the chrome too
    val loose = one(html,
      Html.extractMainText(col("html"), minChars = 1, maxLinkDensity = 1.0))
      .asInstanceOf[String]
    assert(loose.contains("home"))
    assert(loose.contains("terms & privacy"))
    // degenerate inputs are total: empty page and tagless prose
    assert(one("", Html.extractMainText(col("html"))) === "")
    assert(one("just plain text with no markup at all, long enough to keep",
      Html.extractMainText(col("html"))) ===
      "just plain text with no markup at all, long enough to keep")
  }

  test("extractLinks: both quote styles; script-embedded and href-less anchors ignored") {
    val html = "<a href=\"https://a.com/x\">x</a> <p><a class='k' href='/rel'>r</a></p>" +
      "<script>var a = '<a href=\"https://evil.com\">no</a>';</script>" +
      "<a data-x=\"1\" href=\"https://b.org/y?z=1\">y</a> <a>no href</a>"
    assert(one(html, Html.extractLinks(col("html"))) ===
      Seq("https://a.com/x", "https://b.org/y?z=1", "/rel"))
    assert(one("", Html.extractLinks(col("html"))) === Seq())
  }

  test("extractLinks: unquoted values; data-href suffixes never donate a link") {
    // unquoted href (legal HTML, common in old crawls — VERDICT r16):
    // value runs to whitespace or '>'
    assert(one("<a href=/bare/path>b</a> <a href = x.html class=z>c</a>",
      Html.extractLinks(col("html"))) === Seq("/bare/path", "x.html"))
    // ADVICE r16: 'data-href' must not match through its suffix — only
    // the real (single-quoted) href comes back
    assert(one("<a data-href=\"evil\" href='real'>t</a>",
      Html.extractLinks(col("html"))) === Seq("real"))
    // and an anchor with ONLY a data-href yields nothing
    assert(one("<a data-href=\"evil\">t</a>",
      Html.extractLinks(col("html"))) === Seq())
  }

  test("plan shape: extraction is one whole-stage-codegen'd projection, no shuffle") {
    val df = page("<p>hello world, a perfectly fine paragraph</p>")
      .select(Html.extractMainText(col("html")).as("t"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"markup strip must not shuffle:\n$plan")
  }
}
