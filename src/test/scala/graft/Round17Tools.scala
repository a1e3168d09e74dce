package graft

/** Round-17 ad-hoc harnesses (the Round10Tools convention: test-scope
  * mains the round's measurements/validations are reproducible from).
  *
  * [[UrlSqlDump]] prints the generated DuckDB mirror expression for
  * `Urls.Sql.resolve("b", "h")` so the RFC 3986 fixture table in
  * UrlsSpec can be replayed verbatim against DuckDB (tools/notes shows
  * the python harness) — the direct cross-engine check for the mirror,
  * ahead of the d42 oracle that embeds it.
  */
object UrlSqlDump {
  def main(args: Array[String]): Unit = {
    println("-- resolve(b, h) --")
    println(graft.text.Urls.Sql.resolve("b", "h"))
  }
}

/** Same device for the entity-decode mirror: the generated
  * `Html.Sql.stripMarkup("s")` replayed over the HtmlSpec entity
  * fixtures in DuckDB (expected = the Scala-face goldens). */
object HtmlSqlDump {
  def main(args: Array[String]): Unit = {
    println("-- stripMarkup(s) --")
    println(graft.text.Html.Sql.stripMarkup("s"))
  }
}
