package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.similarity.Ann

/** The reference's Connect-friendly goal (README: usable from plain SQL
  * without JVM-side Column builders): the registered `graft_*` functions
  * must be able to drive the flagship pipelines END TO END from
  * `spark.sql(...)` alone — no Column API, no Dataset combinators — and
  * produce bit-identical results to the Column-API implementations.
  */
class SqlSurfaceSpec extends SparkSpec {

  private val SF = "/root/testdata/sf0.001"

  test("e01 exact knn end-to-end via spark.sql + graft_quantized_dot only") {
    spark.read.parquet(s"$SF/embeddings.parquet").createOrReplaceTempView("emb")
    val viaSql = spark.sql(
      """WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM emb WHERE vec_id < 5),
        |scored AS (
        |  SELECT q.qid, e.vec_id AS nid,
        |         graft_quantized_dot(q.qv, e.embedding) AS qdot
        |  FROM emb e JOIN q ON e.vec_id <> q.qid)
        |SELECT qid, nid, qdot FROM (
        |  SELECT qid, nid, qdot,
        |         row_number() OVER (PARTITION BY qid ORDER BY qdot DESC, nid) AS rn
        |  FROM scored)
        |WHERE rn <= 5""".stripMargin)
    val emb = spark.read.parquet(s"$SF/embeddings.parquet")
    val viaApi = Ann.bruteForceTopK(
      emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", 5)
    assert(rowSet(viaSql) === rowSet(viaApi))
  }

  test("d02 minhash near-dup end-to-end via spark.sql + graft_minhash_sig only") {
    spark.read.parquet(s"$SF/documents.parquet").createOrReplaceTempView("docs")
    // full pipeline in SQL: tokenize -> distinct shingles -> native
    // signature -> 32 bands of 4 -> bucket join -> exact-jaccard verify
    val viaSql = spark.sql(
      """WITH sh AS (
        |  SELECT doc_id AS id,
        |         array_distinct(transform(
        |           sequence(0, greatest(size(t) - 3, -1)),
        |           i -> concat_ws(' ', slice(t, i + 1, 3)))) AS sh
        |  FROM (SELECT doc_id, filter(split(text, ' '), x -> x != '') AS t
        |        FROM docs)
        |  WHERE size(t) >= 3),
        |sig AS (SELECT id, sh, graft_minhash_sig(sh, 128) AS sig FROM sh
        |        WHERE size(sh) > 0),
        |bk AS (SELECT id, explode(transform(sequence(0, 31),
        |         b -> struct(b AS band,
        |                     xxhash64(slice(sig, b * 4 + 1, 4)) AS bucket))) AS bk
        |       FROM sig),
        |cand AS (SELECT DISTINCT x.id AS id_a, y.id AS id_b
        |         FROM bk x JOIN bk y ON x.bk = y.bk AND x.id < y.id),
        |j AS (SELECT c.id_a, c.id_b,
        |        CAST(size(array_intersect(a.sh, b.sh)) AS DOUBLE)
        |          / size(array_union(a.sh, b.sh)) AS jaccard
        |      FROM cand c
        |      JOIN sig a ON a.id = c.id_a
        |      JOIN sig b ON b.id = c.id_b)
        |SELECT id_a, id_b, round(jaccard, 6) AS jaccard
        |FROM j WHERE jaccard >= 0.4""".stripMargin)
    val viaApi = Dedup.minhashDuplicates(
      spark.read.parquet(s"$SF/documents.parquet"), "doc_id", "text",
      shingleSize = 3, numHashes = 128, bands = 32, threshold = 0.4)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
    assert(rowSet(viaSql) === rowSet(viaApi))
    assert(viaSql.count() > 0, "fixture should contain near-duplicate pairs")
  }

  test("d38 markup strip via spark.sql + graft_html_entity_decode only") {
    spark.read.parquet(s"$SF/documents.parquet").createOrReplaceTempView("docs38")
    // the full stripMarkup pipeline in plain SQL: non-content drop + tag
    // strip as regexp_replace, the entity pass through the registered
    // native function, whitespace normalization incl. the decoded U+00A0
    val viaSql = spark.sql(
      """SELECT doc_id,
        |  trim(regexp_replace(
        |    graft_html_entity_decode(regexp_replace(
        |      regexp_replace(
        |        concat('<p>it&#8217;s ', text, ' caf&eacute;&nbsp;&wat;</p>',
        |               '<script>no()</script>'),
        |        '(?is)<script(?:[ \t\n\r][^>]*)?>.*?</script[ \t\n\r]*>', ' '),
        |      '<[^>]*>', ' ')),
        |    '[ \t\n\r\u00a0]+', ' ')) AS t
        |FROM docs38""".stripMargin)
    val viaApi = spark.read.parquet(s"$SF/documents.parquet").select(
      col("doc_id"),
      graft.text.Html.stripMarkup(
        concat(lit("<p>it&#8217;s "), col("text"),
          lit(" caf&eacute;&nbsp;&wat;</p><script>no()</script>"))).as("t"))
    assert(rowSet(viaSql) === rowSet(viaApi))
    assert(viaSql.filter(col("t").contains("it’s")).count() > 0)
    assert(viaSql.filter(col("t").contains("café &wat;")).count() > 0)
  }
}
