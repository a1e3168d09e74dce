package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.similarity.{Ann, KMeans}

/** Similarity-search queries over the `embeddings` table (64-dim float
  * vectors with a cluster `label`), plus embedding-space near-dup.
  *
  * The oracle-checked query (e01) uses the quantized integer dot product —
  * exact in both engines in any summation order. The approximate variants
  * (LSH, IVF) are rows-only: their contract is recall vs e01, checked in
  * the ScalaTest spec, not equality to an oracle.
  */
object EmbQueries {
  import Tables._

  private val K = 5
  private val NQUERIES = 10

  private def queriesDf(s: SparkSession, d: String): DataFrame =
    embeddings(s, d).filter(col("vec_id") < NQUERIES)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e01_knn_exact" -> ((s, d) =>
      Ann.bruteForceTopK(embeddings(s, d), queriesDf(s, d),
        "vec_id", "embedding", K)),

    "e02_knn_lsh" -> ((s, d) =>
      Ann.lshTopK(embeddings(s, d), queriesDf(s, d),
        "vec_id", "embedding", K, bits = 6, tables = 16)),

    "e03_knn_ivf" -> ((s, d) =>
      Ann.ivfTopK(embeddings(s, d), queriesDf(s, d),
        "vec_id", "embedding", "label", K, nprobe = 3)),

    "e05_knn_ivf_kmeans" -> ((s, d) => {
      // rows-only: the general IVF path — coarse cells learned with
      // deterministic k-means instead of shipped labels; recall contract
      // vs e01 is covered by the ScalaTest spec
      val emb = embeddings(s, d)
      val labels = KMeans.fitPredict(emb, "vec_id", "embedding", k = 10, maxIterations = 5)
      val items = emb.select(col("vec_id"), col("embedding"))
        .join(labels, Seq("vec_id"))
      Ann.ivfTopK(items, items.filter(col("vec_id") < NQUERIES),
        "vec_id", "embedding", "cell", K, nprobe = 3)
    }),

    "e06_knn_ivf_full_probe" -> ((s, d) => {
      // oracle-checkable IVF identity: probing EVERY learned cell makes
      // the candidate set the full corpus, so KMeans.fit + ivfTopK must
      // reproduce the exact top-k bit-for-bit — an end-to-end oracle row
      // for the whole IVF machinery (the approximate nprobe < cells paths
      // e03/e05 stay rows-only with recall specs)
      val emb = embeddings(s, d)
      val labels = KMeans.fitPredict(emb, "vec_id", "embedding", k = 10, maxIterations = 3)
      val items = emb.select(col("vec_id"), col("embedding"))
        .join(labels, Seq("vec_id"))
      Ann.ivfTopK(items, items.filter(col("vec_id") < NQUERIES),
        "vec_id", "embedding", "cell", K, nprobe = 10)
    }),

    "e07_cosine_topk" -> ((s, d) => {
      // exact cosine ranking: integer quantized dot + norms, two
      // correctly-rounded sqrt/divisions in fixed order — bit-identical
      // across engines, so the score itself is oracle-comparable
      val items = embeddings(s, d)
      Ann.bruteForceCosineTopK(items,
        items.filter(col("vec_id") < NQUERIES), "vec_id", "embedding", K)
        .select(col("qid"), col("nid"), round(col("cos"), 9).as("cos"))
    }),

    "e04_embedding_neardup" -> ((s, d) => {
      // embedding-cosine near-duplicate pairs: quantized-dot self-join
      // pruned by shared IVF cell (label) — same-cell pairs only
      val e = embeddings(s, d).select(
        col("vec_id"), col("embedding"), col("label"))
      e.as("x").join(e.as("y"),
          col("x.label") === col("y.label") &&
            col("x.vec_id") < col("y.vec_id"))
        .select(
          col("x.vec_id").as("id_a"), col("y.vec_id").as("id_b"),
          Ann.quantizedDot(col("x.embedding"), col("y.embedding")).as("qdot"))
        .filter(col("qdot") > 250000L)
    }))

  /** Exact brute-force top-k in DuckDB — the oracle for e01 AND for the
    * full-probe IVF identity e06 (same rows by construction). */
  private val exactKnnSql =
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
       |           WHERE vec_id < $NQUERIES),
       |scored AS (
       |  SELECT q.qid, e.vec_id AS nid,
       |    CAST(list_sum([CAST(round(CAST(q.qv[i] AS DOUBLE) * 1000) AS BIGINT)
       |                 * CAST(round(CAST(e.embedding[i] AS DOUBLE) * 1000) AS BIGINT)
       |                   FOR i IN range(1, len(q.qv) + 1)]) AS BIGINT) AS qdot
       |  FROM q, embeddings e WHERE e.vec_id <> q.qid)
       |SELECT qid, nid, qdot FROM (
       |  SELECT qid, nid, qdot,
       |         row_number() OVER (PARTITION BY qid ORDER BY qdot DESC, nid) AS rn
       |  FROM scored)
       |WHERE rn <= $K""".stripMargin

  /** Quantized integer dot of two embedding columns in DuckDB. */
  private def qdotSql(a: String, b: String) =
    s"""CAST(list_sum([CAST(round(CAST($a[i] AS DOUBLE) * 1000) AS BIGINT)
       |             * CAST(round(CAST($b[i] AS DOUBLE) * 1000) AS BIGINT)
       |               FOR i IN range(1, len($a) + 1)]) AS BIGINT)""".stripMargin

  private val cosineKnnSql =
    s"""WITH base AS (SELECT vec_id, embedding,
       |    ${qdotSql("embedding", "embedding")} AS n2 FROM embeddings),
       |q AS (SELECT vec_id AS qid, embedding AS qv, n2 AS qn2 FROM base
       |      WHERE vec_id < $NQUERIES),
       |scored AS (
       |  SELECT q.qid, e.vec_id AS nid,
       |    CAST(${qdotSql("q.qv", "e.embedding")} AS DOUBLE)
       |      / sqrt(CAST(q.qn2 AS DOUBLE)) / sqrt(CAST(e.n2 AS DOUBLE)) AS cos
       |  FROM q, base e WHERE e.vec_id <> q.qid)
       |SELECT qid, nid, round(cos, 9) AS cos FROM (
       |  SELECT qid, nid, cos,
       |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn
       |  FROM scored)
       |WHERE rn <= $K""".stripMargin

  val oracle: Map[String, String] = Map(
    "e06_knn_ivf_full_probe" -> exactKnnSql,
    "e01_knn_exact" -> exactKnnSql,
    "e07_cosine_topk" -> cosineKnnSql,
    "e04_embedding_neardup" ->
      """SELECT x.vec_id AS id_a, y.vec_id AS id_b,
        |  CAST(list_sum([CAST(round(CAST(x.embedding[i] AS DOUBLE) * 1000) AS BIGINT)
        |               * CAST(round(CAST(y.embedding[i] AS DOUBLE) * 1000) AS BIGINT)
        |                 FOR i IN range(1, len(x.embedding) + 1)]) AS BIGINT) AS qdot
        |FROM embeddings x JOIN embeddings y
        |  ON x.label = y.label AND x.vec_id < y.vec_id
        |WHERE CAST(list_sum([CAST(round(CAST(x.embedding[i] AS DOUBLE) * 1000) AS BIGINT)
        |                   * CAST(round(CAST(y.embedding[i] AS DOUBLE) * 1000) AS BIGINT)
        |                     FOR i IN range(1, len(x.embedding) + 1)]) AS BIGINT)
        |      > 250000""".stripMargin)
}
