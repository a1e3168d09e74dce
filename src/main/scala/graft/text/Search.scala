package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Full-text keyword search over a document corpus — the retrieval half
  * of a training-data pipeline (dataset curation by query, eval-set
  * mining, targeted corpus slicing).
  *
  * Scale shape: the per-term statistics pass explodes tokens but filters
  * to the query terms BEFORE the aggregation, so the shuffled state is
  * O(matching docs x |terms|), not O(corpus tokens); the corpus-wide
  * scalars (doc count, total length) are one exact aggregate broadcast to
  * the scoring join. Nothing in the plan grows with corpus size except
  * the initial scan.
  *
  * Determinism: BM25 needs `ln`, whose last ulp may differ across
  * engines/libm builds, so scores are rounded to 6 decimals before
  * ranking (values are O(1-10), accumulated FP error is O(1e-15) — the
  * same nine-orders-of-margin argument as the PageRank oracle) and ties
  * break on doc id. All other arithmetic is +,*,/ on doubles derived from
  * exact integers, correctly rounded identically everywhere, and the
  * per-term sum is a fixed left-associated expression, not an unordered
  * SQL aggregate.
  */
object Search {

  /** Okapi BM25 top-k: rank documents containing at least one query term
    * by the standard BM25(k1, b) score with Lucene's `ln(1 + (N - df +
    * 0.5) / (df + 0.5))` idf. Output (doc_id, bm25, rnk), `bm25` rounded
    * to 6 decimals, rnk dense in (bm25 desc, doc_id asc).
    */
  def bm25TopK(
      docs: DataFrame, idCol: String, textCol: String, terms: Seq[String],
      topK: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "graft.Search.bm25TopK: empty query term set")
    require(terms.distinct == terms,
      "graft.Search.bm25TopK: duplicate query terms would double-count")

    val base = docs.select(
      col(idCol).as("doc_id"),
      TextFunctions.tokens(col(textCol)).as("_t"))
    val lens = base.select(
      col("doc_id"), size(col("_t")).cast("long").as("dl"))

    // corpus scalars: one exact aggregate row, broadcast into the scorer
    val stats = lens.agg(
      count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))

    // per-(doc, term) tf restricted to the query terms — the filter runs
    // before the groupBy, so only matching tokens ever shuffle
    val tf = base
      .select(col("doc_id"), explode(col("_t")).as("tok"))
      .filter(col("tok").isin(terms: _*))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))

    // pivot tf and df into fixed columns so the score is a fixed-order
    // expression (unordered SQL sums are not cross-engine reproducible)
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      max(when(col("tok") === lit(t), col("tf"))).as(s"tf$i") }
    val piv = tf.groupBy(col("doc_id")).agg(tfCols.head, tfCols.tail: _*)
    val dfCols = terms.zipWithIndex.map { case (t, i) =>
      max(when(col("tok") === lit(t), col("df"))).as(s"df$i") }
    val dfRow = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .agg(dfCols.head, dfCols.tail: _*)

    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    def idf(i: Int): Column = {
      val dfd = coalesce(col(s"df$i"), lit(0L)).cast("double")
      log(lit(1.0) + (col("n_docs").cast("double") - dfd + lit(0.5)) /
        (dfd + lit(0.5)))
    }
    def termScore(i: Int): Column = {
      val tfd = coalesce(col(s"tf$i"), lit(0L)).cast("double")
      idf(i) * (tfd * lit(k1 + 1.0)) /
        (tfd + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / avgdl))
    }
    val score = terms.indices.map(termScore).reduceLeft(_ + _)

    // two-phase exact top-k (the d05 shape): each of 64 doc-id hash
    // shards keeps its local top-k, the final single-partition window
    // ranks <= 64*topK survivors — no reducer ever holds the full match
    // set, and the output is identical to one global window
    val scored = piv
      .join(lens, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .crossJoin(broadcast(dfRow))
      .select(col("doc_id"), round(score, 6).as("bm25"))
    val wShard = Window
      .partitionBy(pmod(col("doc_id"), lit(64L)))
      .orderBy(col("bm25").desc, col("doc_id"))
    val wFinal = Window.orderBy(col("bm25").desc, col("doc_id"))
    scored
      .withColumn("_srnk", row_number().over(wShard))
      .filter(col("_srnk") <= topK)
      .withColumn("rnk", row_number().over(wFinal))
      .filter(col("rnk") <= topK)
      .drop("_srnk")
  }
}
