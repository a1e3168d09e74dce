package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-trained language-model scoring — the KenLM-style "how typical
  * is this text of the corpus" quality signal of a training-data
  * pipeline, restated in exact integer arithmetic so every engine agrees
  * bit for bit.
  *
  * A classic perplexity score needs `ln`, whose last ulp differs across
  * libm builds, and an unordered float sum, which differs across
  * partitionings. Instead each transition w1->w2 scores the integer
  * `(scale * c(w1,w2)) div c(w1)` — the maximum-likelihood transition
  * probability scaled to an exact integer — and a document's score is the
  * exact integer mean over its transitions. Monotone in the geometric-ish
  * quality signal a bigram LM gives (common continuations score high,
  * OOV-ish transitions score near zero), deterministic everywhere.
  *
  * Scale shape: two map-side-combinable groupBys build the model (counts
  * shrink to the distinct-bigram vocabulary), then one equi-join per
  * count family scores the corpus; AQE's skew handling covers the hot
  * head words on the w1 join. Overflow bound: `scale * max-bigram-count`
  * must stay under 2^63 — at the default scale 1e6 that allows a single
  * bigram to occur 9.2e12 times (far past 100 TB of text) before either
  * engine overflows.
  */
object LanguageModel {

  /** Per-document bigram transition score. Output (doc_id, n_bigrams,
    * avg_p) where avg_p = (sum over transitions of `(scale * c(w1,w2))
    * div c(w1)`) div n_bigrams — all exact bigint. Documents with fewer
    * than two tokens have no transitions and are omitted.
    */
  def bigramTransitionScore(
      docs: DataFrame, idCol: String, textCol: String,
      scale: Long = 1000000L): DataFrame = {
    val t = docs.select(
      col(idCol).as("doc_id"), TextFunctions.tokens(col(textCol)).as("_t"))
    val bg = t.filter(size(col("_t")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(_t) - 1), " +
          "i -> struct(_t[i-1] AS w1, _t[i] AS w2))")).as("_bg"))
      .select(col("doc_id"), col("_bg.w1").as("w1"), col("_bg.w2").as("w2"))
    val bigramCounts = bg.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("cb"))
    val contextCounts = bg.groupBy(col("w1"))
      .agg(count(lit(1)).as("cu"))
    bg.join(bigramCounts, Seq("w1", "w2"))
      .join(contextCounts, Seq("w1"))
      .select(col("doc_id"), expr(s"($scale * cb) div cu").as("p"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("p")).as("_sum_p"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("_sum_p div n_bigrams").as("avg_p"))
  }
}
