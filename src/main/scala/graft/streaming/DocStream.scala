package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.text.TextFunctions

/** Ingestion-time near-duplicate detection: flag documents arriving on a
  * stream (a crawl, an upload queue) against a STATIC reference corpus —
  * the "is this batch of new data already in the training set?"
  * primitive that batch dedup ([[graft.dedup.Dedup]]) cannot express.
  *
  * Shape: the corpus is indexed ONCE ([[indexCorpus]] — MinHash LSH
  * buckets plus the shingle sets for exact verification, both
  * materialized so every micro-batch reads blocks instead of recomputing
  * the corpus); each incoming document computes its signature per ROW
  * (codegen'd [[graft.functions.MinHashSig]], no shuffle), joins the
  * bucket index (a stream-static equi-join — STATELESS in Structured
  * Streaming), deduplicates candidate pairs within the watermark, and
  * exact-verifies survivors against the corpus shingle sets. Every
  * stateful byte is bounded: candidate-dedup state expires with the
  * watermark horizon and the index is fixed at build time.
  *
  * The same function runs on a batch frame (plain `dropDuplicates`
  * replaces the watermarked variant), which is how the driver oracle
  * checks it (query d10) — the streaming path is spec-checked live on a
  * MemoryStream.
  */
object DocStream {

  /** Materialized LSH index of the reference corpus.
    * `buckets`: (bk, corpus_id) — one row per (band, bucket) key;
    * `shingles`: (corpus_id, corpus_sh) — distinct shingle sets for the
    * exact-Jaccard verify. Build once, reuse across micro-batches. */
  final case class CorpusIndex(
      buckets: DataFrame, shingles: DataFrame,
      shingleSize: Int, numHashes: Int, bands: Int)

  def indexCorpus(
      corpus: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 128, bands: Int = 32): CorpusIndex = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val sh = corpus.select(
      col(idCol).as("corpus_id"),
      array_distinct(
        TextFunctions.shingles(TextFunctions.tokens(col(textCol)), shingleSize))
        .as("corpus_sh"))
      .filter(size(col("corpus_sh")) > 0)
      .localCheckpoint()
    val buckets = Dedup
      .minhashSignatures(
        sh.select(col("corpus_id").as("id"), col("corpus_sh").as("sh")), numHashes)
      .select(col("id").as("corpus_id"),
        explode(Dedup.lshBuckets(col("sig"), bands, numHashes / bands)).as("bk"))
      .localCheckpoint()
    CorpusIndex(buckets, sh, shingleSize, numHashes, bands)
  }

  /** Near-duplicate hits of `docs` (streaming or batch) against the
    * indexed corpus: one row per (doc, corpus doc) pair with exact
    * shingle Jaccard >= `threshold`. Output columns: idCol (+ tsCol when
    * given), corpus_id, jaccard.
    *
    * On a streaming frame `tsCol` is REQUIRED: candidate pairs
    * deduplicate with `dropDuplicatesWithinWatermark` keyed
    * (idCol, corpus_id), so a document matching a corpus entry in
    * several LSH bands is verified once, and the dedup state expires
    * after `horizon` of event time.
    */
  def nearDupAgainstCorpus(
      docs: DataFrame, index: CorpusIndex,
      idCol: String, textCol: String,
      tsCol: Option[String] = None,
      threshold: Double = 0.5,
      horizon: String = "10 minutes"): DataFrame = {
    require(!docs.isStreaming || tsCol.nonEmpty,
      "streaming input needs tsCol for the candidate-dedup watermark")
    val keep = col(idCol) +: tsCol.map(col).toSeq
    val base0 = docs.select(keep :+
      array_distinct(
        TextFunctions.shingles(
          TextFunctions.tokens(col(textCol)), index.shingleSize)).as("_sh"): _*)
      .filter(size(col("_sh")) > 0)
    val base =
      if (docs.isStreaming) base0.withWatermark(tsCol.get, horizon) else base0
    val exploded = base
      .withColumn("_sig", graft.functions.MinHashSig(col("_sh"), index.numHashes))
      .select(keep ++ Seq(col("_sh"),
        explode(Dedup.lshBuckets(col("_sig"), index.bands,
          index.numHashes / index.bands)).as("bk")): _*)
    val cands0 = exploded.join(index.buckets, Seq("bk"))
    val cands =
      if (docs.isStreaming)
        cands0.dropDuplicatesWithinWatermark(Seq(idCol, "corpus_id"))
      else cands0.dropDuplicates(idCol, "corpus_id")
    cands.join(index.shingles, Seq("corpus_id"))
      .select(keep ++ Seq(col("corpus_id"),
        (size(array_intersect(col("_sh"), col("corpus_sh"))).cast("double") /
          size(array_union(col("_sh"), col("corpus_sh")))).as("jaccard")): _*)
      .filter(col("jaccard") >= threshold)
  }
}
