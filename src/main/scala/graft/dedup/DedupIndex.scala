package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.CheckpointPolicy
import graft.text.TextFunctions

/** Write-once, probe-everywhere MinHash/LSH dedup index — the
  * bucketed-table pattern ([[graft.sources.GraphIO.writeBucketed]])
  * applied to the dedup family.
  *
  * Motivation (VERDICT r8 #1): every fuzzy-dedup consumer — pair
  * generation, cluster closure, quality-survivor selection, the
  * streaming ingest probe — needs the SAME three artifacts: the
  * exact-duplicate representative map, the representatives' shingle
  * sets, and the LSH bucket table. Recomputing them per job reads and
  * shuffles the corpus once per consumer; on a real corpus the index is
  * built once at ingest time and every downstream job reads blocks.
  *
  * The three frames:
  *  - `clusters` (keep_id, n_copies, ids) — one row per distinct text;
  *    `keep_id` is the minimum doc id (the deterministic
  *    representative), `ids` the sorted exact copies. Grouping is on
  *    the text's sha256, so the collapse shuffle moves 32-byte digests,
  *    never documents (the [[graft.streaming.DocStream]] device).
  *  - `shingles` (id, sh) — the representatives' DISTINCT shingle sets
  *    (empty-shingle docs excluded), the exact-Jaccard verify side.
  *  - `buckets` (band, bucket, id) — one row per (band, LSH bucket)
  *    key per representative, computed per row by the codegen'd
  *    [[graft.functions.MinHashSig]]; candidate generation is a
  *    self-equi-join on (band, bucket).
  *
  * Persistence faces:
  *  - [[writeBucketed]]/[[readBucketed]] — catalog tables with
  *    `buckets` bucketed by (band, bucket) and `shingles` bucketed by
  *    (id): the candidate self-join and the verify joins then plan NO
  *    exchange on the stored sides (the shuffle is paid once at write
  *    time), and — the headline — NO signature recomputation: a probe
  *    plan over the stored index contains no MinHashSig at all
  *    (PlansSpec asserts both properties).
  *  - [[write]]/[[read]] — plain portable parquet directories
  *    (repartitioned + sorted on the join keys for row-group pruning),
  *    for one-shot reads or non-catalog deployments.
  *
  * Consumers: [[Index.pairs]] replays [[Dedup.dedupedNearDuplicates]]
  * bit for bit, [[Index.clusterAssign]] replays
  * [[Dedup.nearDupClusters]], and
  * [[graft.streaming.DocStream.fromDedupIndex]] adapts the index for
  * the streaming ingest probe — so one build serves the whole family.
  */
object DedupIndex {

  final case class Index(
      clusters: DataFrame,
      shingles: DataFrame,
      buckets: DataFrame,
      shingleSize: Int,
      numHashes: Int,
      bands: Int) {

    /** Near-duplicate pairs among the representatives —
      * [[Dedup.minhashDuplicates]] over the representative set, reading
      * the stored buckets/shingles instead of recomputing signatures.
      * Output (id_a, id_b, jaccard), id_a < id_b, jaccard >= threshold.
      */
    def pairs(threshold: Double, maxBucketSize: Int = 0): DataFrame = {
      val b =
        if (maxBucketSize <= 0) buckets
        else {
          // hot-bucket cap, the minhashDuplicates device: drop buckets
          // whose candidate contribution would be quadratic
          val hot = buckets.groupBy(col("band"), col("bucket"))
            .agg(count(lit(1)).as("_n"))
            .filter(col("_n") > maxBucketSize)
            .select(col("band"), col("bucket"))
          buckets.join(broadcast(hot), Seq("band", "bucket"), "left_anti")
        }
      val cands = b.as("x")
        .join(b.as("y"),
          col("x.band") === col("y.band") &&
            col("x.bucket") === col("y.bucket") &&
            col("x.id") < col("y.id"))
        .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
        .distinct()
      cands
        .join(shingles.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
        .join(shingles.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
        .select(
          col("id_a"), col("id_b"),
          (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
        .filter(col("jaccard") >= threshold)
    }

    /** Fuzzy-dedup cluster assignment — [[Dedup.nearDupClusters]] from
      * the stored index: connected components over the near-dup pair
      * graph among representatives, then every exact copy inherits its
      * representative's component. Output (idColOut, cluster_id), one
      * row per input document.
      */
    def clusterAssign(
        threshold: Double,
        idColOut: String,
        maxBucketSize: Int = 0,
        maxIterations: Int = 20): DataFrame = {
      import graft.core.{Columns, Graph}
      val reps = clusters.select(col("keep_id").as(Columns.ID), col("ids"))
      val edges = pairs(threshold, maxBucketSize)
        .select(col("id_a").as(Columns.SRC), col("id_b").as(Columns.DST))
      val cc = graft.algorithms.AlternatingConnectedComponents(maxIterations)
        .run(Graph(reps.select(col(Columns.ID)), edges, directed = false))
      reps
        .join(cc, Seq(Columns.ID), "left")
        .select(
          explode(col("ids")).as(idColOut),
          coalesce(col(Columns.COMPONENT), col(Columns.ID)).as("cluster_id"))
    }
  }

  /** Build the index frames from a corpus. `checkpoint` pins all three
    * (the default `Local` is right when the index is consumed in the
    * same session; pass [[CheckpointPolicy.Passthrough]] when the
    * caller writes the frames straight to storage and re-reads them —
    * pinning would force an extra materialization of data about to be
    * written anyway).
    */
  def build(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 128,
      bands: Int = 32,
      checkpoint: CheckpointPolicy = CheckpointPolicy.Local): Index = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    // `sha` rides along so a later [[merge]] can match incoming texts
    // against existing groups without the corpus — 32 bytes per distinct
    // text
    val clusters = checkpoint.pin(
      docs.select(col(idCol).as("id"), sha2(col(textCol), 256).as("_th"))
        .groupBy(col("_th"))
        .agg(
          min(col("id")).as("keep_id"),
          count(lit(1)).as("n_copies"),
          sort_array(collect_list(col("id"))).as("ids"))
        .select(col("keep_id"), col("n_copies"), col("ids"), col("_th").as("sha")))
    // representative texts come back by a semi-join on the (narrow)
    // representative-id set — the corpus text never rides the collapse
    // shuffle
    val reps = docs.select(col(idCol).as("id"), col(textCol).as("_text"))
      .join(clusters.select(col("keep_id").as("id")), Seq("id"), "left_semi")
    val sh = checkpoint.pin(
      reps.select(
        col("id"),
        array_distinct(
          TextFunctions.shingles(TextFunctions.tokens(col("_text")), shingleSize))
          .as("sh"))
        .filter(size(col("sh")) > 0))
    val buckets = checkpoint.pin(
      Dedup.minhashSignatures(sh, numHashes)
        .select(col("id"),
          explode(Dedup.lshBuckets(col("sig"), bands, numHashes / bands)).as("bk"))
        .select(col("bk.band").as("band"), col("bk.bucket").as("bucket"), col("id")))
    Index(clusters, sh, buckets, shingleSize, numHashes, bands)
  }

  /** Incrementally fold a batch of NEW documents into an existing index
    * — the daily-append lifecycle a crawl pipeline runs, without
    * rebuilding: signature work is proportional to the batch's NEW
    * DISTINCT texts only (exact copies of indexed texts match by sha and
    * never touch MinHashSig; copies inside the batch collapse first).
    *
    * Exactly equivalent to `build(oldCorpus ∪ newDocs)` — representative
    * ids are minima per distinct text, and signatures are a pure
    * function of the TEXT, so when a new copy undercuts an old
    * representative's id the stored signature/bucket rows are RE-KEYED
    * (an id rewrite), never recomputed. TextDedupSpec pins
    * merge ≡ whole-rebuild bit for bit.
    */
  def merge(
      old: Index, newDocs: DataFrame, idCol: String, textCol: String,
      checkpoint: CheckpointPolicy = CheckpointPolicy.Local): Index = {
    val newGroups = newDocs
      .select(col(idCol).as("id"), sha2(col(textCol), 256).as("sha"))
      .groupBy(col("sha"))
      .agg(
        min(col("id")).as("_nk"),
        count(lit(1)).as("_nn"),
        sort_array(collect_list(col("id"))).as("_nids"))
    val joined = old.clusters
      .join(newGroups, Seq("sha"), "full")
      .localCheckpoint() // consumed by clusters, the rekey map AND the new-rep set
    val clusters = checkpoint.pin(joined.select(
      least(coalesce(col("keep_id"), col("_nk")),
        coalesce(col("_nk"), col("keep_id"))).as("keep_id"),
      (coalesce(col("n_copies"), lit(0L)) + coalesce(col("_nn"), lit(0L)))
        .as("n_copies"),
      array_sort(concat(
        coalesce(col("ids"), array().cast("array<long>")),
        coalesce(col("_nids"), array().cast("array<long>")))).as("ids"),
      col("sha")))
    // matched groups where the batch undercuts the old representative id:
    // rewrite the stored rows' key (tiny frame — changed groups only)
    val rekey = joined
      .filter(col("keep_id").isNotNull && col("_nk").isNotNull &&
        col("_nk") < col("keep_id"))
      .select(col("keep_id").as("_oldid"), col("_nk").as("_newid"))
    def rekeyed(df: DataFrame): DataFrame = df
      .join(broadcast(rekey), df("id") === rekey("_oldid"), "left")
      .select(df.columns.map {
        case "id" => coalesce(col("_newid"), col("id")).as("id")
        case c => col(c)
      }.toSeq: _*)
    // genuinely new texts: the ONLY MinHashSig work in the whole merge
    val newReps = joined.filter(col("keep_id").isNull)
      .select(col("_nk").as(idCol))
    val newShs = newDocs
      .join(newReps, Seq(idCol), "left_semi")
      .select(
        col(idCol).as("id"),
        array_distinct(
          TextFunctions.shingles(TextFunctions.tokens(col(textCol)), old.shingleSize))
          .as("sh"))
      .filter(size(col("sh")) > 0)
    val newBks = Dedup.minhashSignatures(newShs, old.numHashes)
      .select(col("id"),
        explode(Dedup.lshBuckets(col("sig"), old.bands,
          old.numHashes / old.bands)).as("bk"))
      .select(col("bk.band").as("band"), col("bk.bucket").as("bucket"), col("id"))
    Index(
      clusters,
      checkpoint.pin(rekeyed(old.shingles).unionByName(newShs)),
      checkpoint.pin(rekeyed(old.buckets).unionByName(newBks)),
      old.shingleSize, old.numHashes, old.bands)
  }

  /** Streaming face of [[merge]] — the daily-append lifecycle run
    * directly from the ingest stream [[graft.streaming.DocStream]]
    * probes with: each micro-batch folds into the persisted bucketed
    * tables (read → [[merge]] → [[writeBucketed]]), so the index the
    * probe side reads is always the merge of everything delivered.
    *
    * Semantics & hygiene:
    *  - every `merge` output frame is localCheckpoint-pinned BEFORE the
    *    overwrite, so rewriting the tables a lazy plan was reading from
    *    cannot self-invalidate;
    *  - `foreachBatch` is at-least-once on recovery, and [[merge]] is
    *    NOT idempotent for redelivered ids (a replayed copy would
    *    inflate `n_copies`), so delivered ids already present in the
    *    stored clusters are anti-joined away first — one pass over the
    *    compact clusters table per micro-batch buys exactly-once index
    *    contents;
    *  - batch work stays proportional to the batch (signatures for new
    *    DISTINCT texts only — the [[merge]] contract); the table
    *    rewrite itself is corpus-sized, which is the bucketed-catalog
    *    trade (zero-exchange probes) — an append-friendly format keeps
    *    the same merge logic with O(batch) writes.
    *
    * Returns the configured writer; callers add `.option(
    * "checkpointLocation", ...)` and `.start()`.
    */
  def mergeStream(
      docs: DataFrame, idCol: String, textCol: String,
      name: String, numBuckets: Int = 32)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.outputMode("update").foreachBatch {
      (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val idx = readBucketed(spark, name)
        val known = idx.clusters.select(explode(col("ids")).as(idCol))
        // collapse intra-batch duplicates DETERMINISTICALLY first (a
        // producer-retry duplicate would otherwise pass the anti-join
        // twice and inflate n_copies; min(text) — not dropDuplicates,
        // whose pick is partition-order-dependent — pins which payload
        // wins when a retry changed the text, so reruns build identical
        // indexes); the anti-join then removes cross-batch redelivery
        val fresh = batch
          .groupBy(col(idCol))
          .agg(min(col(textCol)).as(textCol))
          .join(known, Seq(idCol), "left_anti")
        if (!fresh.isEmpty) {
          writeBucketed(merge(idx, fresh, idCol, textCol), name, numBuckets)
        }
    }

  private def metaFrame(idx: Index): DataFrame = {
    val spark = idx.clusters.sparkSession
    import spark.implicits._
    Seq((idx.shingleSize, idx.numHashes, idx.bands))
      .toDF("shingle_size", "num_hashes", "bands")
  }

  /** Persist as catalog tables `<name>_{clusters,shingles,buckets,meta}`
    * with the join-key bucketing that makes every later probe
    * exchange-free on the stored side. Overwrites.
    */
  def writeBucketed(idx: Index, name: String, numBuckets: Int = 32): Unit = {
    val spark = idx.clusters.sparkSession
    Seq("clusters", "shingles", "buckets", "meta").foreach(t =>
      graft.sources.CatalogTables.prepareOverwrite(spark, s"${name}_$t"))
    idx.clusters.write.mode("overwrite").saveAsTable(s"${name}_clusters")
    idx.shingles.write.mode("overwrite")
      .bucketBy(numBuckets, "id").sortBy("id")
      .saveAsTable(s"${name}_shingles")
    idx.buckets.write.mode("overwrite")
      .bucketBy(numBuckets, "band", "bucket").sortBy("band", "bucket")
      .saveAsTable(s"${name}_buckets")
    metaFrame(idx).coalesce(1).write.mode("overwrite").saveAsTable(s"${name}_meta")
  }

  def readBucketed(spark: SparkSession, name: String): Index = {
    val m = spark.table(s"${name}_meta").head()
    Index(
      spark.table(s"${name}_clusters"),
      spark.table(s"${name}_shingles"),
      spark.table(s"${name}_buckets"),
      m.getInt(0), m.getInt(1), m.getInt(2))
  }

  /** Plain-parquet face: `<path>/{clusters,shingles,buckets,_meta}`
    * directories, repartitioned + sorted within partitions on the join
    * keys so parquet row-group min/max stats prune key-range probes.
    * Portable (no catalog); the bucketed face is the zero-exchange one.
    */
  def write(idx: Index, path: String): Unit = {
    idx.clusters.write.mode("overwrite").parquet(s"$path/clusters")
    idx.shingles.repartition(col("id")).sortWithinPartitions("id")
      .write.mode("overwrite").parquet(s"$path/shingles")
    idx.buckets.repartition(col("band"), col("bucket"))
      .sortWithinPartitions("band", "bucket")
      .write.mode("overwrite").parquet(s"$path/buckets")
    metaFrame(idx).coalesce(1).write.mode("overwrite").parquet(s"$path/_meta")
  }

  def read(spark: SparkSession, path: String): Index = {
    val m = spark.read.parquet(s"$path/_meta").head()
    Index(
      spark.read.parquet(s"$path/clusters"),
      spark.read.parquet(s"$path/shingles"),
      spark.read.parquet(s"$path/buckets"),
      m.getAs[Int]("shingle_size"), m.getAs[Int]("num_hashes"), m.getAs[Int]("bands"))
  }
}
