package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** Deduplication operators for training-data pipelines, from exact to
  * near-duplicate. All shapes are chosen for 100 TB operation:
  *
  *  - exact dedup is one hash-shuffle on the text (or its SHA) — the
  *    canonical map-side-combinable groupBy;
  *  - MinHash+LSH turns the O(N²) all-pairs problem into an
  *    explode-by-band + equi-join on bucket keys: the shuffle is keyed by
  *    (band, bucket-hash), so co-bucketed docs land on one reducer and
  *    unrelated docs never meet. Hot buckets (boilerplate docs) are the
  *    skew risk — AQE skew-join handles moderate cases; pathological
  *    buckets should be capped upstream;
  *  - SimHash near-dup uses the pigeonhole principle: a ≤ `maxDist`-bit
  *    difference forces at least one identical 16-bit chunk, so candidates
  *    come from an equi-join on (chunk-index, chunk-value);
  *  - exact n-gram Jaccard avoids the cross join with an inverted-index
  *    self-join on shingle, counting co-occurrences per pair.
  *
  * Signatures and buckets are all computed with `xxhash64` inside
  * whole-stage codegen — no UDFs anywhere.
  */
object Dedup {

  /** One row per distinct text: the id to keep (minimum), the copy count,
    * and the sorted duplicate ids.
    */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(col(textCol))
      .agg(
        min(col(idCol)).as("keep_id"),
        count(lit(1)).as("n_copies"),
        sort_array(collect_list(col(idCol))).as("ids"))

  /** MinHash signature: element s is min over shingles of xxhash64(s, shingle). */
  def minhashSignature(shinglesCol: Column, numHashes: Int): Column =
    transform(
      sequence(lit(0), lit(numHashes - 1)),
      s => array_min(transform(shinglesCol, x => xxhash64(s, x))))

  /** LSH bucket keys: the signature is cut into `bands` bands of
    * `rowsPerBand` hashes; each band hashes to one (band, bucket) key.
    */
  def lshBuckets(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(
      sequence(lit(0), lit(bands - 1)),
      b => struct(
        b.as("band"),
        xxhash64(slice(sig, b * lit(rowsPerBand) + lit(1), lit(rowsPerBand))).as("bucket")))

  /** Near-duplicate pairs by MinHash LSH, verified with exact shingle
    * Jaccard. Returns (id_a, id_b, jaccard) with id_a < id_b and
    * jaccard >= `threshold`.
    *
    * With numHashes=128, bands=32 (r=4) the candidate-recall curve crosses
    * ~0.5 at s ≈ (1/32)^(1/4) ≈ 0.42, so threshold 0.5+ pairs are caught
    * with high probability.
    */
  def minhashDuplicates(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 128,
      bands: Int = 32,
      threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val sh = docs.select(
      col(idCol).as("id"),
      array_distinct(TextFunctions.shingles(TextFunctions.tokens(col(textCol)), shingleSize))
        .as("sh"))
      .filter(size(col("sh")) > 0)
      // shingle sets are reused by banding and the verify join
      .localCheckpoint()

    val buckets = sh.select(
      col("id"),
      explode(lshBuckets(minhashSignature(col("sh"), numHashes), bands, r)).as("bk"))
    val cands = buckets.as("x")
      .join(buckets.as("y"),
        col("x.bk") === col("y.bk") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()

    cands
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(
        col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash of the token multiset: bit b is set when the b-th bit
    * of the token hashes wins the weighted majority vote. Built as a SQL
    * lambda expression over the named array-of-tokens column (shiftright
    * with a non-literal amount has no Scala DSL form); still pure
    * Catalyst, fully codegen'd.
    */
  def simhashExpr(toksColName: String): Column =
    expr(
      s"""aggregate(
         |  transform(sequence(0, 63), b ->
         |    case when aggregate($toksColName, 0L, (acc, t) ->
         |           acc + case when (shiftright(xxhash64(t), b) & 1) = 1
         |                      then 1 else -1 end) > 0
         |         then shiftleft(1L, b) else 0L end),
         |  0L, (acc, x) -> acc | x)""".stripMargin)

  /** Near-duplicate pairs by SimHash Hamming distance <= maxDist (<= 3 for
    * the 4x16-bit pigeonhole to be exhaustive). Output
    * (id_a, id_b, hamming), id_a < id_b.
    */
  def simhashDuplicates(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxDist: Int = 3): DataFrame = {
    require(maxDist <= 3, "4-chunk pigeonhole is exhaustive only for maxDist <= 3")
    val hashed = docs.select(
      col(idCol).as("id"),
      TextFunctions.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("id"), simhashExpr("toks").as("sh"))
      .localCheckpoint()

    val chunks = hashed.select(
      col("id"), col("sh"),
      explode(expr(
        "transform(sequence(0, 3), c -> " +
          "struct(c as c, shiftright(sh, c * 16) & 65535 as v))")).as("ck"))
    chunks.as("x")
      .join(chunks.as("y"), col("x.ck") === col("y.ck") && col("x.id") < col("y.id"))
      .select(
        col("x.id").as("id_a"), col("y.id").as("id_b"),
        bit_count(col("x.sh").bitwiseXOR(col("y.sh"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  /** Exact n-gram Jaccard >= threshold for ALL qualifying pairs, via an
    * inverted-index self-join on shingle (no cross join): pairs that share
    * no shingle are never materialized, and |A ∩ B| falls out of a count
    * per pair.
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    val sh = docs.select(
      col(idCol).as("id"),
      array_distinct(TextFunctions.shingles(TextFunctions.tokens(col(textCol)), shingleSize))
        .as("sh"))
      .filter(size(col("sh")) > 0)
    val sizes = sh.select(col("id"), size(col("sh")).as("n"))
    val inv = sh.select(col("id"), explode(col("sh")).as("g"))
    val inter = inv.as("x")
      .join(inv.as("y"), col("x.g") === col("y.g") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("n").as("na")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("n").as("nb")), Seq("id_b"))
      .select(
        col("id_a"), col("id_b"),
        (col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
