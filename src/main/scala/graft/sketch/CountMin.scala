package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan 2005): fixed-size frequency
  * estimation over an unbounded key stream — the 100 TB answer to "how
  * often does each of these tokens appear" when a full `groupBy(token)`
  * would materialize billions of counter rows. `depth` hash rows ×
  * `width` buckets; every occurrence increments one bucket per row, and
  * a key's estimate is the MIN of its `depth` bucket counters — an
  * overestimate by construction (collisions only add), within
  * `2·N/width` of truth with probability `1 − 2^−depth`.
  *
  * Like [[Kmv]], the hash is a sha256 prefix, so the whole sketch —
  * build AND estimate — is reproducible bit for bit by any engine with
  * sha256 (the auditability property; swap [[bucket]] for an xxhash64
  * variant if throughput ever beats auditability).
  *
  * Scale shape: the build explodes each occurrence into `depth` tiny
  * (row, bucket) structs and reduces through ONE map-side-combinable
  * aggregation whose global output is ≤ depth·width rows — each
  * partition ships at most depth·width partial counters regardless of
  * input size, and the finished sketch broadcasts everywhere. Sketches
  * over data shards merge by summing counters ([[merge]]), the property
  * that makes the build embarrassingly parallel.
  */
object CountMin {

  /** Bucket of `key` in hash row `i`: 48-bit sha256-prefix of
    * "key#i", mod width. Non-negative, so `%` and `pmod` agree in every
    * engine. */
  def bucket(key: Column, i: Int, width: Int): Column =
    pmod(Kmv.portableHash(concat(key.cast("string"), lit("#"), lit(i))),
      lit(width.toLong))

  /** Build the sketch over every row of `df` (multiset semantics — one
    * increment per row). Output: (row_i, bucket, cnt), ≤ depth·width
    * rows.
    *
    * Runs UNCHANGED on a streaming DataFrame (write with
    * OutputMode.Complete): counters are additive, so Spark's built-in
    * stateful aggregation IS the streaming sketch — bounded state of
    * ≤ depth·width counters, no custom state function — and after any
    * batch split the counters equal the batch sketch of the union
    * (KmvSpec pins this). */
  def sketch(df: DataFrame, key: Column, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 1, s"bad sketch shape ${depth}x$width")
    val cells = (0 until depth).map(i =>
      struct(lit(i).as("row_i"), bucket(key, i, width).as("bucket")))
    df.select(explode(array(cells: _*)).as("rb"))
      .groupBy(col("rb.row_i").as("row_i"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge sketches built with the same (depth, width) by summing
    * counters — the union stream's sketch, exactly. */
  def merge(sketches: DataFrame*): DataFrame =
    sketches.reduce(_ unionAll _)
      .groupBy(col("row_i"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Point estimates for `probes` (deduplicated on `key`) from a built
    * sketch: (probe_key, est) with est = min over rows of the probed
    * bucket, 0 for keys whose bucket was never touched. The sketch side
    * broadcasts (≤ depth·width rows); the probe side streams — probing
    * scales to arbitrarily many keys. */
  def estimate(sk: DataFrame, probes: DataFrame, key: Column,
      depth: Int, width: Int): DataFrame = {
    val cells = (0 until depth).map(i =>
      struct(lit(i).as("row_i"), bucket(col("probe_key"), i, width).as("bucket")))
    probes.select(key.as("probe_key")).distinct()
      .select(col("probe_key"), explode(array(cells: _*)).as("rb"))
      .select(col("probe_key"), col("rb.row_i").as("row_i"),
        col("rb.bucket").as("bucket"))
      .join(broadcast(sk), Seq("row_i", "bucket"), "left")
      .groupBy(col("probe_key"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}
