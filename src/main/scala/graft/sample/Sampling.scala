package graft.sample

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for corpus composition ("data
  * mixing"): given per-stratum target rates (e.g. upsample curated
  * sources, downsample crawl), keep a deterministic pseudo-random subset
  * of each stratum. The keep/drop decision is a pure function of the
  * document id — no RNG state — so the sample is reproducible across
  * engines, retries, partitionings and reruns, and any two runs over
  * overlapping corpora agree on the shared rows (the property that makes
  * incremental re-mixing possible: adding new documents never changes
  * which old ones were kept).
  *
  * Same Knuth multiplicative hash as the stratified sampler
  * (queries/DocQueries.scala d05) and the token packer (d06): ids are
  * first reduced mod 2^31 so the multiply stays < 5.7e18 (the raw product
  * overflows i64 once ids exceed ~3.4e9 — real corpus ids do), pmod so
  * negative ids hash identically in every engine.
  *
  * Scale shape: one broadcast join (the rates table is tiny — one row per
  * source/stratum) + one codegen'd filter. No shuffle, no window, no
  * aggregation; the scan prunes to the filter's survivors. This is the
  * cheapest possible composition step at 100 TB.
  */
object Sampling {

  /** 32-bit deterministic hash of an id, uniform on [0, 2^32). */
  def idHash(id: Column): Column =
    pmod(pmod(id, lit(2147483648L)) * lit(2654435761L), lit(4294967296L))

  /** Keep each row of `items` with probability `rates.rate` for its
    * stratum, deterministically: keep iff idHash(id) < floor(rate * 2^32).
    * `rates` is (strataCol, rateCol) with rates in [0, 1]; rate 1.0 keeps
    * every row (threshold 2^32 exceeds every hash), 0.0 keeps none.
    * Strata absent from `rates` are DROPPED (inner join) — pass an
    * explicit rate for every stratum you want represented. floor() (not a
    * bare cast) so the threshold is identical in engines that round
    * double->int casts instead of truncating. */
  def mixtureSample(items: DataFrame, idCol: String, strataCol: String,
      rates: DataFrame, rateCol: String = "rate"): DataFrame = {
    val thr = floor(col(rateCol) * lit(4294967296.0)).cast("bigint")
    items.join(broadcast(rates), Seq(strataCol))
      .filter(idHash(col(idCol)) < thr)
      .drop(rateCol)
  }

  /** Achieved composition of a (possibly sampled) corpus: rows and token
    * share per stratum — the report a mixing run is judged by. One
    * map-side-combinable aggregation. */
  def composition(items: DataFrame, strataCol: String,
      weightCol: Option[String] = None): DataFrame = {
    val w = weightCol.map(col).getOrElse(lit(1L))
    val agg = items.groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_rows"), sum(w).as("weight"))
    agg.withColumn("share",
      col("weight").cast("double") / sum(col("weight")).over())
  }
}
