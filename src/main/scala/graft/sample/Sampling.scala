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

  /** Temperature-flattening keep-rates for [[mixtureSample]] — the
    * multilingual-LM mixing move (cf. XLM-R, mT5): resample so the kept
    * count per stratum is ∝ n^α instead of n, damping the dominant
    * source without starving the tail. Bernoulli thinning cannot
    * upsample, so rates are scaled to keep the SMALLEST stratum whole:
    * rate_i = (n_min / n_i)^(1−α), giving kept_i ∝ n_i^α with
    * rate_min = 1. α = 1 keeps everything (proportional); α → 0
    * equalizes all strata to ~n_min.
    *
    * Cross-engine determinism: at the default α = 0.5 the rate is one
    * correctly-rounded division and one correctly-rounded sqrt —
    * bit-identical in any IEEE-754 engine, so the downstream
    * `floor(rate·2³²)` hash gate replays exactly. Other α values go
    * through `pow`, whose last-ulp behavior is libm-specific — fine
    * within one engine, documented hazard for cross-engine replay.
    *
    * One combinable count per stratum + a broadcast 1-row min join; the
    * corpus is scanned once and never shuffled.
    */
  def temperatureRates(
      items: DataFrame, strataCol: String, alpha: Double = 0.5): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    val counts = items.groupBy(col(strataCol)).agg(count(lit(1)).as("_n"))
    val mn = broadcast(counts.agg(min(col("_n")).as("_mn")))
    val ratio = col("_mn").cast("double") / col("_n").cast("double")
    val rate =
      if (alpha == 0.5) sqrt(ratio)
      else if (alpha == 1.0) lit(1.0)
      else pow(ratio, lit(1.0 - alpha))
    counts.crossJoin(mn).select(col(strataCol), rate.as("rate"))
  }

  /** Assign every row to one of `numShards` output shards so the shard
    * WEIGHT totals (e.g. token counts) are near-equal — the write side of
    * a training-data pipeline, where equal-token shards mean equal-cost
    * training files. Deterministic: rows are laid out in (idHash top
    * byte, id) order, the exclusive running weight sum w_cum is computed
    * in that order, and shard = (w_cum * numShards) div total_weight —
    * so each shard's imbalance is bounded by the single largest row
    * weight, and reruns produce identical assignments.
    *
    * Scale shape (the d06 two-level trick, global instead of per-group):
    * the running sum is computed per hash-shard (256-way parallel — no
    * single reducer ever sees the corpus), then a tiny second pass
    * (256 rows) offsets each hash-shard by the exclusive prefix sum of
    * its predecessors' totals. Equivalent to ONE global running sum in
    * (hash_shard, id) order, which is what the DuckDB oracle checks.
    * Overflow bound: w_cum * numShards must stay under 2^63 — at 1e14
    * total tokens and 4096 shards that is 4e17, comfortably inside.
    *
    * Output: input columns + `shard` in [0, numShards). */
  def balancedShards(items: DataFrame, idCol: String, weightCol: String,
      numShards: Int): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    import org.apache.spark.sql.expressions.Window
    val hs = shiftright(idHash(col(idCol)), 24) // top byte, 0..255
    val base = items.withColumn("_hs", hs)
    val wIn = Window.partitionBy(col("_hs")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val inShard = base.withColumn("_cum",
      coalesce(sum(col(weightCol)).over(wIn), lit(0L)))
    val wOff = Window.orderBy(col("_hs"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy()
    val offsets = base.groupBy(col("_hs"))
      .agg(sum(col(weightCol)).as("_tot"))
      .withColumn("_off", coalesce(sum(col("_tot")).over(wOff), lit(0L)))
      .withColumn("_total", sum(col("_tot")).over(wAll))
      .select(col("_hs"), col("_off"), col("_total"))
    inShard.join(broadcast(offsets), Seq("_hs"))
      .withColumn("shard",
        expr(s"((_off + _cum) * $numShards) div _total"))
      .drop("_hs", "_cum", "_off", "_total")
  }

  /** EXACT per-stratum lower-quantile threshold — the "drop the worst
    * decile per language" primitive. Returns (strataCol, threshold) where
    * threshold is the smallest value whose cumulative count reaches
    * ceil(quantile * n) in the stratum; filtering `value >= threshold`
    * keeps at least the top (1-quantile) share, with ties kept.
    *
    * Exact, not a sketch, yet never sorts the corpus: the running count
    * is over DISTINCT (stratum, value) pairs — for bucketed scores
    * (e.g. round(...,6) quality) that is orders of magnitude smaller
    * than the corpus, and the corpus itself is touched only by one
    * map-side-combinable groupBy. ceil(quantile * n) is one IEEE double
    * multiply + ceil on both engines, so the rank is cross-engine
    * reproducible. */
  def quantileThresholds(items: DataFrame, strataCol: String,
      valueCol: String, quantile: Double): DataFrame = {
    require(quantile > 0.0 && quantile < 1.0,
      s"quantile must be in (0,1), got $quantile")
    import org.apache.spark.sql.expressions.Window
    val counts = items.groupBy(col(strataCol), col(valueCol))
      .agg(count(lit(1)).as("_c"))
    val w = Window.partitionBy(col(strataCol)).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy(col(strataCol))
    // stratum size = sum of the distinct-value counts: derived from the
    // aggregated frame, so the corpus is scanned ONCE (for expensive
    // computed values — a regexp-heavy quality score at 100x corpus
    // scale — the saved pass is the dominant cost)
    val cum = counts
      .withColumn("_cum", sum(col("_c")).over(w))
      .withColumn("_n", sum(col("_c")).over(wAll))
    cum.filter(col("_cum") >= ceil(lit(quantile) * col("_n")).cast("long"))
      .groupBy(col(strataCol)).agg(min(col(valueCol)).as("threshold"))
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

  /** TOKEN-BUDGET sampling — keep, per stratum, the deterministic
    * pseudo-random PREFIX of documents whose running token total stays
    * under that stratum's budget: the "take B tokens of web, B' of
    * code" composition step a training run with a fixed token budget
    * actually executes (rate-based thinning — [[mixtureSample]] — hits a
    * SHARE, not a COUNT; when the recipe is stated in tokens, the gate
    * must be a running sum, not a rate). Documents are laid out in
    * (idHash, id) order — a reproducible pseudo-random permutation, so
    * the kept prefix is an unbiased sample and reruns/engines agree —
    * and a document is kept iff the EXCLUSIVE cumulative token count
    * before it is under the budget: the straddling document is kept
    * (overshoot bounded by one document), and a budget smaller than the
    * first document still yields it rather than an empty stratum.
    *
    * Scale shape (the [[balancedShards]] two-level device, per stratum):
    * the running sum is computed per (stratum, 256-way hash shard) — no
    * single reducer ever sees a whole stratum, the exact hazard of a
    * naive per-source window when one source is half the corpus — then a
    * dimension-sized offsets frame (256 rows per stratum) broadcasts the
    * exclusive prefix of preceding shards. Because the shard key is the
    * hash's top byte, (shard, hash, id) order IS (hash, id) order, which
    * is what the oracle replays as ONE window. One corpus scan for the
    * sums, one for the gate; `budgets` is (strataCol, budgetCol), one
    * row per stratum, broadcast. Strata absent from `budgets` are
    * dropped (inner join), the [[mixtureSample]] convention.
    *
    * Output: input columns + `cum_before` (the exclusive pre-sum — the
    * evidence column that makes the gate auditable). */
  def tokenBudgetSample(items: DataFrame, idCol: String, weightCol: String,
      strataCol: String, budgets: DataFrame,
      budgetCol: String = "budget"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = items
      .withColumn("_h", idHash(col(idCol)))
      .withColumn("_hs", shiftright(col("_h"), 24))
    val wIn = Window.partitionBy(col(strataCol), col("_hs"))
      .orderBy(col("_h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val inShard = base.withColumn("_cum",
      coalesce(sum(col(weightCol)).over(wIn), lit(0L)))
    val wOff = Window.partitionBy(col(strataCol)).orderBy(col("_hs"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy(col(strataCol), col("_hs"))
      .agg(sum(col(weightCol)).as("_tot"))
      .withColumn("_off", coalesce(sum(col("_tot")).over(wOff), lit(0L)))
      .select(col(strataCol), col("_hs"), col("_off"))
    inShard.join(broadcast(offsets), Seq(strataCol, "_hs"))
      .join(broadcast(budgets), Seq(strataCol))
      .withColumn("cum_before", col("_off") + col("_cum"))
      .filter(col("cum_before") < col(budgetCol))
      .drop("_h", "_hs", "_cum", "_off", budgetCol)
  }

  /** LEAKAGE-SAFE train/validation/test split: the split decision hashes
    * the TEXT, not the id, so byte-identical documents always land in
    * the SAME split — the guard without which duplicate documents leak
    * training text into evaluation (the de-facto standard is splitting
    * on a content hash for exactly this reason; an id-hash split leaks
    * one row per duplicate pair). Near-duplicates still need the d09
    * near-dup machinery; this closes the exact-copy channel at zero
    * extra cost. The bucket is the 48-bit sha256-prefix
    * ([[graft.sketch.Kmv.portableHash]] — already oracle-replayable)
    * mod 1000, so the split is a pure per-row codegen map: no shuffle,
    * no state, reproducible across engines, retries and corpus growth
    * (a new document never moves an old one).
    *
    * Output: input columns + `bucket` (0–999) + `split`
    * ('train' below trainPermille, 'val' in the next valPermille,
    * 'test' above). */
  def leakageSafeSplit(
      docs: DataFrame, textCol: String,
      trainPermille: Int = 800, valPermille: Int = 100): DataFrame =
    splitByKey(docs, textCol, trainPermille, valPermille)

  /** The split mechanism itself, parameterized by the co-location KEY:
    * rows with equal keys always share a split. [[leakageSafeSplit]]
    * passes the text (exact copies co-locate); passing a fuzzy-dedup
    * CLUSTER id ([[graft.dedup.Dedup.nearDupClusters]] /
    * `DedupIndex.clusterAssign`) strengthens the guarantee to
    * NEAR-duplicates — the paraphrased-leak channel a content-hash
    * split still leaves open. */
  def splitByKey(
      df: DataFrame, keyCol: String,
      trainPermille: Int = 800, valPermille: Int = 100): DataFrame = {
    require(trainPermille >= 0 && valPermille >= 0
      && trainPermille + valPermille <= 1000,
      s"permille shares must be >= 0 and sum <= 1000, " +
        s"got $trainPermille + $valPermille")
    df
      .withColumn("bucket",
        pmod(graft.sketch.Kmv.portableHash(col(keyCol)), lit(1000L)))
      .withColumn("split",
        when(col("bucket") < trainPermille, "train")
          .when(col("bucket") < trainPermille + valPermille, "val")
          .otherwise("test"))
  }

  /** SOURCE-level curation report — the C4/Common-Crawl-style
    * domain-filter decision made from per-source aggregates instead of
    * per-document ones: heavy intra-source duplication and bottom-tier
    * average quality are properties of the SOURCE (mirror farms,
    * boilerplate template hosts, SEO spam), and production pipelines
    * drop or downweight whole sources before any per-document gate
    * runs.
    *
    * Per source: document count, distinct-text count (sha256 collapse —
    * the text never shuffles, 32-byte digests do), exact token and
    * stopword-hit totals, a 6-decimal duplication ratio for reporting,
    * and the keep decision in PURE INTEGER comparisons (so any engine
    * replays it):
    *
    *   keep = n_distinct · maxDupX        >= n_docs        (dup ratio cap)
    *        ∧ n_tokens                    >= minMeanToks · n_docs
    *        ∧ n_stop_hits · stopDenom     >= n_tokens      (stopword floor)
    *
    * Scale shape: ONE pass over the corpus (all five aggregates are
    * map-side combinable; the sha-distinct is a two-level groupBy on
    * digests) and the output is one row per source — the decision table
    * a mixture step ([[mixtureSample]]) consumes directly.
    */
  def sourceCuration(
      docs: DataFrame,
      textCol: String,
      sourceCol: String,
      maxDupX: Int = 2,
      minMeanToks: Int = 5,
      stopDenom: Int = 100,
      stopwords: Seq[String] = graft.text.TextFunctions.DefaultStopwords)
      : DataFrame = {
    val toks = graft.text.TextFunctions.tokens(col(textCol))
    val perText = docs.select(
      col(sourceCol).as("source"),
      sha2(col(textCol), 256).as("_th"),
      size(toks).cast("long").as("_nt"),
      graft.text.TextFunctions.stopwordCount(col(textCol), stopwords)
        .cast("long").as("_ns"))
      .groupBy(col("source"), col("_th"))
      .agg(count(lit(1)).as("_cnt"), sum(col("_nt")).as("_t"),
        sum(col("_ns")).as("_s"))
    perText.groupBy(col("source"))
      .agg(
        sum(col("_cnt")).as("n_docs"),
        count(lit(1)).as("n_distinct"),
        sum(col("_t")).as("n_tokens"),
        sum(col("_s")).as("n_stop_hits"))
      .select(
        col("source"), col("n_docs"), col("n_distinct"),
        col("n_tokens"), col("n_stop_hits"),
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_docs"), 6)
          .as("dup_ratio"),
        (col("n_distinct") * maxDupX >= col("n_docs") &&
          col("n_tokens") >= col("n_docs") * minMeanToks &&
          col("n_stop_hits") * stopDenom >= col("n_tokens")).as("keep"))
  }
}
