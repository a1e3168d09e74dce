package graft

import org.apache.spark.sql.functions._

import graft.sample.Sampling

class SamplingSpec extends SparkSpec {

  private def corpus(n: Int) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, s"src${i % 4}", 10L + i % 7))
      .toDF("doc_id", "source", "n_tokens")
  }

  private def rates(rs: (String, Double)*) = {
    import spark.implicits._
    rs.toDF("source", "rate")
  }

  test("mixtureSample: rate 1 keeps all, rate 0 keeps none, missing stratum drops") {
    val items = corpus(400)
    val r = rates("src0" -> 1.0, "src1" -> 0.0, "src2" -> 0.5)
    val kept = Sampling.mixtureSample(items, "doc_id", "source", r)
    val bySrc = kept.groupBy("source").count().collect()
      .map(row => row.getString(0) -> row.getLong(1)).toMap
    assert(bySrc.getOrElse("src0", 0L) === 100L, "rate 1.0 keeps every row")
    assert(!bySrc.contains("src1"), "rate 0.0 keeps none")
    assert(!bySrc.contains("src3"), "stratum without a rate is dropped")
    val half = bySrc.getOrElse("src2", 0L)
    // deterministic hash, not RNG: the achieved fraction is fixed for
    // this id set — just require it is a real subsample near the rate
    assert(half > 25L && half < 75L, s"rate 0.5 kept $half of 100")
  }

  test("mixtureSample: deterministic and stable under corpus growth") {
    val r = rates("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.75, "src3" -> 0.5)
    val small = Sampling.mixtureSample(corpus(200), "doc_id", "source", r)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val again = Sampling.mixtureSample(corpus(200), "doc_id", "source", r)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(small === again, "same corpus, same mix")
    val grown = Sampling.mixtureSample(corpus(400), "doc_id", "source", r)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(grown.filter(_ < 200L) === small,
      "growing the corpus must never flip an old row's keep decision")
  }

  test("mixtureSample: plan is one broadcast join + filter, no shuffle of the corpus") {
    val plan = Sampling.mixtureSample(corpus(100), "doc_id", "source",
        rates("src0" -> 0.5, "src1" -> 0.5, "src2" -> 0.5, "src3" -> 0.5))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"rates must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"corpus must not shuffle:\n$plan")
  }

  test("balancedShards: covers [0,n), balanced within one max weight, deterministic") {
    val items = corpus(1000)
    val n = 8
    val sharded = Sampling.balancedShards(items, "doc_id", "n_tokens", n)
    assert(sharded.count() === 1000L, "every row is assigned")
    val totals = sharded.groupBy("shard").agg(sum("n_tokens").as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(totals.keySet === (0 until n).map(_.toLong).toSet,
      s"all $n shards must be used: ${totals.keySet}")
    val maxW = 16L // weights are 10..16
    assert(totals.values.max - totals.values.min <= 2 * maxW,
      s"imbalance ${totals.values.max - totals.values.min} exceeds bound")
    // deterministic: a rerun assigns identically
    val a = sharded.select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Sampling.balancedShards(items, "doc_id", "n_tokens", n)
      .select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("balancedShards: two-level plan equals the single global running sum") {
    import org.apache.spark.sql.expressions.Window
    val items = corpus(500)
    val n = 16
    val got = Sampling.balancedShards(items, "doc_id", "n_tokens", n)
      .select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // naive single-window reference: one global exclusive running sum in
    // (hash top byte, id) order
    val hs = shiftright(Sampling.idHash(col("doc_id")), 24)
    val w = Window.orderBy(col("_hs"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val tot = items.agg(sum("n_tokens")).collect()(0).getLong(0)
    val want = items.withColumn("_hs", hs)
      .withColumn("_cum", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("shard", expr(s"(_cum * $n) div $tot"))
      .select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want, "two-level must equal the global window")
  }

  test("quantileThresholds: exact decile, ties kept, matches a sorted reference") {
    import spark.implicits._
    // two strata with known distributions; values deliberately repeat
    val rows = (0 until 100).map(i => ("a", (i % 10).toDouble)) ++
      (0 until 50).map(i => ("b", (i % 5).toDouble))
    val df = rows.toDF("lang", "q")
    val thr = Sampling.quantileThresholds(df, "lang", "q", 0.10)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // stratum a: 100 rows, ceil(10)=10th smallest value; sorted values are
    // 0 x10, 1 x10, ... -> cum(0)=10 >= 10, threshold 0.0
    assert(thr("a") === 0.0)
    // stratum b: 50 rows, ceil(5)=5th; cum(0.0)=10 >= 5 -> 0.0
    assert(thr("b") === 0.0)
    // a tighter quantile crosses into the next bucket
    val thr35 = Sampling.quantileThresholds(df, "lang", "q", 0.35)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // a: ceil(35)=35; cum: 10,20,30,40 -> smallest value with cum>=35 is 3.0
    assert(thr35("a") === 3.0)
    // filtering >= threshold keeps at least 1-q of each stratum
    val kept = df.join(broadcast(
        Sampling.quantileThresholds(df, "lang", "q", 0.35)), Seq("lang"))
      .filter(col("q") >= col("threshold"))
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("a") >= 65L && kept("b") >= 33L, s"kept $kept")
  }

  test("temperatureRates: kept counts flatten toward n^alpha, smallest stays whole") {
    import spark.implicits._
    import graft.sample.Sampling
    // strata 100 / 400 / 1600 rows
    val docs = ((1 to 100).map(i => (i.toLong, "small")) ++
      (101 to 500).map(i => (i.toLong, "mid")) ++
      (501 to 2100).map(i => (i.toLong, "big"))).toDF("doc_id", "stratum")
    val rates = Sampling.temperatureRates(docs, "stratum", alpha = 0.5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rates("small") === 1.0)
    assert(math.abs(rates("mid") - 0.5) < 1e-12)   // sqrt(100/400)
    assert(math.abs(rates("big") - 0.25) < 1e-12)  // sqrt(100/1600)
    // sampling at those rates keeps ~ n^0.5-proportional counts:
    // expected 100 / 200 / 400 (ratios 1:2:4), hash-gate noise is
    // O(sqrt(n)) — assert within 15%
    val kept = Sampling.mixtureSample(docs, "doc_id", "stratum", rates.toSeq
        .toDF("stratum", "rate"))
      .groupBy("stratum").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("small") === 100L)
    assert(math.abs(kept("mid") - 200.0) / 200.0 < 0.15, s"mid kept ${kept("mid")}")
    assert(math.abs(kept("big") - 400.0) / 400.0 < 0.15, s"big kept ${kept("big")}")
    // alpha = 1 is proportional sampling: every rate 1.0
    val flat = Sampling.temperatureRates(docs, "stratum", alpha = 1.0)
      .collect().map(_.getDouble(1))
    assert(flat.forall(_ === 1.0))
  }

  test("composition reports row and token shares") {
    val items = corpus(100)
    val m = Sampling.composition(items, "source", Some("n_tokens"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3))).toMap
    assert(m.keySet === Set("src0", "src1", "src2", "src3"))
    assert(m.values.map(_._1).sum === 100L)
    val shares = m.values.map(_._2).sum
    assert(math.abs(shares - 1.0) < 1e-9, s"shares must sum to 1, got $shares")
  }

  test("sourceCuration: mirror farm and stopword-free source dropped, clean source kept") {
    import spark.implicits._
    val good = (1L to 10L).map(i =>
      (i, "the quick brown fox number " + i + " jumps over the lazy dog", "clean"))
    // 10 docs, 3 distinct texts: dup_ratio 0.7 > 1/2 cap -> dropped
    val mirror = (11L to 20L).map(i =>
      (i, "mirrored boilerplate page body copy " + (i % 3), "mirror"))
    // distinct and long enough but ZERO stopword evidence -> dropped
    val spam = (21L to 30L).map(i =>
      (i, (1 to 8).map(j => s"zz$i-$j").mkString(" "), "spam"))
    // too short: mean tokens 2 < 5 -> dropped
    val tiny = (31L to 40L).map(i => (i, s"ok the$i", "tiny"))
    val report = Sampling.sourceCuration(
      (good ++ mirror ++ spam ++ tiny).toDF("doc_id", "text", "source"),
      "text", "source")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(5), r.getBoolean(6)))).toMap
    assert(report("clean") === ((10L, 10L, 0.0, true)))
    assert(report("mirror")._2 === 3L && report("mirror")._3 === 0.7
      && !report("mirror")._4, "mirror farm must fail the dup cap")
    assert(!report("spam")._4, "stopword-free source must fail the floor")
    assert(!report("tiny")._4, "short-doc source must fail the token floor")
  }

  private def budgets(bs: (String, Long)*) = {
    import spark.implicits._
    bs.toDF("source", "budget")
  }

  /** Reference semantics: per stratum, (idHash, id) order, keep while the
    * EXCLUSIVE running weight sum is under the budget. */
  private def referenceKept(
      rows: Seq[(Long, String, Long)], budget: Map[String, Long]): Set[Long] = {
    def h(id: Long): Long = {
      val m = ((id % 2147483648L) + 2147483648L) % 2147483648L
      val p = m * 2654435761L
      ((p % 4294967296L) + 4294967296L) % 4294967296L
    }
    rows.groupBy(_._2).filter(g => budget.contains(g._1)).flatMap {
      case (src, docs) =>
        var cum = 0L
        docs.sortBy(d => (h(d._1), d._1)).takeWhile { d =>
          val keep = cum < budget(src); cum += d._3; keep
        }.map(_._1)
    }.toSet
  }

  test("tokenBudgetSample: exclusive-sum gate, straddler kept, tiny budget keeps first doc") {
    val items = corpus(400)
    val b = budgets("src0" -> 300L, "src1" -> 1L, "src2" -> 100000L)
    val kept = Sampling.tokenBudgetSample(items, "doc_id", "n_tokens", "source", b)
    val rows = corpus(400).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val ref = referenceKept(rows, Map("src0" -> 300L, "src1" -> 1L, "src2" -> 100000L))
    val got = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === ref, "kept set must equal the single-window reference")
    val bySrc = kept.groupBy("source").agg(
        count(lit(1)).as("n"), sum(col("n_tokens")).as("t"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // budget 1 < any doc weight: exactly the first doc in hash order survives
    assert(bySrc("src1")._1 === 1L, "tiny budget keeps exactly the first doc")
    // the straddler is kept, so the total may EXCEED the budget by < one doc
    assert(bySrc("src0")._2 >= 300L && bySrc("src0")._2 < 300L + 17L,
      s"overshoot bounded by one document, got ${bySrc("src0")._2}")
    // a budget beyond the stratum total keeps everything
    assert(bySrc("src2")._1 === 100L, "huge budget keeps the whole stratum")
    assert(!bySrc.contains("src3"), "stratum without a budget is dropped")
  }

  test("tokenBudgetSample: two-level shard sums equal one global per-stratum window") {
    import org.apache.spark.sql.expressions.Window
    val items = corpus(1000)
    val b = budgets("src0" -> 700L, "src1" -> 1300L, "src2" -> 40L, "src3" -> 900L)
    val got = Sampling.tokenBudgetSample(items, "doc_id", "n_tokens", "source", b)
      .select("doc_id", "cum_before").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = Window.partitionBy(col("source"))
      .orderBy(Sampling.idHash(col("doc_id")), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ref = items.withColumn("_c", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .join(broadcast(b), Seq("source")).filter(col("_c") < col("budget"))
      .select("doc_id", "_c").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === ref, "two-level decomposition must equal the global window")
  }

  test("leakageSafeSplit: identical texts share a split, shares near target, stable under growth") {
    import spark.implicits._
    val texts = (0 until 800).map(i => s"document body number $i with some words")
    // every text twice under DIFFERENT ids — an id-hash split would
    // leak ~2*p*(1-p) of the pairs across the boundary
    val df = (texts ++ texts).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = Sampling.leakageSafeSplit(df, "text")
      .select("text", "split").collect()
      .map(r => r.getString(0) -> r.getString(1))
    val perText = got.groupBy(_._1).values
    assert(perText.forall(_.map(_._2).distinct.size == 1),
      "byte-identical documents must never straddle a split")
    val shares = got.groupBy(_._2).view.mapValues(_.size).toMap
    assert(shares("train") > 1200 && shares("train") < 1400,
      s"train share far from 80%: $shares")
    assert(shares("val") > 100 && shares("val") < 300, s"val share: $shares")
    assert(shares("test") > 100 && shares("test") < 300, s"test share: $shares")
    // growth stability: adding documents never moves an old one
    val grown = Sampling.leakageSafeSplit(
        df.unionByName(Seq((99999L, "a brand new document")).toDF("doc_id", "text")),
        "text")
      .filter(col("doc_id") < 1600L).select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val base = Sampling.leakageSafeSplit(df, "text")
      .select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(grown === base)
    intercept[IllegalArgumentException] {
      Sampling.leakageSafeSplit(df, "text", trainPermille = 950, valPermille = 100)
    }
  }

  test("splitByKey on cluster ids: NEAR-duplicates co-locate where a text split separates them") {
    import spark.implicits._
    // a and b are near-duplicates (one word differs), c is unrelated
    val a = "the quick brown fox jumps over the lazy dog and keeps running onward today"
    val b = "the quick brown fox jumps over the lazy cat and keeps running onward today"
    val c = (1 to 14).map(i => s"zq$i").mkString(" ")
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val textSplit = Sampling.leakageSafeSplit(df, "text")
      .select("doc_id", "bucket").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(textSplit(1L) !== textSplit(2L),
      "fixture sanity: the near-dup pair hashes to different text buckets " +
        "(so a content-hash split WOULD separate them)")
    val clusters = graft.dedup.Dedup.nearDupClusters(df, "doc_id", "text")
    val got = Sampling.splitByKey(clusters, "cluster_id")
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === got(2L),
      "near-duplicates share a cluster, hence a split — the paraphrase-leak guard")
  }

  test("tokenBudgetSample: no single-reducer stratum — windows are hash-sharded") {
    val plan = Sampling.tokenBudgetSample(corpus(100), "doc_id", "n_tokens",
        "source", budgets("src0" -> 10L, "src1" -> 10L, "src2" -> 10L, "src3" -> 10L))
      .queryExecution.executedPlan.toString
    // the corpus-sized window must partition by (source, _hs), never by
    // source alone; the offsets/budgets frames broadcast
    assert(plan.contains("_hs"), s"running sum must be hash-sharded:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"offsets and budgets must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"keyed joins only:\n$plan")
  }
}
