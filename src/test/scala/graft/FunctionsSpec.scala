package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.functions.{QuantizedDot, RhpBuckets, SimHash64}
import graft.similarity.Ann
import graft.text.TextFunctions

/** Native codegen'd expressions vs their interpreted SQL-lambda twins, and
  * the `graft.GraftExtensions` SQL registration.
  */
class FunctionsSpec extends SparkSpec {

  private def vecDf() = {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    (0 until 50).map { i =>
      (i.toLong,
        Array.fill(64)((rnd.nextGaussian() * 0.4).toFloat).toSeq,
        Array.fill(64)((rnd.nextGaussian() * 0.4).toFloat).toSeq)
    }.toDF("id", "a", "b")
  }

  test("QuantizedDot matches the zip_with/aggregate lambda form incl. negatives") {
    val lambda = aggregate(
      zip_with(col("a"), col("b"), (x, y) =>
        // half-away-from-zero rounding, the C/DuckDB round()
        when(x.cast("double") * 1000 >= 0, floor(x.cast("double") * 1000 + 0.5d))
          .otherwise(ceil(x.cast("double") * 1000 - 0.5d)).cast("long") *
          when(y.cast("double") * 1000 >= 0, floor(y.cast("double") * 1000 + 0.5d))
            .otherwise(ceil(y.cast("double") * 1000 - 0.5d)).cast("long")),
      lit(0L), (acc, x) => acc + x)
    val diff = vecDf()
      .select((Ann.quantizedDot(col("a"), col("b")) - lambda).as("d"))
      .filter(col("d") =!= 0L)
    assert(diff.isEmpty)
  }

  test("QuantizedDot/RhpBuckets: malformed vectors are NULL, not truncated") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0f, 2.0f), Seq(1.0f, 2.0f, 3.0f)),   // length mismatch
      (2L, Seq(1.0f, 2.0f), Seq(3.0f, 4.0f)))          // well-formed
      .toDF("id", "a", "b")
    val dots = df.select(col("id"), Ann.quantizedDot(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(dots(1L) === None, "length mismatch must be null")
    assert(dots(2L) === Some(1000L * 3000 + 2000L * 4000))

    // null elements (schema containsNull=true): both expressions null out
    val withNulls = spark.sql(
      "SELECT array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)) AS v, " +
        "array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)) AS w")
    val r = withNulls.select(
      Ann.quantizedDot(col("v"), col("w")).as("d"),
      RhpBuckets(col("v"), 16, 4).as("bk"),
      RhpBuckets(col("w"), 16, 4).as("ok")).head()
    assert(r.isNullAt(0), "null element dot must be null")
    assert(r.isNullAt(1), "null element buckets must be null")
    assert(!r.isNullAt(2), "clean vector still buckets")
  }

  test("SimHash64 matches the SQL-lambda simhashExpr") {
    import spark.implicits._
    val df = Seq(
      "alpha beta gamma delta epsilon zeta",
      "the quick brown fox jumps over the lazy dog",
      "one",
      "repeat repeat repeat distinct")
      .toDF("text")
      .select(TextFunctions.tokens(col("text")).as("toks"))
    val diff = df
      .select((SimHash64(col("toks")) === Dedup.simhashExpr("toks")).as("eq"))
      .filter(!col("eq"))
    assert(diff.isEmpty)
  }

  test("SimHashSha64: single-token signature IS the sha256 8-byte prefix") {
    import spark.implicits._
    // one token -> every bit's vote comes from that token alone, so the
    // signature equals the hash itself: the big-endian long spelled by the
    // first 16 hex chars of sha2(token, 256)
    val r = Seq("alpha").toDF("t")
      .select(
        graft.functions.SimHashSha64(array(col("t"))).as("sig"),
        substring(sha2(col("t"), 256), 1, 16).as("hex"))
      .head()
    val expected = java.lang.Long.parseUnsignedLong(r.getString(1), 16)
    assert(r.getLong(0) === expected)
  }

  test("SimHashSha64: multiset votes differ from set votes") {
    import spark.implicits._
    val sig = (toks: Seq[String]) =>
      Seq(toks).toDF("toks")
        .select(graft.functions.SimHashSha64(col("toks"))).head().getLong(0)
    // duplicated token dominates the vote; order never matters
    assert(sig(Seq("a", "a", "a", "b")) === sig(Seq("a", "b", "a", "a")))
    assert(sig(Seq("a", "a", "a", "b")) !== sig(Seq("b", "b", "b", "a")))
  }

  test("winnowPortable fingerprints are sha256 prefixes of real shingles") {
    import spark.implicits._
    val text = "w1 w2 w3 w4 w5 w6 w7 w8"
    val fps = Seq(text).toDF("text")
      .select(TextFunctions.winnowPortable(
        TextFunctions.tokens(col("text")), 3, 4).as("fp"))
      .head().getAs[scala.collection.Seq[String]](0)
    assert(fps.nonEmpty && fps == fps.sorted && fps.distinct.size == fps.size)
    val shingleHexes = (1 to 6).map { i =>
      val sh = s"w$i w${i + 1} w${i + 2}"
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(sh.getBytes("UTF-8"))
        .take(8).map(b => f"$b%02x").mkString
    }.toSet
    fps.foreach(fp => assert(shingleHexes.contains(fp), s"$fp not a shingle hash"))
    // fewer shingles than the window -> the single global min
    val one = Seq("a b c d").toDF("text")
      .select(TextFunctions.winnowPortable(
        TextFunctions.tokens(col("text")), 3, 4).as("fp"))
      .head().getAs[scala.collection.Seq[String]](0)
    assert(one.size === 1)
  }

  test("RhpBuckets: shape, table-disjoint key ranges, determinism") {
    val bits = 6
    val tables = 8
    val rows = vecDf()
      .select(col("id"), RhpBuckets(col("a"), bits, tables).as("bk"))
      .collect()
    rows.foreach { r =>
      val bk = r.getAs[scala.collection.Seq[Long]](1)
      assert(bk.length === tables)
      bk.zipWithIndex.foreach { case (v, t) =>
        assert(v >> bits === t.toLong, s"bucket $v not in table $t's key range")
      }
    }
    // deterministic across evaluations
    val again = vecDf()
      .select(col("id"), RhpBuckets(col("a"), bits, tables).as("bk"))
      .collect()
    assert(rows.map(_.toSeq.toList).toSeq === again.map(_.toSeq.toList).toSeq)
  }

  test("GraftExtensions registers SQL functions") {
    import spark.implicits._
    vecDf().createOrReplaceTempView("vecs")
    val viaSql = spark.sql(
      "SELECT id, graft_quantized_dot(a, b) AS qd FROM vecs ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val viaCol = vecDf()
      .select(col("id"), Ann.quantizedDot(col("a"), col("b")).as("qd"))
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaSql.toSeq === viaCol.toSeq)

    val sh = spark.sql(
      "SELECT graft_simhash64(array('alpha', 'beta')) AS h").head().getLong(0)
    val shCol = Seq(Seq("alpha", "beta")).toDF("toks")
      .select(SimHash64(col("toks"))).head().getLong(0)
    assert(sh === shCol)

    val bk = spark.sql(
      "SELECT graft_rhp_buckets(array(CAST(0.5 AS FLOAT)), 4, 2) AS bk")
      .head().getAs[scala.collection.Seq[Long]](0)
    assert(bk.length === 2)

    val mh = spark.sql(
      "SELECT graft_minhash_sig(array('alpha', 'beta'), 8) AS s")
      .head().getAs[scala.collection.Seq[Long]](0)
    assert(mh.length === 8)
  }

  test("MinHashSig: set semantics, element-wise min, string/long inputs") {
    import graft.functions.MinHashSig
    import spark.implicits._
    val df = Seq(
      (1L, Seq("a", "b", "c")),
      (2L, Seq("c", "b", "a")),   // order-insensitive
      (3L, Seq("a")),
      (4L, Seq("b", "c")))
      .toDF("id", "sh")
      .select(col("id"), MinHashSig(col("sh"), 16).as("sig"))
    val sigs = df.collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Long]](1)).toMap
    assert(sigs(1L) === sigs(2L), "signature must not depend on item order")
    assert(sigs.values.forall(_.length === 16))
    // union property: sig({a,b,c}) = elementwise-min(sig({a}), sig({b,c}))
    val merged = sigs(3L).zip(sigs(4L)).map { case (x, y) => math.min(x, y) }
    assert(sigs(1L) === merged)

    // long arrays (adjacency sets) hash on the long value, not its bits-as-string
    val viaLong = Seq((1L, Seq(7L, 9L))).toDF("id", "sh")
      .select(MinHashSig(col("sh"), 4)).head().getAs[scala.collection.Seq[Long]](0)
    assert(viaLong.length === 4)

    // pair at Jaccard 1 collides on every hash; disjoint sets on ~none
    val a = Seq((1L, (0 until 30).map(i => s"t$i"))).toDF("id", "sh")
      .select(MinHashSig(col("sh"), 64)).head().getAs[scala.collection.Seq[Long]](0)
    val b = Seq((1L, (30 until 60).map(i => s"t$i"))).toDF("id", "sh")
      .select(MinHashSig(col("sh"), 64)).head().getAs[scala.collection.Seq[Long]](0)
    assert(a.zip(b).count { case (x, y) => x == y } <= 2,
      "disjoint sets should agree on (almost) no signature slots")
  }

  test("Gopher quality signals: mean length, repetition cap, keep decision") {
    import spark.implicits._
    import TextFunctions._
    val docs = Seq(
      // 30 distinct-ish words, mean len in band, stopwords present -> keep
      (1L, (("the of " * 1) + (0 until 28).map(i => s"word$i").mkString(" "))),
      // heavy repetition: one token is half the doc -> top_word_frac kills it
      (2L, ("spam " * 15) + "the of " + (0 until 13).map(i => s"w$i").mkString(" ")),
      // too short
      (3L, "the of tiny doc"),
      // no stopword evidence
      (4L, (0 until 40).map(i => s"zz$i").mkString(" ")),
      (5L, "")).toDF("doc_id", "text")
    val out = docs.select(
        col("doc_id"),
        tokenCount(col("text")).as("n"),
        meanWordLen(col("text")).as("ml"),
        stopwordCount(col("text"), DefaultStopwords).as("sh"),
        topTokenFrac(col("text")).as("tf"))
      .withColumn("keep", gopherKeep(col("n"), col("ml"), col("sh"), col("tf")))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getDouble(2), r.getInt(3), r.getDouble(4), r.getBoolean(5)))
      .toMap
    assert(out(1L)._5, "well-formed doc must be kept")
    assert(!out(2L)._5 && out(2L)._4 > 0.2, "repetition cap must drop doc 2")
    assert(!out(3L)._5, "short doc must be dropped")
    assert(!out(4L)._5 && out(4L)._3 === 0, "stopword-free doc must be dropped")
    assert(!out(5L)._5 && out(5L)._1 === 0 && out(5L)._4 === 0.0,
      "empty doc: zero signals, dropped, no divide-by-zero")
    // mean length is the exact rounded ratio
    assert(out(3L)._2 === math.rint(("theoftinydoc".length / 4.0) * 1e6) / 1e6)
  }

  /** The replace-chain BPE semantics as plain Java string ops — an
    * independent model of the bpeSegmented contract (String.replace is
    * literal, leftmost, non-overlapping, same as Spark's replace), used
    * to pin the native BpeCount expression at table sizes the plan-bound
    * replace chain cannot reach. */
  private def replaceChainCount(
      text: String, merges: Seq[(String, String)]): Int = {
    val S = "\u0001"; val W = "\u0002"
    val init = text.split(" ").filter(_.nonEmpty)
      .map(w => W + w.map(c => S + c + S).mkString).mkString
    val done = merges.foldLeft(init) { case (acc, (a, b)) =>
      acc.replace(S + a + S + S + b + S, S + a + b + S)
    }
    (done.length - done.replace(S, "").length) / 2
  }

  test("BpeCount native expression equals the replace chain on the 40-merge table") {
    import spark.implicits._
    // the TextDedupSpec golden fixtures plus adversarial shapes: empty,
    // runs of spaces, self-merge overlap, unicode outside the vocab
    val texts = Seq(
      "the", "that", "with", "standing", "zebra", "th e", "", "the that",
      "math", "here", "eee", "   ", "a  b   c", "th\u00e9 caf\u00e9 \u4e16\u754c",
      "the quick brown fox jumps over the lazy dog again and again",
      "this is another other thing that the for with us")
    // plus 200 deterministic pseudo-random strings over the vocab alphabet
    val rnd = new scala.util.Random(7)
    val alpha = "abcdefghilmnoprstuwz "
    val fuzz = (0 until 200).map(_ =>
      (0 until (5 + rnd.nextInt(60))).map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
    val df = (texts ++ fuzz).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val bad = df.select(
        col("id"),
        TextFunctions.bpeTokenCount(col("text")).as("chain"),
        TextFunctions.bpeTokenCountExact(col("text")).as("native"))
      .filter(col("chain") =!= col("native"))
    assert(bad.isEmpty, s"native/chain mismatch: ${bad.collect().mkString(", ")}")
    // nulls propagate
    val n = spark.sql("SELECT CAST(NULL AS STRING) AS text")
      .select(TextFunctions.bpeTokenCountExact(col("text")).as("c")).head()
    assert(n.isNullAt(0))
  }

  /** Token-list model from the replace-chain working string: non-empty
    * chr(1)-splits are symbols with chr(2) word markers interleaved; a
    * symbol directly after a marker (beyond the first) takes a leading
    * space — the BpeSegment convention. */
  private def replaceChainTokens(
      text: String, merges: Seq[(String, String)]): Seq[String] = {
    val S = "\u0001"; val W = "\u0002"
    val init = text.split(" ").filter(_.nonEmpty)
      .map(w => W + w.map(c => S + c + S).mkString).mkString
    val done = merges.foldLeft(init) { case (acc, (a, b)) =>
      acc.replace(S + a + S + S + b + S, S + a + b + S)
    }
    val parts = done.split(S.head).filter(_.nonEmpty)
    parts.zipWithIndex.collect {
      case (p, i) if p != W =>
        if (i > 1 && parts(i - 1) == W) " " + p else p
    }.toSeq
  }

  test("BpeSegment native tokens equal the chain model; concat rebuilds the text") {
    import spark.implicits._
    val texts = Seq(
      "the", "that", "with math here", "", "a  b   c", "eee",
      "the quick brown fox jumps over the lazy dog again and again",
      "this is another other thing that the for with us")
    val rnd = new scala.util.Random(23)
    val alpha = "abcdefghilmnoprstuwz "
    val fuzz = (0 until 120).map(_ =>
      (0 until (5 + rnd.nextInt(50))).map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
    val all = texts ++ fuzz
    val got = all.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"),
        graft.functions.BpeSegment(col("text"), TextFunctions.BpeMerges).as("toks"),
        TextFunctions.bpeTokenCountExact(col("text")).as("n"))
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[scala.collection.Seq[String]](1).toSeq, r.getInt(2)))).toMap
    all.zipWithIndex.foreach { case (t, i) =>
      val (toks, n) = got(i.toLong)
      assert(toks === replaceChainTokens(t, TextFunctions.BpeMerges),
        s"token mismatch for '${t.take(40)}'")
      assert(toks.size === n, "segment length must equal the count expression")
      // the leading-space convention makes concat the normalized text
      assert(toks.mkString === t.split(" ").filter(_.nonEmpty).mkString(" "))
    }
  }

  test("BpeSegment applies a generated 1k-merge table, equal to the chain model") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val pool = scala.collection.mutable.ArrayBuffer[String]("abcdefghij".map(_.toString): _*)
    val merges = (0 until 1000).map { _ =>
      val a = pool(rnd.nextInt(pool.length))
      val b = pool(rnd.nextInt(pool.length))
      pool += (a + b)
      (a, b)
    }
    val texts = (0 until 100).map(_ =>
      (0 until (3 + rnd.nextInt(40))).map(_ => "abcdefghij "(rnd.nextInt(11))).mkString)
    val got = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"),
        graft.functions.BpeSegment(col("text"), merges).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[String]](1).toSeq).toMap
    texts.indices.foreach { i =>
      assert(got(i.toLong) === replaceChainTokens(texts(i), merges),
        s"mismatch at $i")
    }
  }

  test("BpeCount applies a generated 1k-merge table, equal to the chain model") {
    import spark.implicits._
    // deterministic 1000-rule table honouring the BPE invariant (each
    // rule's operands exist when it fires): operands are drawn from the
    // growing symbol pool, starting at the single letters
    val rnd = new scala.util.Random(13)
    val pool = scala.collection.mutable.ArrayBuffer[String]("abcdefghij".map(_.toString): _*)
    val merges = (0 until 1000).map { _ =>
      val a = pool(rnd.nextInt(pool.length))
      val b = pool(rnd.nextInt(pool.length))
      pool += (a + b)
      (a, b)
    }
    val texts = (0 until 150).map(_ =>
      (0 until (3 + rnd.nextInt(40))).map(_ => "abcdefghij "(rnd.nextInt(11))).mkString)
    val expected = texts.map(t => replaceChainCount(t, merges))
    val got = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), TextFunctions.bpeTokenCountExact(col("text"), merges).as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    texts.indices.foreach { i =>
      assert(got(i.toLong) === expected(i),
        s"mismatch at $i: '${texts(i).take(60)}'")
    }
  }

  test("BpeTrainer: the Sennrich walkthrough — ranked merges, ties, exhaustion") {
    import spark.implicits._
    import graft.text.BpeTrainer
    // the paper's own example shape: low*3, lower, lowest
    //   r1: (l,o) 5 beats (o,w) 5 on the lexicographic tie
    //   r2: (lo,w) 5;  r3: (low,e) 2
    //   r4: cnt-1 three-way tie -> (lowe,r) by (a, b) order
    //   r5: (lowe,s); r6: (lowes,t); r7+: vocabulary exhausted
    val docs = Seq((1L, "low low low lower lowest")).toDF("doc_id", "text")
    val got = BpeTrainer.learnMerges(docs, "text", numMerges = 8)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.toSeq === Seq(
      (1, "l", "o", 5L), (2, "lo", "w", 5L), (3, "low", "e", 2L),
      (4, "lowe", "r", 1L), (5, "lowe", "s", 1L), (6, "lowes", "t", 1L)),
      "exhausted rounds emit nothing; ranks stay dense")
  }

  test("BpeTrainer: overlapping positions count, merging is leftmost non-overlapping") {
    import spark.implicits._
    import graft.text.BpeTrainer
    // "aaaa": (a,a) counts 3 adjacent POSITIONS (Sennrich's get_stats),
    // but one merge pass produces aa|aa — so round 2 sees (aa,aa) once
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val got = BpeTrainer.learnMerges(docs, "text", numMerges = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.toSeq === Seq((1, "a", "a", 3L), (2, "aa", "aa", 1L)))
  }

  test("BpeTrainer: the learned table drives the native BpeCount directly") {
    import spark.implicits._
    import graft.text.BpeTrainer
    val docs = Seq((1L, "low low low lower lowest")).toDF("doc_id", "text")
    val learned = BpeTrainer.learnMerges(docs, "text", numMerges = 8)
      .collect().sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2))).toSeq
    // after the 6 learned merges each training word is ONE token; an
    // out-of-vocabulary word still splits to characters
    val counts = Seq((1L, "low lower lowest zz"))
      .toDF("id", "text")
      .select(TextFunctions.bpeTokenCountExact(col("text"), learned).as("c"))
      .head().getInt(0)
    assert(counts === 1 + 1 + 1 + 2)
  }
}
