package graft

import org.apache.spark.sql.functions._

import graft.algorithms.Als

class AlsSpec extends SparkSpec {

  private def ratings(rows: (Long, Long, Long)*) = {
    import spark.implicits._
    rows.toDF("user", "item", "rating")
  }

  test("rank-1 exact: hand-derived integer factors after one alternation") {
    // users {1,2}, items {10,11}; y0 = 10000:
    //   u1 = 10000*(2+1)*10000 / (10000+10000+10000)       = 10000
    //   u2 = 10000*1*10000     / (10000+10000)              = 5000
    //   y10 = 10000*(2*10000+5000) / (10000+10000+2500)     = 11111
    //   y11 = 10000*10000          / (10000+10000)          = 5000
    val got = Als.fitRank1Exact(
      ratings((1L, 10L, 2L), (1L, 11L, 1L), (2L, 10L, 1L)), iterations = 1)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === Map(
      (1L, "user") -> 10000L, (2L, "user") -> 5000L,
      (10L, "item") -> 11111L, (11L, "item") -> 5000L))
  }

  test("bias baseline: hand-derived integers, truncating division on negatives") {
    // mu = 10000*(5+1)/2 = 30000; round 1: b_u1 = 20000 div 6 = 3333,
    // b_u2 = -20000 div 6 = -3333 (TRUNCATION — floor would be -3334,
    // which is the exact cross-engine hazard this golden pins),
    // b_i10 = (16667 - 16667) div 7 = 0; round 2 repeats identically
    val got = Als.biasBaselineExact(
      ratings((1L, 10L, 5L), (2L, 10L, 1L)), rounds = 2)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === Map(
      (1L, "user") -> 3333L, (2L, "user") -> -3333L,
      (10L, "item") -> 0L, (-1L, "global") -> 30000L))
  }

  test("rank-1 exact: deterministic across runs (pure function of input)") {
    val rs = ratings((1 to 40).map(i =>
      (i.toLong % 7, 100L + i % 5, 1L + i % 3): (Long, Long, Long)): _*)
    val a = rowSet(Als.fitRank1Exact(rs, iterations = 3))
    val b = rowSet(Als.fitRank1Exact(rs, iterations = 3))
    assert(a === b && a.nonEmpty)
  }

  test("rank-k blocked ALS: recovers a low-rank matrix, error shrinks with iterations") {
    // ground truth: 12 users x 10 items from rank-2 factors, ratings =
    // exact dot products — ALS at k=2 must drive MSE near zero, and more
    // iterations must never hurt. Float iteration is why this face is
    // spec-verified, not oracle-verified: there is no bit-exact SQL twin
    // of a Cholesky solve, so the meaningful cross-check is
    // reconstruction quality + within-engine determinism.
    import spark.implicits._
    val truth = for (u <- 0L until 12L; i <- 0L until 10L) yield {
      val uu = (1.0 + u % 3, 0.5 + (u % 4) * 0.5)
      val ii = (0.5 + i % 2, 1.0 + (i % 3) * 0.25)
      (u, i, uu._1 * ii._1 + uu._2 * ii._2)
    }
    val df = truth.toDF("user", "item", "rating")
    val (u1, i1) = Als.fit(df, k = 2, iterations = 1, lambda = 0.01)
    val (u5, i5) = Als.fit(df, k = 2, iterations = 8, lambda = 0.01)
    val e1 = Als.mse(df, u1, i1)
    val e5 = Als.mse(df, u5, i5)
    assert(e5 <= e1 + 1e-9, s"error must not grow: $e1 -> $e5")
    assert(e5 < 0.01, s"rank-2 truth should be recovered, mse = $e5")
    // run-to-run stability: the moment aggregator accumulates along the
    // partial-aggregation merge tree, so equality is up to float
    // summation order — tolerance, not bitwise (the bit-exact faces are
    // the scaled-integer ones)
    val (u5b, _) = Als.fit(df, k = 2, iterations = 8, lambda = 0.01)
    val va = u5.collect().map(f => f.id -> f.vec.toSeq).toMap
    val vb = u5b.collect().map(f => f.id -> f.vec.toSeq).toMap
    assert(va.keySet === vb.keySet)
    va.foreach { case (id, v) =>
      v.zip(vb(id)).foreach { case (x, y) =>
        assert(math.abs(x - y) <= 1e-9 * math.max(1.0, math.abs(x)),
          s"factor drift beyond float-order tolerance at user $id")
      }
    }
  }

  test("svdppExact: equals the manual composition of its sub-models, beats bias-only") {
    import spark.implicits._
    // multiplicative (u x i) interaction structure that additive biases
    // cannot express — the factor+implicit terms must pick it up
    val rows = for (u <- 0L until 12L; i <- 0L until 10L)
      yield (u, 1000L + i, 1L + (u % 3) * (i % 4))
    val df = rows.toDF("user", "item", "rating")
    val S = 10000L
    val pred = Als.svdppExact(df).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap

    // manual composition from the two published sub-models (Scala Long
    // division truncates toward zero, same as Spark `div`): factors are
    // trained on the S-scaled bias residuals, the SVD++ structure
    val b = Als.biasBaselineExact(df).collect()
      .map(r => (r.getString(1), r.getLong(0)) -> r.getLong(2)).toMap
    val mu = b(("global", -1L))
    val residDf = rows.map { case (u, i, r) =>
      (u, i, (S * r - mu - b(("user", u)) - b(("item", i))) / 100L)
    }.toDF("user", "item", "rating")
    val f = Als.fitRank1Exact(residDf).collect()
      .map(r => (r.getString(1), r.getLong(0)) -> r.getLong(2)).toMap
    val byUser = rows.groupBy(_._1)
    var sseSvdpp = BigInt(0)
    var sseBias = BigInt(0)
    rows.foreach { case (u, i, r) =>
      val items = byUser(u).map(_._2)
      val imp = items.map(j => f(("item", j))).sum / items.size
      val expect = mu + b(("user", u)) + b(("item", i)) +
        (((f(("user", u)) + imp) * f(("item", i))) / S) * 100L / S
      assert(pred((u, i)) === ((r, expect)), s"prediction mismatch at ($u,$i)")
      val eS = S * r - expect
      val eB = S * r - (mu + b(("user", u)) + b(("item", i)))
      sseSvdpp += BigInt(eS) * BigInt(eS)
      sseBias += BigInt(eB) * BigInt(eB)
    }
    assert(sseSvdpp < sseBias,
      s"SVD++ must beat the bias baseline on interaction structure: $sseSvdpp vs $sseBias")
  }

  test("rank-k fit: a hub item rated by every user solves from fixed-size moments") {
    import spark.implicits._
    // item 0 is rated by ALL users — the degree-skew shape that used to
    // materialize the whole rating list on one task heap; the moment
    // aggregator keeps per-group state at k(k+3)/2+1 doubles whatever
    // the degree, and the solve must still recover the planted rank-2
    // structure including the hub column
    val truth = for (u <- 0L until 200L; i <- Seq(0L, 1L + u % 3, 4L + u % 2)) yield {
      val uu = (1.0 + u % 3, 0.5 + (u % 4) * 0.5)
      val ii = (0.5 + i % 2, 1.0 + (i % 3) * 0.25)
      (u, i, uu._1 * ii._1 + uu._2 * ii._2)
    }
    val df = truth.toDF("user", "item", "rating")
    val (u, i) = Als.fit(df, k = 2, iterations = 8, lambda = 0.01)
    val e = Als.mse(df, u, i)
    assert(e < 0.01, s"rank-2 truth with a full-degree hub item, mse = $e")
    val hub = i.collect().find(_.id == 0L).get
    assert(hub.vec.forall(x => !x.isNaN && !x.isInfinite))
  }
}
