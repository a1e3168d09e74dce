package graft

import org.apache.spark.sql.functions._

import graft.relational.Cooccurrence

class CooccurrenceSpec extends SparkSpec {

  private def log(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("user_id", "item")
  }

  test("hand-derived lift: popular pairs do not outrank genuinely correlated ones") {
    // u1: A,B  u2: A,B  u3: A,C  — N=3, n_A=3, n_B=2, n_C=1
    //   (A,B): n_ab=2, lift = 2*3/(3*2) = 1.000
    //   (A,C): n_ab=1, lift = 1*3/(3*1) = 1.000  (same lift, less support)
    // duplicates in the log must not double-count (distinct collapse)
    val rows = log(
      1L -> "A", 1L -> "B", 1L -> "A",
      2L -> "A", 2L -> "B",
      3L -> "A", 3L -> "C")
    val got = Cooccurrence.itemPairs(rows, "user_id", "item")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got(("A", "B")) === ((2L, 3L, 2L, 1000L)))
    assert(got(("A", "C")) === ((1L, 3L, 1L, 1000L)))
    assert(got.keySet === Set(("A", "B"), ("A", "C")),
      "B,C never co-occur — no row")
    // perfectly-correlated niche pair beats a popularity-driven count:
    // D,E only ever appear together (2 of 6 users) -> lift 3.0
    val rows2 = log(
      1L -> "A", 1L -> "B", 2L -> "A", 2L -> "B", 3L -> "A", 3L -> "B",
      4L -> "A", 4L -> "B", 5L -> "D", 5L -> "E", 6L -> "D", 6L -> "E")
    val got2 = Cooccurrence.itemPairs(rows2, "user_id", "item")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(5)).toMap
    assert(got2(("D", "E")) === 3000L, "2*6/(2*2) = 3.0")
    assert(got2(("A", "B")) === 1500L, "4*6/(4*4) = 1.5")
  }

  test("hot-actor cap drops the bot whole; N and counts describe survivors") {
    // a bot touching 5 items would mint 10 pairs of pure noise; cap 4
    // removes it entirely, and N/n_i shrink with it
    val rows = log(
      1L -> "A", 1L -> "B",
      2L -> "A", 2L -> "B",
      9L -> "A", 9L -> "B", 9L -> "C", 9L -> "D", 9L -> "E")
    val got = Cooccurrence.itemPairs(rows, "user_id", "item",
        maxActorItems = 4)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(5)))).toMap
    // N=2 survivors: (A,B) n_ab=2, n_a=2 -> lift 2*2/(2*2)=1.0
    assert(got === Map(("A", "B") -> ((2L, 2L, 1000L))),
      s"bot pairs must vanish and counts re-base, got $got")
    // minSupport prunes the singleton-evidence tail
    val pruned = Cooccurrence.itemPairs(rows, "user_id", "item",
        minSupport = 2L, maxActorItems = 0)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pruned === Set(("A", "B")), "cap off: bot pairs exist but fail support")
  }
}
