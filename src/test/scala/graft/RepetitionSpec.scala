package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.text.Repetition

/** Hand-computed fixtures for the Gopher repetition rules. */
class RepetitionSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("lineStats: duplicate lines counted with all occurrences; blank lines are not lines") {
    val d = docs(
      1L -> "a\nb\na\n\n   \nc",   // lines a,b,a,c -> 'a' duplicated
      2L -> "one\ntwo\nthree",      // all unique
      3L -> "x\nx\nx")              // one line, three copies
    val out = Repetition.lineStats(d, "doc_id", "text")
      .orderBy("id").collect().toSeq
    assert(out === Seq(
      Row(1L, 4L, 0.5, 0.5, 0.0, 0.0), // 2/4 lines dup; chars 2/4 (a=1ch ×2 of a,b,a,c)
      Row(2L, 3L, 0.0, 0.0, 0.0, 0.0),
      Row(3L, 3L, 1.0, 1.0, 0.0, 0.0)))
  }

  test("lineStats: ellipsis/bullet fractions; blank-only documents keep their row") {
    val d = docs(
      // 4 lines: 1 ellipsis-ended (unicode), 1 ellipsis-ended (ascii, trailing ws),
      // 2 bullets (glyph + "- " dash)
      1L -> "read more…\n• first item\n- second item\nthis trails off...  ",
      // dashes WITHOUT the following space are prose, not bullets;
      // mid-line ellipsis is not line-ending
      2L -> "-notabullet\nwait... what\n*emphasis* stays",
      3L -> "   \n\n  ")            // blank-only: no non-blank line at all
    val out = Repetition.lineStats(d, "doc_id", "text")
      .orderBy("id").collect().toSeq
    assert(out === Seq(
      Row(1L, 4L, 0.0, 0.0, 0.5, 0.5),
      Row(2L, 3L, 0.0, 0.0, 0.0, 0.0),
      Row(3L, 0L, 0.0, 0.0, 0.0, 0.0))) // left-joined back, never dropped (ADVICE r16)
  }

  test("topNgramCharFraction: most frequent 2-gram's occurrence chars over token chars") {
    val d = docs(
      1L -> "x y x y z",            // top "x y" ×2, 3 chars -> 6/9
      2L -> "all words unique here",
      3L -> "solo")                 // shorter than n -> 0.0
    val out = Repetition.topNgramCharFraction(d, "doc_id", "text", 2)
      .orderBy("id").collect().toSeq
    assert(out(0) === Row(1L, 0.666667))
    // every 2-gram unique: top has c=1 -> its chars over total, here
    // "words unique" (12 chars incl space) / len("all words unique here")=21
    assert(out(1) === Row(2L, 0.571429))
    assert(out(2) === Row(3L, 0.0))
  }

  test("dupNgramCharFraction: overlapping duplicate grams cover positions ONCE") {
    val d = docs(
      1L -> "x y x y z",            // dup "x y" at pos 0,2 -> covered {0,1,2,3} of 5 unit tokens
      2L -> "a a a a",              // "a a" x3, overlap union = all 4 positions
      3L -> "p q r s",              // no dup grams
      4L -> "ab")                   // shorter than n
    val out = Repetition.dupNgramCharFraction(d, "doc_id", "text", 2)
      .orderBy("id").collect().toSeq
    assert(out === Seq(
      Row(1L, 0.8),
      Row(2L, 1.0),
      Row(3L, 0.0),
      Row(4L, 0.0)))
  }

  test("repetitionKeep: boilerplate-heavy page fails, prose passes") {
    import spark.implicits._
    val prose = (1 to 40).map(i => s"word$i").mkString(" ")
    val d = docs(
      1L -> s"subscribe now\n$prose\nsubscribe now\nsubscribe now",
      2L -> s"$prose\nmore unique text here")
    val ls = Repetition.lineStats(d, "doc_id", "text")
    val t2 = Repetition.topNgramCharFraction(d, "doc_id", "text", 2)
    val d5 = Repetition.dupNgramCharFraction(d, "doc_id", "text", 5)
    val keep = ls.join(t2, "id").join(d5, "id")
      .select(col("id"), Repetition.repetitionKeep(
        col("dup_line_frac"), col("dup_line_char_frac"),
        col("top_ngram_frac"), col("dup_ngram_frac")).as("keep"))
      .orderBy("id").collect().toSeq
    assert(keep === Seq(Row(1L, false), Row(2L, true)))
  }

  test("plan shape: keyed explode-and-count only — no window, no cartesian") {
    val d = docs(1L -> "a b a b c\nd e", 2L -> "f g h")
    for (df <- Seq(
        Repetition.lineStats(d, "doc_id", "text"),
        Repetition.topNgramCharFraction(d, "doc_id", "text", 2),
        Repetition.dupNgramCharFraction(d, "doc_id", "text", 2))) {
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"cartesian:\n$p")
      assert(!p.contains("Window"), s"corpus window:\n$p")
      assert(p.contains("partial_count") || p.contains("partial_sum"),
        s"aggregates must map-side combine:\n$p")
    }
  }
}
