package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher-style REPETITION quality rules (Rae et al. 2021, §A1.1) — the
  * line- and n-gram-level half of the quality story that
  * [[TextFunctions.gopherKeep]]'s word-level signals deliberately
  * omitted while the corpus contract was one-line documents. With
  * [[Html.extractMainText]] producing newline-joined block text, the
  * engine now has multi-line documents, and these are the standard
  * filters a pretraining pipeline runs on them:
  *
  *  - '''duplicate lines''': fraction of lines (and of line characters)
  *    occurring more than once WITHIN a document — boilerplate chrome
  *    (nav, cookie banners, "subscribe" calls) repeats verbatim;
  *  - '''top n-gram character fraction''': characters claimed by all
  *    occurrences of the single most frequent word n-gram, over the
  *    document's token characters — templated spam concentrates mass
  *    in one phrase;
  *  - '''duplicate n-gram coverage''': token characters lying inside
  *    ANY n-gram that occurs ≥2 times in the document, overlaps
  *    counted ONCE (a position union, not an occurrence sum) — the
  *    within-document cousin of the cross-corpus span dedup (d16/d27).
  *
  * Scale shape: everything is the d16 explode-and-count machinery —
  * per-(doc, line/gram) counts are map-side-combinable partial
  * aggregates keyed on the doc id; no window over the corpus, no
  * driver-side state. Fractions divide exact integer character counts
  * and round half-up to 6 decimals (the d02/topTokenFrac convention),
  * so the DuckDB oracle replays them bit for bit.
  */
object Repetition {

  /** Per-document line-level stats over newline-separated text:
    * `(id, n_lines, dup_line_frac, dup_line_char_frac,
    * ellipsis_line_frac, bullet_line_frac)`. Blank lines
    * (whitespace-only) are not lines. A line "occurs more than once"
    * contributes ALL its occurrences to the duplicate mass (the Gopher
    * counting); fractions are over non-blank lines / their characters.
    *
    * The ellipsis/bullet pair completes the Rae et al. A1.1 line rules
    * (VERDICT r16 item 4): a line "ends with an ellipsis" when its
    * trimmed form ends in `...` or `…`, and "starts with a bullet" when
    * the trimmed form starts with a bullet glyph (`•`, `‣`, `▪`) or a
    * `-`/`*` followed by a space — both as fractions of non-blank lines,
    * two more combinable sums in the same explode-and-count pass.
    *
    * Total over the input: a document whose text has NO non-blank line
    * still emits a row (`n_lines` 0, every fraction 0.0) via a left
    * join back to the doc ids, so downstream inner joins never silently
    * drop documents (ADVICE r16). */
  def lineStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val lines = docs.select(
      col(idCol).as("id"),
      explode(split(col(textCol), "\n")).as("line"))
      .filter(length(trim(col("line"))) > 0)
    val t = trim(col("line"))
    val perLine = lines.groupBy(col("id"), col("line"))
      .agg(count(lit(1)).as("c"))
      .select(col("id"), col("c"),
        (col("c") * length(col("line")).cast("long")).as("chars"),
        when(col("c") > 1L, col("c")).otherwise(lit(0L)).as("dup_c"),
        when(col("c") > 1L, col("c") * length(col("line")).cast("long"))
          .otherwise(lit(0L)).as("dup_chars"),
        when(t.endsWith("...") || t.endsWith("…"), col("c"))
          .otherwise(lit(0L)).as("ell_c"),
        when(t.startsWith("•") || t.startsWith("‣") ||
            t.startsWith("▪") || t.startsWith("- ") || t.startsWith("* "),
          col("c")).otherwise(lit(0L)).as("bul_c"))
    val stats = perLine.groupBy(col("id")).agg(
      sum(col("c")).as("n_lines"),
      round(sum(col("dup_c")).cast("double") / sum(col("c")), 6)
        .as("dup_line_frac"),
      round(sum(col("dup_chars")).cast("double") /
        greatest(sum(col("chars")), lit(1L)), 6).as("dup_line_char_frac"),
      round(sum(col("ell_c")).cast("double") / sum(col("c")), 6)
        .as("ellipsis_line_frac"),
      round(sum(col("bul_c")).cast("double") / sum(col("c")), 6)
        .as("bullet_line_frac"))
    docs.select(col(idCol).as("id")).join(stats, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        coalesce(col("dup_line_frac"), lit(0.0)).as("dup_line_frac"),
        coalesce(col("dup_line_char_frac"), lit(0.0)).as("dup_line_char_frac"),
        coalesce(col("ellipsis_line_frac"), lit(0.0)).as("ellipsis_line_frac"),
        coalesce(col("bullet_line_frac"), lit(0.0)).as("bullet_line_frac"))
  }

  /** Characters claimed by the most frequent word `n`-gram (count ×
    * gram length, all occurrences) over the document's total token-text
    * characters (`length(array_join(tokens, ' '))`). Ties on count
    * break to the longest gram, then lexicographically largest — a
    * total order, so both engines pick the same gram. Documents with
    * fewer than `n` tokens report 0.0. Output: `(id, top_ngram_frac)`.
    */
  def topNgramCharFraction(
      docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val toks = docs.select(
      col(idCol).as("id"),
      TextFunctions.tokens(col(textCol)).as("t"))
    val base = toks.select(
      col("id"), length(array_join(col("t"), " ")).cast("long").as("total_chars"))
    val grams = toks
      .select(col("id"), explode(TextFunctions.shingles(col("t"), n)).as("g"))
    val top = grams.groupBy(col("id"), col("g"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("id"))
      .agg(max(struct(col("c"), length(col("g")).cast("long").as("l"), col("g")))
        .as("top"))
      .select(col("id"),
        (col("top.c") * col("top.l")).as("top_chars"))
    base.join(top, Seq("id"), "left").select(
      col("id"),
      round(coalesce(col("top_chars"), lit(0L)).cast("double") /
        greatest(col("total_chars"), lit(1L)), 6).as("top_ngram_frac"))
  }

  /** Token characters lying inside any word `n`-gram occurring ≥2 times
    * in the document, counted ONCE per token position (overlapping
    * duplicate grams do not double-count — a position-set union), over
    * total token characters. Output: `(id, dup_ngram_frac)`.
    *
    * Shape: positional grams explode to `(id, pos, gram)`; duplicated
    * grams (per-doc count > 1) mark positions `[pos, pos+n)`; the
    * distinct covered positions join back to per-position token lengths.
    * Every join is keyed on the doc id (+ gram/position), every
    * aggregate combinable.
    */
  def dupNgramCharFraction(
      docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val toks = docs.select(
      col(idCol).as("id"),
      TextFunctions.tokens(col(textCol)).as("t"))
    val base = toks.select(
      col("id"),
      aggregate(col("t"), lit(0L), (acc, x) => acc + length(x).cast("long"))
        .as("token_chars"))
    // positional grams: pos is 0-based over tokens
    val occ = toks
      .select(col("id"), posexplode(TextFunctions.shingles(col("t"), n)))
      .toDF("id", "pos", "g")
    val dupGrams = occ.groupBy(col("id"), col("g"))
      .agg(count(lit(1)).as("c"))
      .filter(col("c") > 1L)
      .select(col("id"), col("g"))
    val covered = occ.join(dupGrams, Seq("id", "g"), "left_semi")
      .select(col("id"), explode(sequence(col("pos"), col("pos") + lit(n - 1))).as("p"))
      .distinct()
    val tokLens = toks
      .select(col("id"), posexplode(col("t"))).toDF("id", "p", "tok")
      .select(col("id"), col("p"), length(col("tok")).cast("long").as("len"))
    val coveredChars = covered.join(tokLens, Seq("id", "p"))
      .groupBy(col("id")).agg(sum(col("len")).as("dup_chars"))
    base.join(coveredChars, Seq("id"), "left").select(
      col("id"),
      round(coalesce(col("dup_chars"), lit(0L)).cast("double") /
        greatest(col("token_chars"), lit(1L)), 6).as("dup_ngram_frac"))
  }

  /** The Gopher repetition gate over the three signals (thresholds are
    * the paper's for dup-lines/top-2-gram/dup-5-gram; policy knobs). */
  def repetitionKeep(
      dupLineFrac: Column, dupLineCharFrac: Column,
      topNgramFrac: Column, dupNgramFrac: Column,
      maxDupLineFrac: Double = 0.30, maxDupLineCharFrac: Double = 0.20,
      maxTopNgramFrac: Double = 0.20, maxDupNgramFrac: Double = 0.15): Column =
    dupLineFrac <= maxDupLineFrac && dupLineCharFrac <= maxDupLineCharFrac &&
      topNgramFrac <= maxTopNgramFrac && dupNgramFrac <= maxDupNgramFrac

  /** The FULL Rae et al. A1.1 line+n-gram gate: [[repetitionKeep]] plus
    * the ellipsis-line and bullet-line caps (paper thresholds 0.30 and
    * 0.90) — use with the two extra [[lineStats]] columns. */
  def repetitionKeepFull(
      dupLineFrac: Column, dupLineCharFrac: Column,
      topNgramFrac: Column, dupNgramFrac: Column,
      ellipsisLineFrac: Column, bulletLineFrac: Column,
      maxDupLineFrac: Double = 0.30, maxDupLineCharFrac: Double = 0.20,
      maxTopNgramFrac: Double = 0.20, maxDupNgramFrac: Double = 0.15,
      maxEllipsisLineFrac: Double = 0.30, maxBulletLineFrac: Double = 0.90): Column =
    repetitionKeep(dupLineFrac, dupLineCharFrac, topNgramFrac, dupNgramFrac,
      maxDupLineFrac, maxDupLineCharFrac, maxTopNgramFrac, maxDupNgramFrac) &&
      ellipsisLineFrac <= maxEllipsisLineFrac &&
      bulletLineFrac <= maxBulletLineFrac
}
