package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines.
  *
  * Everything here is a pure `Column` composition of built-in functions —
  * fully codegen'd inside whole-stage codegen, no UDFs — so each operator
  * is a narrow map over the documents table with no shuffle of its own.
  */
object TextFunctions {

  /** Whitespace tokens, empty strings dropped. */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= lit(""))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count heuristic: words are split on letter/digit
    * boundaries and long words cost extra units per 4 chars, approximating
    * a byte-pair-encoded token budget without a vocabulary.
    */
  def subwordCountEstimate(text: Column): Column =
    aggregate(
      tokens(text),
      lit(0L),
      (acc, t) => acc + greatest(lit(1L), ceil(length(t) / 4.0).cast("long")))

  /** Fixed, ranked BPE merge table — 40 live merges over common English
    * character pairs (each rule's operands exist by the time it fires:
    * rank ordering is creation ordering, the BPE invariant). Illustrative
    * by design: a production pipeline swaps in its tokenizer's learned
    * merge list. The swap target is [[bpeTokenCountExact]] (the native
    * [[graft.functions.BpeCount]] expression — a compiled table of
    * arbitrary size riding the task binary); the literal-replace faces
    * ([[bpeSegmented]]/[[bpeTokenCount]]) embed one `replace` PER MERGE
    * in the plan, so they are the cross-engine ORACLE form at toy
    * vocabulary only — a 50k GPT-2-style table would blow plan/codegen
    * size long before it shipped. Whitespace token budgets misestimate
    * real (tokenizer) budgets 1.3–1.7x by language; packing/chunking
    * should budget THESE counts (VERDICT r8 #3).
    */
  val BpeMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n", "r" -> "e",
    "o" -> "n", "e" -> "r", "a" -> "t", "e" -> "n", "o" -> "r",
    "t" -> "o", "i" -> "t", "o" -> "u", "e" -> "s", "s" -> "t",
    "an" -> "d", "in" -> "g", "a" -> "r", "o" -> "f", "e" -> "d",
    "i" -> "s", "a" -> "l", "ou" -> "r", "er" -> "s", "at" -> "e",
    "it" -> "h", "w" -> "ith", "o" -> "m", "u" -> "s", "l" -> "l",
    "s" -> "s", "e" -> "e", "o" -> "o", "th" -> "at", "in" -> "e",
    "c" -> "h", "s" -> "h", "f" -> "or", "t" -> "ing", "th" -> "is")

  /** Symbol delimiter in the BPE working string. Every symbol is FULLY
    * WRAPPED — `\u0001sym\u0001` — so a merge pattern
    * `\u0001a\u0001\u0001b\u0001` can only match symbol `a` followed
    * by symbol `b` EXACTLY: the closing delimiter terminates the second
    * operand (a prefix-only encoding would let operand `b` match any
    * following symbol that merely STARTS with b — e.g. rank-12 (i, t)
    * matching inside i,th and corrupting "with" — the bug this wrapping
    * exists to prevent), and because each symbol carries its OWN pair
    * of delimiters, adjacent matches share no characters and one
    * literal `replace` pass applies a merge left-to-right,
    * non-overlapping — exactly BPE's leftmost application. */
  private val BpeSep = "\u0001"
  /** Word boundary marker: merge patterns contain only [[BpeSep]], so no
    * merge ever crosses a word boundary. */
  private val BpeWordSep = "\u0002"

  /** The BPE working string after all merges: each word becomes
    * `\u0002` + its symbols, each symbol wrapped as `\u0001sym\u0001`.
    * The whole encode is `tokens` + one regexp char-split + 40 literal
    * `replace`s — a zero-shuffle codegen'd column map. Applying merges
    * exhaustively in rank order is exact BPE encoding: a merge's output
    * symbol is strictly longer than either operand and distinct from
    * both, so a rule never re-enables itself within its own pass, and
    * (rank order = creation order) no earlier rule ever involves a
    * later rule's output.
    */
  def bpeSegmented(text: Column): Column = {
    val init = array_join(
      transform(tokens(text),
        w => concat(lit(BpeWordSep),
          regexp_replace(w, "(.)", BpeSep + "$1" + BpeSep))),
      "")
    BpeMerges.foldLeft(init) { case (s, (a, b)) =>
      replace(s,
        lit(BpeSep + a + BpeSep + BpeSep + b + BpeSep),
        lit(BpeSep + a + b + BpeSep))
    }
  }

  /** Exact BPE token count under [[BpeMerges]] via the replace chain —
    * the cross-engine oracle face (one symbol = two `\u0001` delimiters,
    * counted with one `regexp_count` so the merge chain appears ONCE in
    * the plan instead of twice). Production counting with a real merge
    * list goes through [[bpeTokenCountExact]]. */
  def bpeTokenCount(text: Column): Column =
    (regexp_count(bpeSegmented(text), lit(BpeSep)) / 2).cast("int")

  /** Exact BPE token count from a compiled merge table of ARBITRARY size
    * — the native [[graft.functions.BpeCount]] expression, semantics
    * identical to the replace chain (spec-pinned on the 40-merge table
    * and a generated 1k-merge table). This is the form that takes a real
    * tokenizer's learned merge list. */
  def bpeTokenCountExact(
      text: Column, merges: Seq[(String, String)] = BpeMerges): Column =
    graft.functions.BpeCount(text, merges)

  /** Word n-gram shingles of `toks` joined with single spaces; documents
    * shorter than `n` words yield an empty array.
    */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(n)))))
      .otherwise(array().cast("array<string>"))

  def punctCount(text: Column): Column =
    length(regexp_replace(text, "[^.,!?;:]", ""))

  /** Stopword occurrence count (token-exact, not substring). */
  def stopwordCount(text: Column, stopwords: Seq[String]): Column = {
    val stops = array(stopwords.map(lit): _*)
    size(filter(tokens(text), t => array_contains(stops, t)))
  }

  val DefaultStopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "to", "in", "is", "it", "on")

  /** Heuristic quality score in [0,1]: rewards mid-length documents with a
    * moderate stopword ratio and penalizes punctuation walls. Deliberately
    * simple and fully deterministic; thresholds are tuning knobs.
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val lenScore = least(nTok / 20.0, lit(1.0))
    val stopRatio = stopwordCount(text, DefaultStopwords).cast("double") /
      greatest(nTok, lit(1.0))
    val punctRatio = punctCount(text).cast("double") /
      greatest(length(text).cast("double"), lit(1.0))
    round(lenScore * (lit(1.0) - punctRatio) *
      (lit(0.5) + least(stopRatio * 2.0, lit(0.5))), 6)
  }

  /** Marker-word profiles for the language-ID heuristic. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "es" -> Seq("el", "la", "de", "y", "es", "un"),
    "fr" -> Seq("le", "la", "et", "les", "est", "un"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "he2", "you3"))

  /** Per-language marker-token occurrence count. */
  def langScore(text: Column, lang: String): Column = {
    val markers = LangMarkers.toMap.apply(lang)
    stopwordCount(text, markers)
  }

  /** argmax over language scores; ties break toward the lexicographically
    * larger language code (greatest over (score, code) structs), with "und"
    * (undetermined) when no marker matched at all.
    */
  def langId(text: Column): Column = {
    val scored = LangMarkers.map { case (lang, _) =>
      struct(langScore(text, lang).as("s"), lit(lang).as("l"))
    }
    val best = greatest(scored: _*)
    when(best.getField("s") === 0, "und").otherwise(best.getField("l"))
  }

  /** Stable content fingerprint (hex SHA-256). */
  def fingerprint(text: Column): Column = sha2(text, 256)

  /** Mean token length, rounded to 6 — a Gopher-style quality signal
    * (Rae et al. 2021 §A.1.1: keep documents whose mean word length is
    * in [3, 10]). Integer sum ÷ integer count is a single IEEE-754
    * division, so any engine reproduces it bit for bit.
    */
  def meanWordLen(text: Column): Column = {
    val t = tokens(text)
    round(
      aggregate(t, lit(0L), (a, x) => a + length(x)).cast("double") /
        greatest(size(t), lit(1)), 6)
  }

  /** Fraction of the document occupied by its single most frequent token
    * — the Gopher repetition signal (most-common-word fraction). O(u·n)
    * per document via a distinct-token count scan; documents are
    * bounded-length by contract, so this stays a narrow codegen'd map.
    */
  def topTokenFrac(text: Column): Column = {
    val t = tokens(text)
    round(
      coalesce(
        array_max(transform(array_distinct(t),
          x => size(filter(t, y => y === x)))), lit(0))
        .cast("double") / greatest(size(t), lit(1)), 6)
  }

  /** Gopher-style heuristic keep decision over the word-level signals
    * that apply to single-line corpora: token-count bounds, mean-word-
    * length band, minimum stopword evidence, and a repetition cap.
    * (Line-shape rules — bullet ratio, terminal punctuation — need
    * multi-line text and are omitted; the corpus contract here is
    * one-line documents.) Thresholds are policy knobs.
    */
  def gopherKeep(
      nWords: Column, meanLen: Column, stopHits: Column, topFrac: Column,
      minWords: Int = 30, maxWords: Int = 100000,
      minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
      minStopHits: Int = 2, maxTopFrac: Double = 0.2): Column =
    nWords >= minWords && nWords <= maxWords &&
      meanLen >= minMeanLen && meanLen <= maxMeanLen &&
      stopHits >= minStopHits && topFrac <= maxTopFrac

  /** PII-scrub patterns: deliberately conservative RE2-compatible classes
    * (no lookaround, no backreferences) so the same pattern strings run
    * in Spark, RE2-based engines, and DuckDB. Tuning the patterns is a
    * policy decision; the operator contract is replace + count.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlPattern = "https?://[^\\s]+"
  val PhonePattern = "\\+?[0-9][0-9()\\-. ]{6,}[0-9]"

  /** Occurrences of `pattern` in `text` — the audit side of redaction. */
  def patternCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** Replace every match of `pattern` with `token`. Pure codegen'd column
    * map (regexp_replace replaces all matches), no shuffle — the
    * training-pipeline scrub stage. Chain for multiple classes:
    * {{{ redact(redact(c, EmailPattern, "<EMAIL>"), UrlPattern, "<URL>") }}}
    */
  def redact(text: Column, pattern: String, token: String): Column =
    regexp_replace(text, pattern, token)

  /** One-call scrub of the default PII classes (emails, URLs, phone-like
    * digit runs), longest-structure first so a URL containing an email
    * form is replaced as a URL, not split.
    */
  def redactPii(text: Column): Column =
    redact(redact(redact(text, UrlPattern, "<URL>"),
      EmailPattern, "<EMAIL>"), PhonePattern, "<PHONE>")

  /** Winnowing document fingerprint (Schleimer et al., SIGMOD'03): hash all
    * k-gram shingles, take the minimum hash of every sliding window of `w`
    * consecutive shingle hashes, dedup ascending. Robust to local edits;
    * output size ~ len/w.
    */
  def winnow(toks: Column, k: Int, w: Int): Column = {
    val hashes = transform(shingles(toks, k), s => xxhash64(s))
    array_sort(array_distinct(windowMins(hashes, w, "array<bigint>")))
  }

  /** [[winnow]] with a cross-engine k-gram hash: the first 16 hex chars of
    * sha256. Lexicographic order on fixed-width hex equals numeric order
    * on the underlying 64 bits, so window minima select the SAME shingles
    * as a 64-bit integer hash would — but DuckDB (or any engine with
    * sha256) reproduces the fingerprints exactly, which xxhash64 cannot.
    * Prefer [[winnow]] when cross-engine equality is not required: one
    * sha256 per shingle costs ~10x an xxhash64.
    */
  def winnowPortable(toks: Column, k: Int, w: Int): Column = {
    val hashes = transform(shingles(toks, k), s => substring(sha2(s, 256), 1, 16))
    array_sort(array_distinct(windowMins(hashes, w, "array<string>")))
  }

  private def windowMins(hashes: Column, w: Int, tpe: String): Column =
    when(size(hashes) >= w,
      transform(
        sequence(lit(0), size(hashes) - w),
        i => array_min(slice(hashes, i + lit(1), lit(w)))))
      .otherwise(when(size(hashes) > 0, array(array_min(hashes)))
        .otherwise(array().cast(tpe)))
}
