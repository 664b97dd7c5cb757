package graft.text

import graft.functions.Hashing
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, n-gram shingling, language ID, quality scoring, token
  * counting, document fingerprinting.
  *
  * Everything is a narrow, codegen-friendly column expression — per-document
  * work with no shuffle, so it scales linearly with executors at 100 TB.
  * (The reference engine has no text stack; this extends the rebuilt engine
  * for data-curation workloads.)
  */
object TextAnalysis {

  /** Whitespace tokenization. */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct token set (unigram shingles). */
  def tokenSet(text: Column): Column = array_distinct(tokens(text))

  /** Word n-gram shingles: `n` consecutive tokens joined by space.
    * `transform(sequence(...))` keeps it per-row (no explode / shuffle).
    *
    * NOTE for hot paths: higher-order functions are interpreted (no
    * codegen, no subexpression elimination), so the `tokens(text)` inside
    * the lambda re-splits the text once PER SEQUENCE ELEMENT — O(tokens²)
    * per row. Pre-project the token array and use [[shinglesOf]] instead.
    */
  def shingles(text: Column, n: Int): Column = shinglesOf(tokens(text), n)

  /** [[shingles]] over an already-materialized token-array column —
    * the lambda then slices a bound attribute (O(n) per shingle), not a
    * re-evaluated split.
    */
  def shinglesOf(toks: Column, n: Int): Column =
    transform(sequence(lit(1), greatest(size(toks) - lit(n - 1), lit(1))),
      i => array_join(slice(toks, i, lit(n)), " "))

  /** Number of n-gram shingles [[shinglesOf]] yields — computed
    * arithmetically so totals don't need the array materialized.
    */
  def shingleCount(toks: Column, n: Int): Column =
    greatest(size(toks) - lit(n - 1), lit(1))

  /** Per-language stopword marker sets for the n-gram-heuristic language ID.
    * Deterministic tiny lists — the heuristic's shape (score = overlap with
    * marker set, argmax wins, ties break lexicographically) is the point.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "nicht", "das"),
    "en" -> Seq("the", "and", "of", "to", "is"),
    "es" -> Seq("el", "la", "de", "que", "los"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "zh" -> Seq("的", "是", "了", "在", "we"))

  /** Language-ID score for one language: overlap size between the document
    * token set and the language marker set.
    */
  def langScore(text: Column, markers: Seq[String]): Column =
    size(array_intersect(tokenSet(text), array(markers.map(lit): _*)))

  /** Predicted language: argmax of marker overlap, lexicographic tiebreak,
    * "und" (undetermined) when every score is zero.
    */
  def langId(text: Column): Column = {
    val scored = langMarkers.map { case (l, m) => (l, langScore(text, m)) }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    val pick = scored.foldRight(lit("und")) { case ((l, s), acc) =>
      when(s === best && best > 0, l).otherwise(acc)
    }
    // foldRight keeps the FIRST (lexicographically smallest) winner since
    // langMarkers is sorted by language code
    pick
  }

  /** Token count by whitespace. */
  def wsTokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish token count: runs of letters, runs of digits, or single other
    * non-space chars — a deterministic proxy for subword tokenizers.
    */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Quality features: length, mean token length, stopword ratio, distinct
    * ratio (1 - repetition), and a composite score in [0, ~1].
    * Ratios are exact integer divisions evaluated identically across
    * engines (IEEE doubles from ints).
    */
  def qualityColumns(text: Column): Seq[(String, Column)] = {
    val toks = tokens(text)
    val n = size(toks).cast("double")
    val stop = langScore(text, langMarkers.flatMap(_._2).distinct).cast("double")
    val distinctN = size(array_distinct(toks)).cast("double")
    val meanLen = length(text).cast("double") / n
    Seq(
      "n_toks" -> size(toks),
      "mean_tok_len" -> meanLen,
      "stopword_ratio" -> (stop / n),
      "distinct_ratio" -> (distinctN / n))
  }

  /** Canonical document fingerprint: md5 over the sorted distinct token
    * set — whitespace/token-order insensitive content identity.
    */
  def fingerprint(text: Column): Column =
    Hashing.fingerprint(array_join(array_sort(array_distinct(tokens(text))), " "))

  // ---- PII scrubbing ----------------------------------------------------

  /** Redaction patterns for training-corpus PII scrubbing. Deterministic
    * regexes, applied longest-structure first so a phone number is masked
    * as ONE phone, not four digit runs.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\d{2}-\\d{3}-\\d{3}-\\d{4}"
  val DigitRunRe = "\\d{6,}"

  /** Mask emails, phone-shaped numbers and long digit runs with typed
    * placeholders — per-row regexp_replace chain, codegen'd, no UDF.
    */
  def scrubPii(text: Column): Column = {
    val noEmail = regexp_replace(text, EmailRe, "<EMAIL>")
    val noPhone = regexp_replace(noEmail, PhoneRe, "<PHONE>")
    regexp_replace(noPhone, DigitRunRe, "<NUM>")
  }

  /** How many matches of `pattern` the scrubber would mask in `text`. */
  def piiMatchCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))
}
