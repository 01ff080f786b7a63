package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Gopher-style document quality rules (Rae et al. 2021, "Scaling
  * Language Models: Methods, Analysis & Insights from Training Gopher",
  * appendix A1.1) — the standard rule battery a pretraining corpus is
  * gated on before any learned filter runs.
  *
  * Extension category beyond the reference's operator surface (the
  * reference's only text op is regex replace,
  * betl/dataflow/dfl_changeData.py:67-102); this battery complements the
  * repetition signals in [[TextFunctions]]/`repetition_stats` (Gopher's
  * duplicate-n-gram rules, already shipped as q_text_repetition) with the
  * five count/ratio rules.
  *
  * Every rule is a pure `Column => Column` over the token array + raw
  * text: row-local, no UDFs, fully codegen'd — one corpus scan, zero
  * shuffle, linear at 100 TB. Each formula is mirrored exactly in the
  * DuckDB oracle (q_gopher_rules).
  *
  * Rule set (document passes when ALL hold):
  *  - word count in [[MinWords]]..[[MaxWords]]
  *  - mean word length in [[MinMeanWordLen]]..[[MaxMeanWordLen]] chars
  *  - symbol-to-word ratio (`#` or `...` occurrences / words) ≤
  *    [[MaxSymbolRatio]]
  *  - fraction of words containing ≥1 alphabetic char ≥ [[MinAlphaFrac]]
  *  - ≥ [[MinStopwordHits]] occurrences of the Gopher stop set
  *    ("the, be, to, of, and, that, have, with")
  *
  * Empty documents (zero tokens) fail the count/length/alpha/stopword
  * rules and pass the symbol rule (zero symbols), by the conventions
  * below — both engines compute the same CASE guards.
  */
object GopherRules {
  val MinWords = 50
  val MaxWords = 100000
  val MinMeanWordLen = 3.0
  val MaxMeanWordLen = 10.0
  val MaxSymbolRatio = 0.1
  val MinAlphaFrac = 0.8
  val MinStopwordHits = 2

  /** Gopher's "must contain at least 2 of" stop set (A1.1). Counted with
    * multiplicity (total stop-token occurrences, not distinct types).
    */
  val StopSet: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Regex matching one symbol occurrence: a hash or a (non-overlapping,
    * leftmost-first) three-dot ellipsis. RE2/Java-compatible so the
    * oracle reproduces the match count exactly.
    */
  val SymbolRegex = "#|\\.\\.\\."

  def ruleWordCount(t: Column, minWords: Int = MinWords): Column =
    size(t) >= minWords && size(t) <= MaxWords

  /** Mean token length in chars (0.0 for empty text, which fails the
    * band). Single-reference fold — see [[TextFunctions.maxRunLength]]'s
    * note on Catalyst inlining duplicated trees.
    */
  def meanWordLen(t: Column): Column =
    when(size(t) === 0, 0.0).otherwise(
      aggregate(t, lit(0), (acc, w) => acc + length(w)).cast("double") /
        size(t))

  def ruleMeanWordLen(t: Column): Column = {
    val m = meanWordLen(t)
    m >= MinMeanWordLen && m <= MaxMeanWordLen
  }

  /** Symbol occurrences per word; 0.0 for empty text (rule passes). */
  def symbolRatio(text: Column, t: Column): Column =
    when(size(t) === 0, 0.0).otherwise(
      size(regexp_extract_all(text, lit(SymbolRegex), lit(0)))
        .cast("double") / size(t))

  def ruleSymbolRatio(text: Column, t: Column): Column =
    symbolRatio(text, t) <= MaxSymbolRatio

  /** Fraction of tokens containing at least one ASCII letter; 0.0 for
    * empty text (rule fails).
    */
  def alphaWordFrac(t: Column): Column =
    when(size(t) === 0, 0.0).otherwise(
      size(filter(t, w => w.rlike("[a-zA-Z]"))).cast("double") / size(t))

  def ruleAlphaWords(t: Column): Column = alphaWordFrac(t) >= MinAlphaFrac

  /** Total occurrences of [[StopSet]] tokens. */
  def stopwordHits(t: Column): Column = {
    val sw = array(StopSet.map(lit): _*)
    size(filter(t, w => array_contains(sw, w)))
  }

  def ruleStopwords(t: Column): Column = stopwordHits(t) >= MinStopwordHits

  /** All five rules as one struct (word_count, word_len, symbol, alpha,
    * stopwords, pass_gopher) — evaluate the token array ONCE by passing
    * the same `t` column to every rule; Catalyst subexpression
    * elimination shares the tokenization across the struct fields.
    *
    * `minWords` defaults to the paper constant (50), which assumes
    * web-length documents; short-form corpora calibrate it down (a
    * pipeline parameter, like every bound here — the flagship funnel
    * passes the floor matched to its corpus's length distribution).
    */
  def battery(text: Column, t: Column,
      minWords: Int = MinWords): Column = {
    val r1 = ruleWordCount(t, minWords)
    val r2 = ruleMeanWordLen(t)
    val r3 = ruleSymbolRatio(text, t)
    val r4 = ruleAlphaWords(t)
    val r5 = ruleStopwords(t)
    struct(
      r1.as("rule_word_count"), r2.as("rule_word_len"),
      r3.as("rule_symbol"), r4.as("rule_alpha"), r5.as("rule_stopwords"),
      (r1 && r2 && r3 && r4 && r5).as("pass_gopher"))
  }
}
