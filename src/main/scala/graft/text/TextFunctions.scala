package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text-analysis functions for large-scale corpus pipelines:
  * tokenization, quality statistics, language identification, and document
  * fingerprinting.
  *
  * This is an extension category beyond the reference's operator surface
  * (the reference's only string op is regex replace,
  * betl/dataflow/dfl_changeData.py:67-102) — the operations an LLM
  * training-data pipeline needs over a `documents(text)` corpus.
  *
  * Everything here is pure `Column => Column` composition over Spark's
  * built-in expressions: no UDFs, fully codegen'd, row-local (no shuffle),
  * so each scales linearly with the corpus and pushes column pruning down
  * to the Parquet scan.
  */
object TextFunctions {

  /** Whitespace tokens of a text column; empty/blank text → empty array. */
  def tokens(c: Column): Column =
    when(length(trim(c)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(c), "\\s+"))

  def tokenCount(c: Column): Column = size(tokens(c))

  /** Word k-grams WITH repeats (unlike the dedup shingles, which are
    * distinct sets) — repetition statistics need the multiplicities.
    * Empty for documents shorter than k tokens.
    */
  def ngrams(t: Column, k: Int): Column =
    when(size(t) >= k,
      transform(sequence(lit(1), size(t) - (k - 1)),
        i => concat_ws(" ", slice(t, i, lit(k)))))
      .otherwise(array().cast("array<string>"))

  /** Maximum multiplicity of any element of a SORTED string array — one
    * left fold carrying (prev, current run, best run). O(n log n) with
    * the sort, entirely row-local: the repetition signals need no
    * explode + per-(doc, gram) shuffle at all.
    *
    * Keep this tree SINGLE-REFERENCE in any projection: the fold is the
    * expensive expression, and Catalyst inlines duplicated column trees
    * into every use (a two-reference rendering measured 2-3× slower; a
    * six-reference fused variant 10× slower).
    */
  def maxRunLength(sorted: Column): Column =
    aggregate(sorted,
      struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
        lit(0L).as("best")),
      (st, x) => {
        // null prev (first element) compares null -> otherwise(1)
        val run = when(x === st.getField("prev"),
          st.getField("run") + 1L).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(st.getField("best"), run).as("best"))
      }).getField("best")

  /** BPE-ish sub-word piece count: runs of letters, runs of digits, or a
    * single other non-space char. A cheap, deterministic stand-in for a
    * real tokenizer's piece count (the regex is RE2/Java compatible so
    * oracles can reproduce it).
    */
  def pieceCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0)))

  def charCount(c: Column): Column = length(c)

  /** Ratio of punctuation chars (fixed class, engine-portable) to all
    * chars; 0.0 for empty text.
    */
  def punctRatio(c: Column): Column =
    when(length(c) === 0, 0.0).otherwise(
      size(regexp_extract_all(c, lit("[.,!?;:]"), lit(0)))
        .cast("double") / length(c))

  /** Mean token length in chars; 0.0 for empty text. */
  def avgWordLen(c: Column): Column = {
    val t = tokens(c)
    when(size(t) === 0, 0.0).otherwise(
      aggregate(t, lit(0), (acc, w) => acc + length(w)).cast("double") / size(t))
  }

  /** Default English stopword list used by quality scoring. */
  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "on", "for")

  /** Fraction of tokens that are stopwords; 0.0 for empty text. */
  def stopwordRatio(
      c: Column, stopwords: Seq[String] = EnglishStopwords): Column = {
    val t = tokens(c)
    val sw = array(stopwords.map(lit): _*)
    when(size(t) === 0, 0.0).otherwise(
      size(filter(t, w => array_contains(sw, w))).cast("double") / size(t))
  }

  /** Composite document quality score in [0,1] — the standard cheap
    * pre-training heuristics (length band, low punctuation noise, natural
    * stopword density). Deterministic double arithmetic; identical formula
    * is mirrored in the DuckDB oracle.
    *
    *   0.4 * min(n_tokens, 100)/100
    * + 0.3 * (1 - punct_ratio)
    * + 0.3 * min(stopword_ratio * 5, 1)
    */
  def qualityScore(c: Column): Column =
    round(
      least(tokenCount(c), lit(100)).cast("double") / 100 * 0.4 +
        (lit(1.0) - punctRatio(c)) * 0.3 +
        least(stopwordRatio(c) * 5, lit(1.0)) * 0.3,
      6)

  /** Marker-word sets for the n-gram/stopword language-ID heuristic.
    * Ordered map: ties break toward the alphabetically first language.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "en" -> Seq("the", "a", "is", "and", "of", "it"),
    "es" -> Seq("el", "la", "los", "y", "es", "que"),
    "fr" -> Seq("le", "la", "les", "et", "est", "ne"),
    "zh" -> Seq("的", "是", "了", "在", "我", "不"))

  /** Per-language marker-hit count over the token stream. */
  def langHits(c: Column, markers: Seq[String]): Column = {
    val m = array(markers.map(lit): _*)
    size(filter(tokens(c), w => array_contains(m, w)))
  }

  /** Heuristic language ID: argmax of marker hits, alphabetical tie-break,
    * `und` (undetermined) when nothing matches. The classic fastText-free
    * fallback for corpus triage; one pass, no shuffle.
    */
  def langId(c: Column, markers: Seq[(String, Seq[String])] = LangMarkers)
      : Column = {
    val hits = markers.map { case (lang, m) => lang -> langHits(c, m) }
    val best = greatest(hits.map(_._2): _*)
    // first (alphabetical) language reaching the max wins
    hits.foldLeft(when(best <= 0, "und")) { case (acc, (lang, h)) =>
      acc.when(h === best, lang)
    }.otherwise("und")
  }

  /** Canonical-form fingerprint: md5 of lowercased, whitespace-collapsed,
    * trimmed text. Groups case/spacing variants of the same document —
    * the exact-dedup key.
    */
  def fingerprint(c: Column): Column =
    md5(regexp_replace(lower(trim(c)), "\\s+", " ").cast("binary"))

  /** JVM mirror of [[tokenHash60]]: value of the first 15 hex chars of
    * md5 = top 60 bits of the digest's first 8 bytes. Bit-identical to
    * the Column rendering; used by the hot-loop kernels.
    */
  private[graft] def md5Hash60(s: String): Long =
    fold60(java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")))

  /** Top 60 bits of a digest's first 8 bytes — the fold shared by
    * [[md5Hash60]] and the digester-reusing hot kernels.
    */
  private[graft] def fold60(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** Primitive-loop SimHash kernel over whitespace tokens — bit-identical
    * to [[simHashFromHashes]] over [[tokenHash60]] hashes, ~100× cheaper
    * than the interpreted higher-order vote expression (60 × |tokens|
    * boxed ops per document).
    */
  private[graft] def simHashKernel(tokens: Seq[String]): Long = {
    val votes = new Array[Int](SimHashBits)
    tokens.foreach { t =>
      val h = md5Hash60(t)
      var j = 0
      while (j < SimHashBits) {
        votes(j) += ((h >>> j) & 1L).toInt * 2 - 1
        j += 1
      }
    }
    var out = 0L
    var j = 0
    while (j < SimHashBits) { if (votes(j) > 0) out |= 1L << j; j += 1 }
    out
  }

  /** [[simHashKernel]] as a UDF over a token array column. */
  val simHashUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((ws: Seq[String]) => simHashKernel(ws))

  /** Portable 60-bit token hash: first 15 hex chars of md5 as a bigint.
    * 15 digits keep the value under 2^60, comfortably inside a signed
    * long, and md5 makes the hash reproducible in any oracle engine
    * (DuckDB mirrors it with a hex-digit list_reduce) — unlike xxhash64.
    */
  def tokenHash60(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("bigint")

  /** Polynomial rolling-hash document fingerprint over the token stream:
    * h ← (h·B + tokenHash(t) mod p) mod p, p = 2^31−1, B prime. Order-
    * sensitive (unlike the shingle-set hashes) — reorderings of the same
    * words fingerprint differently. All arithmetic stays in 64-bit longs,
    * mirrored exactly by the DuckDB oracle's list_reduce.
    */
  val RollingHashBase = 1000003L
  val RollingHashP: Long = (1L << 31) - 1

  def rollingHash(c: Column): Column =
    aggregate(
      transform(tokens(c), t => tokenHash60(t) % lit(RollingHashP)),
      lit(0L),
      (h, x) => (h * lit(RollingHashBase) + x) % lit(RollingHashP))

  val SimHashBits = 60

  /** 60-bit SimHash over whitespace tokens: per bit position, each token
    * hash votes +1/-1, and the bit is set where the vote is positive.
    * Near-identical documents land within a small Hamming distance
    * (`bit_count(a ^ b)`). Row-local, no shuffle; banding the value (see
    * [[graft.dedup.Dedup.simHashBands]]) gives the scalable near-dup
    * join key at corpus scale.
    *
    * Bit positions are Scala-level constants, so the shifts stay literal
    * and the whole expression compiles into whole-stage codegen.
    */
  def simHash(c: Column): Column =
    simHashFromHashes(transform(tokens(c), t => tokenHash60(t)))

  /** SimHash from a PRE-HASHED token array (materialise the hash array
    * with a `withColumn` first). Two row-local folds, each referencing its
    * input exactly once so no optimizer collapse can duplicate upstream
    * work: (1) accumulate the 60 per-bit votes in one pass over the
    * hashes; (2) fold the vote array into the hash value.
    */
  def simHashFromHashes(hashesCol: Column): Column = {
    val bitVotes = (h: Column) => array((0 until SimHashBits).map { j =>
      (shiftright(h, j).bitwiseAND(lit(1L)) * 2 - 1).cast("int")
    }: _*)
    val votes = aggregate(hashesCol,
      array_repeat(lit(0), SimHashBits),
      (acc, h) => zip_with(acc, bitVotes(h), (a, b) => a + b))
    val powers = array((0 until SimHashBits).map(j => lit(1L << j)): _*)
    aggregate(
      zip_with(votes, powers, (v, p) => when(v > 0, p).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc + v)
  }
}
