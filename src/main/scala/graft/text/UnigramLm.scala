package graft.text

import graft.functions.DetLog
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

/** Unigram-LM subword tokenizer — the SentencePiece algorithm family
  * (Kudo 2018, arXiv:1804.10959), deterministic Viterbi hard-EM
  * rendering: seed a piece inventory with every substring of the
  * corpus's words up to [[MaxPieceLen]] chars, score pieces by their
  * corpus log-frequency, Viterbi-segment every word under those scores,
  * then re-score from the segmentation's actual piece usage and segment
  * once more (one hard-EM round; soft EM's expected counts and the
  * iterative prune schedule are the full algorithm — the hard variant
  * keeps every quantity an exact integer, so the segmentations are
  * bit-replayable by the DuckDB oracle, the [[Bpe]] bit-parity
  * stance). Extension category — the BPE trainer's sibling; real
  * pipelines ship both (BPE = GPT lineage, unigram = T5/ALBERT
  * lineage).
  *
  * Determinism: piece scores are fixed-point-snapped log ratios
  * (ONE snap per ratio, [[DetLog]] — no libm), so Viterbi DP values
  * are exact integers; ties break toward the SMALLEST split point
  * (`list_min`/`array_min` of the matching predecessors), a total rule
  * both engines share. Single-character pieces are never pruned (the
  * Kudo invariant: every word stays segmentable).
  *
  * Scale shape (the [[Bpe]] argument): ONE corpus-sized scan builds the
  * word-frequency table; everything downstream — piece seeding, both
  * scoring passes, both Viterbi passes — iterates on DISTINCT words
  * (vocab-sized), with the DP itself ROW-LOCAL (higher-order functions
  * over a per-word piece-score map; O(len·L) lookups per word). The
  * corpus reappears only in the final per-document rollup: an equi-join
  * of corpus tokens to the vocab-sized (word → n_pieces) table,
  * gate-broadcast. No corpus-sized shuffle carries piece keys.
  */
object UnigramLm {

  /** Maximum piece length in characters. 4 keeps the seed inventory at
    * ≤ len·4 pieces per word while exercising multi-char pieces on the
    * test corpus; production vocabularies use 8–16 (a linear factor on
    * the vocab-sized DP only).
    */
  val MaxPieceLen = 4

  /** Fixed-point scale for snapped log ratios (2^20). */
  val LnScale: Long = Vocabulary.LnScale

  /** All positioned substrings of length 1..L — one element per
    * OCCURRENCE (positions weight frequency seeding; duplicates are
    * deduped separately where a map key needs distinctness).
    */
  private def positionedPieces(w: Column): Column =
    flatten(transform(sequence(lit(1), length(w)), i =>
      transform(sequence(lit(1),
        least(lit(MaxPieceLen), length(w) - i + 1)), l =>
        w.substr(i, l))))

  /** Seed piece frequencies from a (w, cnt) word table: every substring
    * occurrence of every word, weighted by the word's corpus count.
    * Vocab-sized × len·L — never corpus-sized.
    */
  def pieceSeeds(words: DataFrame): DataFrame =
    words
      .select(col("cnt"), explode(positionedPieces(col("w"))).as("piece"))
      .groupBy("piece").agg(sum(col("cnt")).as("freq"))

  /** Snap a (piece, m) count frame to fixed-point unigram-LM scores
    * `fp = floor(ln(m/tot) · 2^20)` — negative longs, so Viterbi's
    * maximisation pays a per-piece penalty and segmentation length
    * self-balances (raw counts would reward MORE pieces). `tot` is the
    * 1-row sum-of-m frame, broadcast.
    */
  private def snapScores(counts: DataFrame, m: Column): DataFrame = {
    val tot = counts.agg(sum(m).as("__tot"))
    counts.crossJoin(broadcast(tot))
      .select(col("piece"),
        floor(DetLog.lnRatio(m, col("__tot")) * LnScale).cast("long")
          .as("fp"))
  }

  /** Round-1 scores: seed frequencies over their total. */
  def seedScores(words: DataFrame): DataFrame =
    snapScores(pieceSeeds(words), col("freq"))

  /** Viterbi-segment every word of a (w, cnt) table under a
    * (piece, fp) score table: returns (w, cnt, pieces, n_pieces).
    *
    * DP is row-local: `dp[i] = max over j in [i−L, i) of
    * dp[j] + fp(w[j+1..i])` (array fold over positions — a runtime
    * loop, not a per-position expression unroll), followed by a
    * backward reconstruction that at each end position takes the
    * SMALLEST matching split j (the shared tie-break). Pieces missing
    * from the score table contribute null and drop out of the max;
    * single-char pieces are always present, so `dp` never strands.
    */
  def segment(words: DataFrame, scores: DataFrame): DataFrame = {
    val L = MaxPieceLen
    // per-word piece-score map: DISTINCT pieces (ANSI map_from_entries
    // rejects duplicate keys), equi-joined to the score table — both
    // sides vocab-sized; the map payload is ≤ len·L entries
    val small = BigramLm.vocabBroadcastOk(
      scores.count(), BigramLm.vocabRowBytes(strCols = 1, numCols = 1))
    val gated = if (small) broadcast(scores) else scores
    val wmap = words.select(col("w"),
      explode(array_distinct(positionedPieces(col("w")))).as("piece"))
      .join(gated, Seq("piece"))
      .groupBy("w")
      .agg(map_from_entries(collect_list(struct(col("piece"), col("fp"))))
        .as("m"))
    val withDp = words.join(wmap, Seq("w"))
      .withColumn("dp",
        aggregate(sequence(lit(1), length(col("w"))),
          array(lit(0L)),
          (acc, i) => concat(acc, array(
            array_max(filter(
              transform(sequence(greatest(i - L, lit(0)), i - 1), j =>
                element_at(acc, j + 1) +
                  try_element_at(col("m"), col("w").substr(j + 1, i - j))),
              v => v.isNotNull))))))
    // backward reconstruction: acc = (pos, pieces); each of the n steps
    // either closes one piece ending at pos (smallest matching split)
    // or no-ops once pos hits 0. Runs ≤ n real steps.
    val emptyPieces = array().cast(ArrayType(StringType))
    withDp
      .withColumn("pieces",
        aggregate(sequence(lit(1), length(col("w"))),
          struct(length(col("w")).as("pos"), emptyPieces.as("ps")),
          (acc, _) => {
            val pos = acc.getField("pos")
            val jStar = array_min(filter(
              transform(sequence(greatest(pos - L, lit(0)), pos - 1), j =>
                when(element_at(col("dp"), j + 1) +
                  try_element_at(col("m"),
                    col("w").substr(j + 1, pos - j)) ===
                  element_at(col("dp"), pos + 1), j)),
              v => v.isNotNull))
            when(pos > 0,
              struct(jStar.as("pos"),
                concat(
                  array(col("w").substr(jStar + 1, pos - jStar)),
                  acc.getField("ps")).as("ps")))
              .otherwise(acc)
          },
          acc => acc.getField("ps")))
      .select(col("w"), col("cnt"), col("pieces"),
        size(col("pieces")).cast("long").as("n_pieces"))
  }

  /** Hard-EM re-scores: piece usage under a segmentation (weighted by
    * word count), survivors = used pieces ∪ ALL single-char pieces
    * (never pruned), `fp = floor(ln((u+1)/(U+V)) · 2^20)` — +1
    * smoothing keeps zero-usage chars scorable.
    */
  def usageScores(words: DataFrame, segmented: DataFrame): DataFrame = {
    val used = segmented
      .select(col("cnt"), explode(col("pieces")).as("piece"))
      .groupBy("piece").agg(sum(col("cnt")).as("u"))
    val chars = words
      .select(explode(positionedPieces(col("w"))).as("piece"))
      .where(length(col("piece")) === 1)
      .distinct()
      .select(col("piece"), lit(0L).as("u"))
    val surv = used.unionByName(chars)
      .groupBy("piece").agg(sum(col("u")).as("u"))
    val tot = surv.agg(
      (sum(col("u")) + count(lit(1))).as("__uv"))
    surv.crossJoin(broadcast(tot))
      .select(col("piece"),
        floor(DetLog.lnRatio(col("u") + 1, col("__uv")) * LnScale)
          .cast("long").as("fp"))
  }

  /** The full two-pass trainer over a (w, cnt) word table: seed-score →
    * segment → usage-score → segment. Each stage's vocab-sized product
    * is pinned (eager localCheckpoint) — the score tables feed a join
    * AND the broadcast gate's count, and the round-1 segmentation feeds
    * usage counting; without the pins each consumer would re-run the
    * upstream DP chain (the PerplexityBuckets lesson).
    */
  def train(words: DataFrame): DataFrame = {
    val wc = words.localCheckpoint()
    val s1 = seedScores(wc).localCheckpoint()
    val seg1 = segment(wc, s1).localCheckpoint()
    val s2 = usageScores(wc, seg1).localCheckpoint()
    segment(wc, s2)
  }
}
