package graft

import graft.text.UnigramLm
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer: the row-local Viterbi DP + smallest-split
  * backtrack must equal a scalar reference implementation exactly
  * (integer scores make optimality and tie-breaks checkable), and the
  * trained two-pass chain must keep every word segmentable while
  * promoting frequent multi-char sequences to single pieces.
  */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  private val L = UnigramLm.MaxPieceLen

  /** Scalar reference: maximise Σ score over segmentations into pieces
    * of length ≤ L present in `score`; backtrack takes the SMALLEST
    * split j at each end position — the engine's documented tie-break.
    */
  private def refSegment(
      w: String, score: Map[String, Long]): Seq[String] = {
    val n = w.length
    val dp = Array.fill(n + 1)(Long.MinValue)
    dp(0) = 0L
    for (i <- 1 to n; j <- math.max(0, i - L) until i)
      score.get(w.substring(j, i)).foreach { s =>
        if (dp(j) != Long.MinValue && dp(j) + s > dp(i)) dp(i) = dp(j) + s
      }
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = n
    while (pos > 0) {
      val j = (math.max(0, pos - L) until pos).find { j =>
        dp(j) != Long.MinValue &&
          score.get(w.substring(j, pos)).exists(dp(j) + _ == dp(pos))
      }.get
      w.substring(j, pos) +=: out
      pos = j
    }
    out.toSeq
  }

  test("segment matches the scalar Viterbi on randomized score tables") {
    val rnd = new scala.util.Random(421)
    val words = Seq("a", "ab", "abab", "aabbab", "babababa", "abcabc",
      "ccccc", "abcdefgh") ++
      (1 to 12).map(_ => (1 to (1 + rnd.nextInt(8)))
        .map(_ => "abc" (rnd.nextInt(3))).mkString)
    val distinct = words.distinct
    // score every substring of length <= L with a random negative value
    // (unigram-LM scores are negative log probs)
    val pieces = distinct.flatMap { w =>
      for (i <- 0 until w.length; l <- 1 to math.min(L, w.length - i))
        yield w.substring(i, i + l)
    }.distinct
    val score = pieces.map(p => p -> -(1L + rnd.nextInt(1000))).toMap
    val wordsDf = distinct.map(w => (w, 1L)).toDF("w", "cnt")
    val scoreDf = score.toSeq.toDF("piece", "fp")
    val got = UnigramLm.segment(wordsDf, scoreDf)
      .select("w", "pieces").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
    distinct.foreach { w =>
      assert(got(w) == refSegment(w, score), s"word $w")
    }
  }

  test("train keeps every word segmentable and reconstructing") {
    val docs = Seq(
      "spark table window spark table",
      "window spark query table scan",
      "zq zq unique").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val wc = graft.text.Bpe.wordCounts(docs, "text")
    val seg = UnigramLm.train(wc).collect()
    assert(seg.nonEmpty)
    seg.foreach { r =>
      val w = r.getString(0)
      val ps = r.getSeq[String](2)
      assert(ps.nonEmpty && ps.mkString("") == w,
        s"pieces of '$w' must concatenate back: $ps")
      assert(ps.forall(_.length <= L))
    }
  }

  test("a dominant frequent sequence trains to a single piece") {
    // 'drum' saturates the corpus: its seed score beats any split and
    // usage re-scoring only concentrates it further
    val docs = (1 to 30).map(i => (i.toLong, "drum drum drum"))
      .toDF("doc_id", "text")
      .union(Seq((99L, "d r u m x")).toDF("doc_id", "text"))
    val wc = graft.text.Bpe.wordCounts(docs, "text")
    val seg = UnigramLm.train(wc).collect()
      .map(r => r.getString(0) -> r.getSeq[String](2).toSeq).toMap
    assert(seg("drum") == Seq("drum"))
    // the singleton chars survive as their own pieces (never pruned)
    Seq("d", "r", "u", "m", "x").foreach(c => assert(seg(c) == Seq(c)))
  }

  test("round-2 usage scores shift segmentations toward used pieces") {
    // deterministic smoke: the trained chain runs end-to-end on a
    // mixed corpus and yields piece counts bounded by word lengths
    val docs = Seq((1L, "window window windows wind"),
      (2L, "win dow window")).toDF("doc_id", "text")
    val wc = graft.text.Bpe.wordCounts(docs, "text")
    val seg = UnigramLm.train(wc).collect()
    seg.foreach { r =>
      val w = r.getString(0)
      val n = r.getLong(3)
      assert(n >= 1 && n <= w.length)
      assert(n >= math.ceil(w.length.toDouble / L).toLong)
    }
  }
}
