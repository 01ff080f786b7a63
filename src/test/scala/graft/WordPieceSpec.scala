package graft

import graft.text.{Bpe, WordPiece}
import org.apache.spark.sql.functions._

/** WordPiece trainer + greedy encoder (text/WordPiece.scala):
  * likelihood-argmax semantics vs BPE's count argmax, local ≡
  * distributed bit-parity, greedy longest-match encode with ##
  * rendering and the [UNK] fallback.
  */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  test("likelihood argmax prefers rare-unigram pairs over raw count") {
    // pairs (a,b) and (a,a): count 4, over very frequent unigrams
    // (u_a=12, u_b=8); pair (x,y): count 3 over unigrams that occur
    // only in it (u=3, 3). BPE picks (a,a) (count 4, tie-break
    // ascending); WordPiece picks (x,y):
    //   3/(3·3) = 0.333 > 4/(12·8) = 0.042 > 4/(12·12) = 0.028
    val words = Seq(
      ("ab", 4L), ("aa", 4L), ("bb", 2L), ("xy", 3L))
    val wp = WordPiece.trainMergesLocal(words, 1).head
    assert((wp.left, wp.right) == ("x", "y"))
    val bpe = Bpe.trainMergesLocal(words, 1).head
    assert((bpe.left, bpe.right) == ("a", "a"))
    // the integer score: 3·2^40 / 9
    assert(wp.score == (BigInt(3) * WordPiece.ScoreScale / 9).toLong)
  }

  test("score ties break (left, right) ascending under UTF-8 order") {
    // two pairs with identical (count, ua, ub) profiles
    val words = Seq(("pq", 2L), ("rs", 2L))
    val m = WordPiece.trainMergesLocal(words, 1).head
    assert((m.left, m.right) == ("p", "q"))
  }

  test("local trainer ≡ distributed trainer, bit-exact") {
    val words = Seq(
      ("alpha", 5L), ("alps", 3L), ("beta", 4L), ("bet", 2L),
      ("able", 1L), ("alphabet", 2L), ("aaaa", 3L))
    val local = WordPiece.trainMergesLocal(words, 6)
    val dist = WordPiece.trainMergesDistributed(
      spark, words.toDF("w", "cnt"), 6)
    assert(local == dist)
  }

  test("greedy encode takes the longest match, ##-prefixes, [UNK]s") {
    val vocab = Seq("a", "b", "c", "ab", "abc", "bc")
    val out = WordPiece.encodeGreedy(
      Seq(("abcbc", 1L), ("abq", 1L)).toDF("w", "cnt"), vocab)
      .select(col("w"), concat_ws(" ", col("pieces")).as("p"),
        col("n_pieces"))
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getLong(2))).toMap
    // longest-first: "abc" beats "ab"; continuation gets ##
    assert(out("abcbc") == ("abc ##bc", 2L))
    // q is not in the vocab → [UNK], advance 1
    assert(out("abq") == ("ab [UNK]", 2L))
  }

  test("trained vocab round-trips the training corpus without [UNK]") {
    val docs = Seq(
      (0L, "spark scala spark query"),
      (1L, "scala query plan plan")).toDF("doc_id", "text")
    val wc = Bpe.wordCounts(docs, "text").localCheckpoint()
    val merges = WordPiece.trainMerges(spark, wc, 4)
    val vocab = (WordPiece.alphabet(wc) ++ merges.map(_.merged)).distinct
    val enc = WordPiece.encodeGreedy(wc, vocab)
    assert(enc.where(array_contains(col("pieces"), "[UNK]")).count() == 0)
    // every word reassembles from its pieces (## stripped)
    val bad = enc.select(col("w"), col("pieces")).collect().filter { r =>
      val rebuilt = r.getSeq[String](1).map(_.stripPrefix("##")).mkString
      rebuilt != r.getString(0)
    }
    assert(bad.isEmpty)
  }
}
