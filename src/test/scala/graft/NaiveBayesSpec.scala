package graft

import graft.functions.DetLog
import graft.text.NaiveBayes
import org.apache.spark.sql.functions._

/** Pins the NB quality classifier against an independent plain-Scala
  * replay of the fixed-point algebra on a corpus exercising in-vocab,
  * class-tied, and out-of-vocabulary tokens — including the
  * floor(x) + floor(-x) = -1 asymmetry that makes a symmetric
  * document score strictly negative.
  */
class NaiveBayesSpec extends SparkSpec {
  import spark.implicits._

  private val S = NaiveBayes.LnScale

  private def fp(a: Long, b: Long): Long =
    math.floor(DetLog.lnRatioRef(a, b) * S).toLong

  // train (even ids): doc0 POS "a a b", doc2 NEG "b c c"
  // → a: (2,0), b: (1,1), c: (0,2); V=3; Npos=Nneg=3; dpos=dneg=1
  private val docs = Seq(
    (0L, "a a b", "en"),
    (2L, "b c c", "zh"),
    (1L, "a c z", "en"), // z is OOV; a and c cancel up to floor
    (3L, "a a a", "zh")) // strongly positive tokens
    .toDF("doc_id", "text", "lang")

  private def run() = NaiveBayes.scoreBinary(
    docs, docs.where(col("doc_id") % 2 === 0), "doc_id", "text",
    col("lang") === "en")
    .orderBy("doc_id").collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))

  test("log-odds match the hand-replayed fixed point, OOV included") {
    val got = run()
    val fpA = fp(3, 1) // (cpos+1)/(cneg+1) = 3/1
    val fpB = fp(2, 2) // = 0
    val fpC = fp(1, 3)
    val fpn = fp(6, 6) // (3+3)/(3+3) = 0
    val fprior = fp(1, 1) // = 0
    assert(fpB == 0L && fpn == 0L && fprior == 0L)
    def score(fps: Seq[Long]): (Double, Boolean) = {
      val lo = fps.sum - fps.size * fpn + fprior
      (BigDecimal(lo.toDouble / S.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, lo > 0)
    }
    val expect = Map(
      0L -> score(Seq(fpA, fpA, fpB)),
      1L -> score(Seq(fpA, fpC, 0L)), // z: OOV → 0
      2L -> score(Seq(fpB, fpC, fpC)),
      3L -> score(Seq(fpA, fpA, fpA)))
    got.foreach { case (id, n, lo, pred) =>
      assert(n == 3L)
      assert((lo, pred) == expect(id), s"doc $id")
    }
    // floor(ln 3 · S) + floor(-ln 3 · S) = -1: the symmetric doc 1 is
    // strictly (if infinitesimally) negative, never zero
    assert(fpA + fpC == -1L)
    assert(!got.find(_._1 == 1L).get._4)
    assert(got.find(_._1 == 3L).get._4)
  }

  test("held-out accuracy is high on a separable two-dialect corpus") {
    // two dialects over a shared noise vocabulary: positives lean on
    // {good, clean}, negatives on {spam, junk} — mixed with shared
    // words so no single token decides a document
    val shared = Vector("the", "data", "row", "table", "scan", "value")
    def doc(i: Long): (Long, String, String) = {
      val pos = i % 4 < 2 // ids 0,1 mod 4 positive; 2,3 negative
      val cls = if (pos) Vector("good", "clean") else Vector("spam", "junk")
      val words = (0 until 12).map { j =>
        val r = (i * 131 + j * 17) % 3
        if (r == 0) cls(((i + j) % 2).toInt)
        else shared(((i * 7 + j) % shared.size).toInt)
      }
      (i, words.mkString(" "), if (pos) "en" else "xx")
    }
    val d = (0L until 200L).map(doc).toDF("doc_id", "text", "lang")
    val scored = NaiveBayes.scoreBinary(
      d, d.where(col("doc_id") % 2 === 0), "doc_id", "text",
      col("lang") === "en")
      .join(d.select("doc_id", "lang"), "doc_id")
      .where(col("doc_id") % 2 === 1) // held-out half only
      .select(col("lang") === "en", col("pred_pos"))
      .collect().map(r => (r.getBoolean(0), r.getBoolean(1)))
    assert(scored.length == 100)
    val acc = scored.count(x => x._1 == x._2).toDouble / scored.length
    assert(acc >= 0.95, f"held-out accuracy $acc%.3f")
  }

  test("scoreBinaryFp: exact fp log-odds behind scoreBinary's rounding") {
    val rounded = run()
    val fpRows = NaiveBayes.scoreBinaryFp(
      docs, docs.where(col("doc_id") % 2 === 0), "doc_id", "text",
      col("lang") === "en")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(fpRows.map(_._1).toSeq == rounded.map(_._1).toSeq)
    fpRows.zip(rounded).foreach { case ((_, n1, lfp), (_, n2, lo, pp)) =>
      assert(n1 == n2)
      assert(math.rint(lfp.toDouble / S * 1e6) / 1e6 == lo)
      assert((lfp > 0L) == pp)
    }
  }

  test("calibration sweep invariants: counts partition the held-out " +
      "set, recall monotone non-increasing in the threshold") {
    val big = (0L until 200L).map { i =>
      val en = i % 3 != 0
      (i, if (en) "good clean common words here"
          else "zz qq xx junk noise", if (en) "en" else "xx")
    }.toDF("doc_id", "text", "lang")
    val scored = NaiveBayes.scoreBinaryFp(
      big.where(col("doc_id") % 2 =!= 0),
      big.where(col("doc_id") % 2 === 0), "doc_id", "text",
      col("lang") === "en")
      .join(big.select(col("doc_id"), (col("lang") === "en").as("label")),
        "doc_id")
    val nTest = scored.count()
    val rows = (-4L to 4L).map { t =>
      val p = scored.withColumn("pred",
        col("logodds_fp") >= lit(t) * col("n_tokens") * lit(S))
      val tp = p.where(col("pred") && col("label")).count()
      val fpc = p.where(col("pred") && !col("label")).count()
      val tn = p.where(!col("pred") && !col("label")).count()
      val fn = p.where(!col("pred") && col("label")).count()
      assert(tp + fpc + tn + fn == nTest, s"t=$t")
      (t, tp, fn)
    }
    // raising the threshold can only shrink the predicted-positive set
    rows.sliding(2).foreach { case Seq((_, tp1, _), (t2, tp2, _)) =>
      assert(tp2 <= tp1, s"recall rose at threshold $t2")
    }
    // the separable corpus calibrates: at t=0 every doc is correct
    val t0 = rows.find(_._1 == 0L).get
    assert(t0._2 > 0 && t0._3 == 0)
  }
}
