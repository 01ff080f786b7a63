package graft

import graft.functions.DetLog
import graft.text.LangIdNb
import org.apache.spark.sql.functions._

/** Pins the trained char-n-gram language identifier two ways:
  * (1) the fixed-point multiclass algebra against an independent
  * plain-Scala replay on a tiny corpus exercising in-vocab, OOV and
  * tie-break paths; (2) held-out accuracy ≥ 0.95 on synthetic corpora
  * with genuinely distinct character distributions — the testdata
  * `lang` column is near-independent of its text (NB there reads
  * ≈ coin-flip), so learning is proven here and the q_langid_trained
  * oracle proves engine parity on the real corpus.
  */
class LangIdNbSpec extends SparkSpec {
  import spark.implicits._

  private val S = LangIdNb.LnScale

  test("char n-grams: positions, short-text guard, empty-doc drop") {
    val got = Seq((0L, "abcd"), (1L, "x"), (2L, ""))
      .toDF("id", "t")
      .select(col("id"), LangIdNb.charNgrams(col("t")).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(0L) == Seq("ab", "bc", "cd"))
    assert(got(1L).isEmpty, "sub-n text must yield NO n-grams (not a " +
      "descending sequence artifact)")
    assert(got(2L).isEmpty)
  }

  test("native char_ngrams kernel is bit-identical to the declarative " +
      "rendering (incl. multi-byte codepoints), at n = 2 and 3") {
    val texts = Seq("", "x", "ab", "abcd", "héllo wörld", "日本語テキスト",
      "a日b語c", "  spaced  out  ", "ab\ncd\te")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
    for (n <- Seq(2, 3)) {
      val both = df.select(col("id"),
        LangIdNb.charNgrams(col("t"), n).as("decl"),
        graft.functions.GraftFunctions
          .charNgrams(spark, col("t"), n).as("native"))
        .collect()
      both.foreach { r =>
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"n=$n id=${r.getLong(0)}: ${r.getSeq[String](1)} vs " +
            s"${r.getSeq[String](2)}")
      }
    }
  }

  test("multiclass scores match the hand-replayed fixed point") {
    // train (even ids): "aab" → en grams {aa, ab}; "bcc" → fr {bc, cc}
    val docs = Seq(
      (0L, "aab", "en"),
      (2L, "bcc", "fr"),
      (1L, "aaz", "en"), // grams {aa, az}: az is OOV
      (3L, "bcc", "fr"))
      .toDF("doc_id", "text", "lang")
    val got = LangIdNb.score(
      docs, docs.where(col("doc_id") % 2 === 0), "doc_id", "text",
      "lang", Seq("en", "fr"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3)))
    // model: vocab {aa, ab, bc, cc}, V=4; N_en=2, N_fr=2; d_en=d_fr=1,
    // D=2
    def fp(a: Long, b: Long): Long =
      math.floor(DetLog.lnRatioRef(a, b) * S).toLong
    val fpOov = Map("en" -> fp(1, 6), "fr" -> fp(1, 6))
    val fprior = Map("en" -> fp(1, 2), "fr" -> fp(1, 2))
    def fpc(c: Long, lang: String): Long = fp(c + 1, 6)
    // doc 0 "aab": grams aa(en:1,fr:0), ab(en:1,fr:0)
    val s0 = Map(
      "en" -> (fpc(1, "en") + fpc(1, "en") + fprior("en")),
      "fr" -> (fpc(0, "fr") + fpc(0, "fr") + fprior("fr")))
    // doc 1 "aaz": aa(1,0), az OOV
    val s1 = Map(
      "en" -> (fpc(1, "en") + fpOov("en") + fprior("en")),
      "fr" -> (fpc(0, "fr") + fpOov("fr") + fprior("fr")))
    def best(m: Map[String, Long]): (String, Double) = {
      val b = m.values.max
      val lang = Seq("en", "fr").find(l => m(l) == b).get
      (lang, BigDecimal(b.toDouble / S.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val expect = Map(0L -> best(s0), 1L -> best(s1))
    for ((id, n, pred, score) <- got.take(2)) {
      assert(n == 2L)
      assert((pred, score) == expect(id), s"doc $id")
    }
    assert(got(0)._3 == "en" && got(1)._3 == "en")
    // fr docs 2,3 ("bcc") must come back fr
    assert(got(2)._3 == "fr" && got(3)._3 == "fr")
  }

  test("degenerate single-class training fails loudly") {
    val docs = Seq((0L, "aa bb", "en"), (2L, "cc dd", "en"),
      (1L, "aa cc", "fr")).toDF("doc_id", "text", "lang")
    val ex = intercept[Exception] {
      LangIdNb.score(docs, docs.where(col("doc_id") % 2 === 0),
        "doc_id", "text", "lang", Seq("en", "fr")).collect()
    }
    def causes(e: Throwable): Seq[Throwable] =
      if (e == null) Nil else e +: causes(e.getCause)
    assert(causes(ex).exists(c =>
      Option(c.getMessage).exists(_.contains("degenerate"))),
      s"expected the degenerate-model guard, got: ${ex.getMessage}")
  }

  // three synthetic "scripts" with disjoint-ish letter inventories
  // plus shared vowels, word lengths 3-7 — char bigrams separate them
  // even though no word repeats verbatim across classes
  private def separableDoc(i: Long): (Long, String, String) = {
    val inventory = Map(
      "aa" -> "bcdfg", "bb" -> "klmnp", "cc" -> "stvwz")
    val cls = Seq("aa", "bb", "cc")(((i % 3).toInt))
    val cons = inventory(cls)
    val words = (0 until 10).map { j =>
      val len = 3 + ((i * 31 + j * 7) % 5).toInt
      (0 until len).map { p =>
        val r = (i * 131 + j * 17 + p * 5) % 6
        if (r < 2) "aeiou".charAt(((i + j + p) % 5).toInt)
        else cons.charAt(((i * 3 + j + p * 11) % 5).toInt)
      }.mkString
    }
    (i, words.mkString(" "), cls)
  }

  test("held-out accuracy >= 0.95 on a separable three-script corpus") {
    val d = (0L until 300L).map(separableDoc).toDF("doc_id", "text", "lang")
    val scored = LangIdNb.score(
      d, d.where(col("doc_id") % 2 === 0), "doc_id", "text", "lang",
      Seq("aa", "bb", "cc"))
      .join(d.select("doc_id", "lang"), "doc_id")
      .where(col("doc_id") % 2 === 1) // held-out half only
      .select(col("lang"), col("lang_pred"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(scored.length == 150)
    val acc = scored.count(x => x._1 == x._2).toDouble / scored.length
    assert(acc >= 0.95, f"held-out accuracy $acc%.3f")
  }

  test("composed langid→CCNet terciles group by the PREDICTION " +
      "(the q_perplexity_buckets_langid semantics, separable corpus)") {
    // the real-corpus oracle proves engine parity; this pins the
    // SEMANTIC claim — predictions drive the grouping, and each
    // predicted-language population splits into nonempty
    // head/middle/tail terciles — on a corpus where language is
    // genuinely learnable from text
    val d = (0L until 300L).map(separableDoc).toDF("doc_id", "text", "lang")
    val train = d.where(col("doc_id") % 2 === 0)
    val pred = LangIdNb.score(
      d, train, "doc_id", "text", "lang", Seq("aa", "bb", "cc"))
      .select(col("doc_id"), col("lang_pred"))
    val docsPred = d.select(col("doc_id"), col("text"))
      .join(pred, "doc_id").localCheckpoint()
    val out = graft.text.PerplexityBuckets.bucket(
      docsPred, train, "doc_id", "text", Seq("lang_pred"))
      .join(d.select(col("doc_id"), col("lang")), "doc_id")
      .select("doc_id", "lang", "lang_pred", "ppl_bucket")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3)))
    // every doc carries >= 1 token and >= 1 char bigram, so none drop
    assert(out.length == 300)
    // the grouping key is the model's prediction, and on this corpus
    // the model is accurate — so the derived groups track truth
    val agree = out.count(x => x._2 == x._3).toDouble / out.length
    assert(agree >= 0.95, f"prediction agreement $agree%.3f")
    // per predicted group: all three bands present, none degenerate
    // (exact tercile counts shift with grid ties — bound, don't pin)
    out.groupBy(_._3).foreach { case (g, rows) =>
      val byBand = rows.groupBy(_._4).view.mapValues(_.size).toMap
      for (b <- Seq("tail", "middle", "head")) {
        val c = byBand.getOrElse(b, 0)
        assert(c >= rows.size / 6,
          s"group $g band $b has $c of ${rows.size} docs")
      }
    }
  }
}
