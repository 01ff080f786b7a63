package graft

import graft.dedup.Dedup
import graft.similarity.VectorFunctions
import graft.text.TextFunctions
import org.apache.spark.sql.functions._

/** Unit tests for the LLM-pipeline extensions: text analysis, dedup, and
  * vector similarity.
  */
class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  private def textDf(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")

  // --- text functions ---

  test("tokens splits on whitespace runs; blank text yields empty array") {
    val df = textDf(1L -> "a  b\tc", 2L -> "   ", 3L -> "")
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("t"))
      .orderBy("doc_id")
    val got = df.collect().map(_.getSeq[String](1).toSeq)
    assert(got(0) == Seq("a", "b", "c"))
    assert(got(1).isEmpty && got(2).isEmpty)
  }

  test("pieceCount splits letter runs, digit runs, and symbols") {
    val df = textDf(1L -> "abc12 de-f!")
      .select(TextFunctions.pieceCount(col("text")).as("n"))
    // abc | 12 | de | - | f | !
    assert(df.head().getInt(0) == 6)
  }

  test("stopwordRatio and avgWordLen on a known sentence") {
    val df = textDf(1L -> "the cat sat on the mat")
      .select(
        TextFunctions.stopwordRatio(col("text")).as("sr"),
        TextFunctions.avgWordLen(col("text")).as("awl"))
    val r = df.head()
    assert(r.getDouble(0) == 3.0 / 6.0) // the, on, the
    assert(r.getDouble(1) == 17.0 / 6.0)
  }

  test("langId picks the language with most marker hits, und when none") {
    val df = textDf(
      1L -> "der hund und die katze",
      2L -> "the cat and a dog",
      3L -> "xyzzy plugh")
      .select(col("doc_id"), TextFunctions.langId(col("text")).as("l"))
      .orderBy("doc_id")
    assert(df.collect().map(_.getString(1)).toSeq ==
      Seq("de", "en", "und"))
  }

  test("fingerprint is invariant to case and whitespace runs") {
    val df = textDf(1L -> "Hello   World", 2L -> "hello world",
      3L -> "different")
      .select(TextFunctions.fingerprint(col("text")).as("fp"))
    val fps = df.collect().map(_.getString(0))
    assert(fps(0) == fps(1) && fps(0) != fps(2))
  }

  test("simHash is equal for identical docs, close for near-identical") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val near = base.replace("kappa", "lambda")
    val far = "completely unrelated words about other topics entirely now"
    val df = textDf(1L -> base, 2L -> base, 3L -> near, 4L -> far)
      .select(col("doc_id"),
        transform(TextFunctions.tokens(col("text")),
          t => TextFunctions.tokenHash60(t)).as("hs"))
      .select(col("doc_id"),
        TextFunctions.simHashFromHashes(col("hs")).as("h"))
      .orderBy("doc_id")
    val hs = df.collect().map(_.getLong(1))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hs(0) == hs(1))
    assert(ham(hs(0), hs(2)) < ham(hs(0), hs(3)))
  }

  // --- dedup ---

  test("shinglesFromTokens emits k-grams; short docs collapse to one") {
    val df = textDf(1L -> "a b c d", 2L -> "a b")
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("w"))
      .select(col("doc_id"),
        Dedup.shinglesFromTokens(col("w"), 3).as("s"))
      .orderBy("doc_id")
    val got = df.collect().map(_.getSeq[String](1).toSeq)
    assert(got(0) == Seq("a b c", "b c d"))
    assert(got(1) == Seq("a b"))
  }

  test("exactDedup groups case/space variants and keeps the min id") {
    val df = textDf(1L -> "Same Doc", 2L -> "same   doc", 3L -> "other")
    val got = Dedup.exactDedup(df, "text", "doc_id")
      .orderBy("keep_id").collect()
    assert(got.map(r => (r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 2L), (3L, 1L)))
  }

  test("jaccardPairs finds exactly the overlapping pair above threshold") {
    val df = textDf(
      1L -> "one two three four five six",
      2L -> "one two three four five seven",
      3L -> "totally different words here again")
    val got = Dedup.jaccardPairs(df, "text", "doc_id", 0.3)
      .orderBy("doc_a", "doc_b").collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 2L)))
    // |A|=|B|=4 shingles, 3 shared → 3/5
    assert(got.head.getDouble(2) == 3.0 / 5.0)
  }

  test("prefix-filtered jaccardPairs equals the plain inverted-index join") {
    val docs = (0L until 10L).map(i =>
      i -> ("common words shared by every doc here plus alpha beta gamma " +
        s"delta epsilon zeta unique$i tail$i"))
    val df = textDf(docs: _*)
    def pairs(r: org.apache.spark.sql.DataFrame) =
      r.select("doc_a", "doc_b", "jaccard").collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSet
    val plain = pairs(Dedup.jaccardPairs(df, "text", "doc_id", 0.5))
    val prefix = pairs(Dedup.jaccardPairsPrefix(df, "text", "doc_id", 0.5))
    assert(prefix == plain)
    assert(plain.nonEmpty)
  }

  test("minHashPairs agrees with exact jaccardPairs on a small corpus") {
    // 13 shared tokens + 1 per-doc variant at the end → pairwise
    // jaccard 11/13 ≈ 0.85, squarely inside the LSH recall zone
    val docs = (0L until 8L).map(i =>
      i -> ("shared prefix words alpha beta gamma delta epsilon zeta " +
        s"eta theta iota kappa variant$i"))
    val df = textDf(docs: _*)
    val exact = Dedup.jaccardPairs(df, "text", "doc_id", 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minHashPairs(df, "text", "doc_id", 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact)
    assert(exact.nonEmpty)
  }

  test("simHashPairs finds duplicate pairs, not unrelated ones") {
    // exact duplicates guarantee Hamming 0; one changed token in a short
    // doc can flip many margin bits, so the near-dup doc only must not
    // pair with the unrelated doc
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val df = textDf(
      1L -> base,
      2L -> base,
      3L -> ("entirely different content with other vocabulary only chi " +
        "psi omega words padding filler tokens more noise stuff here"))
    val got = Dedup.simHashPairs(df, "text", "doc_id", maxHamming = 3)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 2L)))
  }

  test("connectedComponents resolves transitive chains to min-id clusters") {
    import spark.implicits._
    // chain 1-2-3-4 (diameter 3, forces real propagation), pair 10-11,
    // duplicate + reversed edges must not matter
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (3L, 2L), (11L, 10L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L),
      (10L, 10L), (11L, 10L)))
  }

  test("connectedComponents handles a long chain within the round budget") {
    import spark.implicits._
    // 64-node chain: hash-min alone needs 63 rounds; with pointer
    // jumping it must settle inside the default 25
    val pairs = (0L until 63L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
      .agg(countDistinct(col("comp")), count(lit(1))).collect().head
    assert((got.getLong(0), got.getLong(1)) == (1L, 64L))
  }

  test("signature kernel matches the Column expression rendering") {
    val df = textDf(
      1L -> "one two three four five six seven eight",
      2L -> "alpha beta gamma delta epsilon zeta")
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("w"))
      .select(col("doc_id"), Dedup.shinglesFromTokens(col("w"), 3).as("s"))
      .withColumn("hs",
        transform(col("s"), g => TextFunctions.tokenHash60(g)))
      .withColumn("bands", Dedup.bandKeys(Dedup.minHashSignature(col("hs"))))
    val rows = df
      .withColumn("bands_native", graft.functions.GraftFunctions
        .minHashBandKeys(spark, col("s")))
      .orderBy("doc_id").collect()
    rows.foreach { r =>
      val viaColumns = r.getSeq[String](r.fieldIndex("bands")).toSeq
      val viaNative = r.getSeq[String](r.fieldIndex("bands_native")).toSeq
      val viaKernel = Dedup.signatureBandKeys(
        r.getSeq[String](r.fieldIndex("s")).toSeq)
      assert(viaKernel == viaColumns)
      assert(viaNative == viaColumns)
    }
  }

  test("shingle kernel matches the declarative rendering, edge cases included") {
    // empty, space-only, tab-led (leading empty token), trailing tab
    // (trailing empty token), shorter-than-k, repeated grams, unicode
    val texts = Seq("", "   ", "\tone two three", "one two three\t",
      "one two", "a b c a b c a b c", "ünï cödé tëst wörds",
      "one  two\n three\tfour five")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val rows = df
      .withColumn("via_cols", Dedup.shinglesFromTokens(
        TextFunctions.tokens(col("text")), 3))
      .withColumn("via_kernel", graft.functions.GraftFunctions
        .shinglesK(spark, col("text"), 3))
      .orderBy("doc_id").collect()
    rows.foreach { r =>
      assert(r.getSeq[String](r.fieldIndex("via_kernel"))
        == r.getSeq[String](r.fieldIndex("via_cols")),
        s"diverged on ${r.get(r.fieldIndex("doc_id"))}")
    }
  }

  test("word_ngrams kernel matches ngrams(tokens(text), n), edge cases") {
    // empty, space-only, tab-led (leading empty token), shorter-than-n
    // (EMPTY, not whole-text — the ngrams convention), repeats kept,
    // unicode, mixed whitespace
    val texts = Seq("", "   ", "\tone two three", "one two three\t",
      "one two", "a b a b a b", "ünï cödé tëst wörds",
      "one  two\n three\tfour five")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    for (n <- 1 to 3) {
      val rows = df
        .withColumn("via_cols", TextFunctions.ngrams(
          TextFunctions.tokens(col("text")), n))
        .withColumn("via_kernel", graft.functions.GraftFunctions
          .wordNgrams(spark, col("text"), n))
        .orderBy("doc_id").collect()
      rows.foreach { r =>
        assert(r.getSeq[String](r.fieldIndex("via_kernel"))
          == r.getSeq[String](r.fieldIndex("via_cols")),
          s"n=$n diverged on ${r.get(r.fieldIndex("doc_id"))}")
      }
    }
  }

  test("md5Hash60 kernel matches the tokenHash60 expression") {
    val words = Seq("alpha", "beta", "gamma delta", "", "ünïcödé")
    val viaExpr = words.toDF("w")
      .select(TextFunctions.tokenHash60(col("w")).as("h"))
      .collect().map(_.getLong(0)).toSeq
    assert(words.map(TextFunctions.md5Hash60) == viaExpr)
  }

  test("simHash kernel matches the Column expression rendering") {
    val texts = Seq("one two three four five", "alpha beta gamma",
      "x", "")
    val viaExpr = texts.toDF("t")
      .withColumn("hs",
        transform(TextFunctions.tokens(col("t")),
          w => TextFunctions.tokenHash60(w)))
      .select(TextFunctions.simHashFromHashes(col("hs")))
      .collect().map(_.getLong(0)).toSeq
    val viaKernel = texts.map(t =>
      TextFunctions.simHashKernel(
        t.trim.split("\\s+").toSeq.filter(_.nonEmpty)))
    assert(viaKernel == viaExpr)
  }

  // --- vectors ---

  test("dot, norm, and cosine compute exact known values") {
    val df = Seq((Array(1.0f, 2.0f, 2.0f), Array(2.0f, 0.0f, 0.0f)))
      .toDF("a", "b")
      .select(
        VectorFunctions.dot(col("a"), col("b")).as("d"),
        VectorFunctions.norm(col("a")).as("na"),
        VectorFunctions.cosine(col("a"), col("b")).as("c"))
    val r = df.head()
    assert(r.getDouble(0) == 2.0)
    assert(r.getDouble(1) == 3.0)
    assert(math.abs(r.getDouble(2) - 2.0 / 6.0) < 1e-15)
  }

  test("cosineKernel is bit-identical to the Column cosine") {
    val vecs = (0 until 5).map(i =>
      (i.toLong, Array.tabulate(16)(j => (math.sin(i * 16 + j) * 0.3).toFloat)))
    val df = vecs.toDF("id", "v")
    val pairs = df.toDF("id_a", "va").crossJoin(df.toDF("id_b", "vb"))
      .where(col("id_a") < col("id_b"))
    val exprVals = pairs.select(
      VectorFunctions.cosine(col("va"), col("vb")).as("c"))
      .collect().map(_.getDouble(0)).toSeq
    val kernelVals = pairs.select(
      VectorFunctions.cosineKernel(col("va"), col("vb")).as("c"))
      .collect().map(_.getDouble(0)).toSeq
    assert(exprVals == kernelVals) // exact, not approximate
  }

  test("native cosine_sim expression matches Column cosine bit-exactly") {
    val vecs = (0 until 6).map(i =>
      (i.toLong, Array.tabulate(32)(j => (math.cos(i * 32 + j) * 0.4).toFloat)))
    val df = vecs.toDF("id", "v")
    val pairs = df.toDF("id_a", "va").crossJoin(df.toDF("id_b", "vb"))
      .where(col("id_a") < col("id_b"))
    val exprVals = pairs.select(
      VectorFunctions.cosine(col("va"), col("vb")).as("c"))
      .collect().map(_.getDouble(0)).toSeq
    val nativeVals = pairs.select(
      graft.functions.GraftFunctions.cosineSim(spark, col("va"), col("vb"))
        .as("c"))
      .collect().map(_.getDouble(0)).toSeq
    assert(nativeVals == exprVals)
    // and through SQL after registration
    graft.functions.GraftFunctions.register(spark)
    df.createOrReplaceTempView("vec_test")
    val viaSql = spark.sql(
      """SELECT cosine_sim(a.v, b.v) FROM vec_test a JOIN vec_test b
        |ON a.id < b.id ORDER BY a.id, b.id""".stripMargin)
      .collect().map(_.getDouble(0)).toSeq
    assert(viaSql.size == exprVals.size)
  }

  test("planeBandKeys yields 4 bands of 4 bits each") {
    val v = Array.fill(VectorFunctions.Dim)(0.5f)
    val df = Seq(Tuple1(v)).toDF("e")
      .select(VectorFunctions.planeBandKeys(col("e")).as("k"))
    val keys = df.head().getSeq[String](0)
    assert(keys.length == VectorFunctions.NumPlaneBands)
    assert(keys.forall(k => k.length == VectorFunctions.PlaneBandBits &&
      k.forall(c => c == '0' || c == '1')))
  }

  test("ngrams keep repeats and repetition fractions are exact") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq("a b a b a b", "x y z", "a").toDF("text")
    val got = df.select(graft.text.TextFunctions.ngrams(
      graft.text.TextFunctions.tokens(col("text")), 2).as("g"))
      .collect().map(_.getSeq[String](0))
    assert(got(0) == Seq("a b", "b a", "a b", "b a", "a b"))
    assert(got(1) == Seq("x y", "y z"))
    assert(got(2) == Seq())
  }

  // ----------------------------------------------------------- pii redact

  test("pii redaction order: emails before digit runs, phones bounded") {
    import graft.text.PiiRedact
    val df = Seq(
      "mail 12345678@x.org now",       // numeric local part stays an EMAIL
      "id 000123456 call 25-989-741-2988 end",
      "ok 12-345 x1234",               // too-short digit runs untouched
      "a@b.io").toDF("t")
    val got = df.select(PiiRedact.redactPii(col("t"))).collect()
      .map(_.getString(0))
    assert(got(0) === "mail [EMAIL] now")
    assert(got(1) === "id [NUM] call [PHONE] end")
    assert(got(2) === "ok 12-345 x1234")
    assert(got(3) === "[EMAIL]")
  }

  // ----------------------------------------------------------- vocabulary

  test("vocabulary counts tf/df and topK ranks by frequency then term") {
    import graft.text.Vocabulary
    val docs = Seq((1L, "a a b"), (2L, "a c"), (3L, "")).toDF("id", "text")
    val v = Vocabulary.vocabulary(docs, "id", "text")
      .orderBy("term").collect()
    assert(v.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      === Seq(("a", 3L, 2L), ("b", 1L, 1L), ("c", 1L, 1L)))
    val top = Vocabulary.topK(Vocabulary.vocabulary(docs, "id", "text"), 2)
      .orderBy("rank").collect()
    assert(top.map(_.getString(0)).toSeq === Seq("a", "b")) // b < c tie
  }

  test("lmScore is order-independent and favors common-word documents") {
    import graft.text.Vocabulary
    val docs = Seq((1L, "a a a a"), (2L, "a rare"), (3L, "a a rare2"))
      .toDF("id", "text")
    val base = Vocabulary.lmScore(docs, "id", "text")
      .orderBy("id").collect()
    // doc 1 (all common) scores above doc 2 (half rare)
    assert(base(0).getDouble(2) > base(1).getDouble(2))
    val shuffled = Vocabulary.lmScore(
      docs.orderBy(col("id").desc).repartition(7), "id", "text")
      .orderBy("id").collect()
    assert(shuffled.map(_.getDouble(2)).toSeq ===
      base.map(_.getDouble(2)).toSeq)
  }

  // -------------------------------------------------------------- cleaner

  test("cleaner strips tags then urls then collapses whitespace") {
    import graft.text.Cleaner
    val df = Seq(
      "<div class=\"x\">keep <b>this</b></div>  see https://a.io/p?q=1 end",
      "plain   text",
      "<a href=\"https://b.io\">link</a>").toDF("t")
    val got = df.select(Cleaner.clean(col("t"))).collect()
      .map(_.getString(0))
    assert(got(0) === "keep this see end")
    assert(got(1) === "plain text")
    assert(got(2) === "link") // url inside the tag dies with the tag
  }

  // --------------------------------------------------------- collocations

  test("collocations rank always-paired bigrams above independent ones") {
    import graft.text.Collocations
    // "alpha beta" always adjacent; "x"/"y" co-occur only incidentally
    val docs = (1 to 10).map(i => (i.toLong, "alpha beta x y x y"))
      .toDF("id", "text")
    val out = Collocations.topCollocations(docs, "text", k = 3,
      minCount = 5).orderBy("rank").collect()
    assert(out.head.getString(1) === "alpha beta",
      s"expected 'alpha beta' first: ${out.toSeq}")
    // PMI of the always-paired bigram beats the frequent-word pair
    val pmis = out.map(r => r.getString(1) -> r.getDouble(5)).toMap
    assert(pmis("alpha beta") > pmis.getOrElse("x y", Double.MinValue))
  }

  // ------------------------------------------------------ count-min sketch

  test("count-min estimates never undercount and the grid stays bounded") {
    import graft.functions.CountMinSketch
    val r = new scala.util.Random(3)
    val terms = (1 to 2000).map(_ => s"t${r.nextInt(50)}").toDF("term")
    val sk = CountMinSketch.sketch(terms, "term")
    assert(sk.count() <= CountMinSketch.Depth * CountMinSketch.Width)
    val exact = terms.groupBy("term").count()
    val probes = (0 until 50).map(i => s"t$i").toDF("term")
    val est = CountMinSketch.estimate(sk, probes, "term")
      .join(exact, Seq("term"), "left").na.fill(0L)
    val bad = est.where(col("cms_est") < col("count")).count()
    assert(bad === 0, "CMS must never undercount")
    // unseen terms estimate small (collisions only)
    val unseen = CountMinSketch.estimate(sk,
      Seq("zz_never").toDF("term"), "term").head().getLong(1)
    assert(unseen < 100)
  }

  test("Bm25.topK matches a hand-computed reference ranking") {
    import graft.text.Bm25
    val docs = Seq(
      (1L, "spark spark join window"),   // tf(spark)=2, dl=4
      (2L, "spark table scan"),          // tf(spark)=1, dl=3
      (3L, "window window window join"), // no 'spark', tf(window)=3
      (4L, "table scan filter value"))   // no query terms
      .toDF("doc_id", "text")
    val got = Bm25.topK(docs, "doc_id", "text", Seq("spark", "window"),
      k = 4).collect().map(r => (r.getLong(0), r.getLong(1)))
    // reference computation in plain Scala (same association)
    val dls = Map(1L -> 4L, 2L -> 3L, 3L -> 4L, 4L -> 4L)
    val nDocs = 4.0; val tot = 15.0
    def idf(df: Long) = // deterministic log, same DAG as the engine
      graft.functions.DetLog.lnRatioRef(2L * 4 - 2 * df + 1, 2 * df + 1)
    def c(tf: Long, df: Long, dl: Long): Long =
      math.floor(idf(df) * (tf * Bm25.K1Plus1) /
        (tf + Bm25.K1 * (Bm25.OneMinusB + Bm25.B * dl * nDocs / tot)) *
        Bm25.Scale).toLong
    val want = Map(
      1L -> (c(2, 2, dls(1)) + c(1, 2, dls(1))), // spark + window
      2L -> c(1, 2, dls(2)),                     // spark only
      3L -> c(3, 2, dls(3)))                     // window only
      .toSeq.sortBy { case (id, s) => (-s, id) }
    assert(got.toSeq === want)
    assert(!got.map(_._1).contains(4L)) // no query terms → unscored
  }

  test("repetition_stats kernel is bit-identical to the fold rendering") {
    import graft.text.TextFunctions.{maxRunLength, ngrams, tokens}
    val r = new scala.util.Random(11)
    val vocab = Seq("a", "bb", "ccc", "dd", "e")
    val docs = (0L until 80L).map { i =>
      val n = r.nextInt(12) // includes 0-, 1- and 2-token docs
      (i, Seq.fill(n)(vocab(r.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val b = ngrams(col("__w"), 2)
    val t = ngrams(col("__w"), 3)
    val declarative = docs.withColumn("__w", tokens(col("text")))
      .select(col("doc_id"),
        when(size(b) > 0, maxRunLength(array_sort(b)).cast("double")
          / size(b)).otherwise(0.0).as("top2_frac"),
        when(size(t) > 0,
          (size(t) - size(array_distinct(t))).cast("double") / size(t))
          .otherwise(0.0).as("dup3_frac"))
      .orderBy("doc_id").collect()
    val native = docs.withColumn("__rs",
        graft.functions.GraftFunctions.repetitionStats(
          spark, tokens(col("text"))))
      .select(col("doc_id"), col("__rs.top2_frac").as("top2_frac"),
        col("__rs.dup3_frac").as("dup3_frac"))
      .orderBy("doc_id").collect()
    assert(native.toSeq === declarative.toSeq)
  }

  test("DetLog.lnInt is bit-identical to the Scala reference and ~ln") {
    import graft.functions.DetLog
    import org.apache.spark.sql.functions._
    val r = new scala.util.Random(7)
    val ms = (Seq(1L, 2L, 3L, 4L, 7L, 8L, (1L << 40) - 1, 1L << 40,
      Long.MaxValue) ++ Seq.fill(200)(1L + (r.nextLong() & Long.MaxValue)))
      .distinct
    val got = ms.toDF("m").select(col("m"), DetLog.lnInt(col("m")).as("l"))
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    ms.foreach { m =>
      // EXACT bit equality Column vs plain-Scala rendering
      assert(java.lang.Double.doubleToLongBits(got(m)) ===
        java.lang.Double.doubleToLongBits(DetLog.lnIntRef(m)), s"m=$m")
      // and the approximation really is ln to ~1e-9 absolute
      assert(math.abs(got(m) - math.log(m.toDouble)) < 2e-9, s"m=$m")
    }
  }

  test("repetition_stats does not alias grams across space-bearing tokens") {
    import org.apache.spark.sql.functions._
    // With a ' ' gram separator the bigrams ('a b','c') and ('a','b c')
    // would both render "a b c" and count as a repeat; the NUL separator
    // keeps them distinct for arbitrary (non-whitespace-split) callers.
    val df = Seq(Tuple1(Seq("a b", "c", "a", "b c"))).toDF("w")
    val got = df.select(graft.functions.GraftFunctions
        .repetitionStats(spark, col("w")).as("rs"))
      .select(col("rs.top2_frac"), col("rs.dup3_frac")).head()
    assert(got.getDouble(0) === 1.0 / 3) // all 3 bigrams distinct
    assert(got.getDouble(1) === 0.0)     // both trigrams distinct
  }

  test("Bpe.trainMerges equals the naive reference, self-pairs included") {
    import graft.text.Bpe
    // plain-Scala reference BPE (greedy left-to-right application)
    def refBpe(words: Map[String, Long], k: Int)
        : Seq[(String, String, Long)] = {
      val vocab = scala.collection.mutable.Map(
        words.keys.map(w => w -> w.map(_.toString).toVector).toSeq: _*)
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(String, String, Long)]
      var r = 0
      var done = false
      while (r < k && !done) {
        val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
        for ((w, toks) <- vocab; i <- 0 until toks.size - 1) {
          val p = (toks(i), toks(i + 1))
          pairs(p) = pairs.getOrElse(p, 0L) + words(w)
        }
        if (pairs.isEmpty) done = true
        else {
          val m = pairs.values.max
          val (a, b) = pairs.collect { case (p, v) if v == m => p }
            .toSeq.sorted.head
          out += ((a, b, m))
          for ((w, toks) <- vocab) {
            val merged = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < toks.size) {
              if (i < toks.size - 1 && toks(i) == a && toks(i + 1) == b) {
                merged += a + b; i += 2
              } else { merged += toks(i); i += 1 }
            }
            vocab(w) = merged.toVector
          }
          r += 1
        }
      }
      out.toSeq
    }
    // the aaaa/aaab words force the self-pair run-parity path; banana
    // forces repeated non-adjacent pairs
    val words = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L,
      "widest" -> 3L, "aaaa" -> 4L, "aaab" -> 2L, "banana" -> 3L)
    val df = words.toSeq.toDF("w", "cnt")
    val got = Bpe.trainMerges(spark, df, 6)
      .map(m => (m.left, m.right, m.wt))
    assert(got == refBpe(words, 6),
      s"trained merges diverge: got $got want ${refBpe(words, 6)}")
    // more merges than trainable pairs: stops when exhausted
    val tiny = Seq(("ab", 1L)).toDF("w", "cnt")
    assert(Bpe.trainMerges(spark, tiny, 10).size == 1)
    // encode applies merges in rank order with the same greedy rule:
    // (a,a) then (aa,aa) turns aaaa into ONE token, aaab into three
    val ms = Seq(Bpe.Merge(1, "a", "a", "aa", 0),
      Bpe.Merge(2, "aa", "aa", "aaaa", 0))
    val enc = Bpe.encode(
      Seq(("aaaa", 1L), ("aaab", 1L), ("ba", 1L)).toDF("w", "cnt"), ms)
      .select("w", "toks").as[(String, Seq[String])].collect().toMap
    assert(enc("aaaa") == Seq("aaaa"))
    assert(enc("aaab") == Seq("aa", "a", "b"))
    assert(enc("ba") == Seq("b", "a"))
  }

  test("Bpe driver-local trainer is bit-parity with the distributed one") {
    import graft.text.Bpe
    // self-pair runs, tie-broken counts, and multi-byte UTF-8 tokens —
    // the tie-break must agree under UTF-8 byte order, not UTF-16
    val words = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L,
      "widest" -> 3L, "aaaa" -> 4L, "aaab" -> 2L, "banana" -> 3L,
      "ábaá" -> 3L, "zzyy" -> 6L)
    val df = words.toSeq.toDF("w", "cnt")
    val local = Bpe.trainMerges(spark, df, 8)
    val dist = Bpe.trainMergesDistributed(spark, df, 8)
    assert(local == dist, s"local $local vs distributed $dist")
  }

  test("trainMerges vocab gate: over-gate vocab switches to the " +
      "distributed trainer automatically, values identical") {
    import graft.text.{Bpe, WordPiece}
    val words = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L,
      "widest" -> 3L, "banana" -> 3L).toSeq.toDF("w", "cnt")
    // under the gate: driver-local path
    val underB = Bpe.trainMerges(spark, words, 5, maxLocalVocab = 100L)
    assert(Bpe.lastTrainPath == "local")
    // over the gate (5 distinct words > 3): automatic distributed path
    val overB = Bpe.trainMerges(spark, words, 5, maxLocalVocab = 3L)
    assert(Bpe.lastTrainPath == "distributed")
    assert(underB == overB)
    val underW = WordPiece.trainMerges(spark, words, 5,
      maxLocalVocab = 100L)
    assert(Bpe.lastTrainPath == "local")
    val overW = WordPiece.trainMerges(spark, words, 5, maxLocalVocab = 3L)
    assert(Bpe.lastTrainPath == "distributed")
    assert(underW == overW)
  }

  test("trainMerges BYTE gate: a long-word vocab (few rows, big " +
      "strings — the URL-shaped corpus) trips the byte budget even " +
      "when the row count passes, values identical") {
    import graft.text.{Bpe, WordPiece}
    // 6 rows but ~6 KB of word payload: a row-count gate alone says
    // "local"; the byte estimate must not
    val longWords = (0 until 6).map { i =>
      (("ab" + ('c' + i).toChar).toString * 400, (i + 1).toLong)
    }.toDF("w", "cnt")
    val overB = Bpe.trainMerges(spark, longWords, 4,
      maxLocalVocab = 100L, maxLocalBytes = 1024L)
    assert(Bpe.lastTrainPath == "distributed",
      "byte budget must fire at a legal row count")
    val underB = Bpe.trainMerges(spark, longWords, 4,
      maxLocalVocab = 100L)
    assert(Bpe.lastTrainPath == "local")
    assert(overB == underB)
    val overW = WordPiece.trainMerges(spark, longWords, 4,
      maxLocalVocab = 100L, maxLocalBytes = 1024L)
    assert(Bpe.lastTrainPath == "distributed")
    val underW = WordPiece.trainMerges(spark, longWords, 4,
      maxLocalVocab = 100L)
    assert(Bpe.lastTrainPath == "local")
    assert(overW == underW)
  }

  test("Bpe.trainMergesLocal trains k>=1000 merges in seconds") {
    import graft.text.Bpe
    // deterministic synthetic vocab: 3000 words over a 26-letter
    // alphabet, enough pair mass for >1000 distinct merges
    val rnd = new scala.util.Random(42)
    val words = (0 until 3000).map { i =>
      val len = 6 + rnd.nextInt(10)
      val w = (0 until len).map(_ => ('a' + rnd.nextInt(26)).toChar)
        .mkString
      (w + i.toString, 1L + rnd.nextInt(50).toLong)
    }
    val t0 = System.nanoTime()
    val merges = Bpe.trainMergesLocal(words, 1000)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(merges.size == 1000, s"trained ${merges.size}")
    assert(merges.map(_.rank) == (1L to 1000L))
    // ranks weakly usable: every merge's pair was live when chosen
    assert(merges.forall(_.wt >= 1L))
    assert(secs < 60.0, f"local BPE trainer took $secs%.1fs for k=1000")
  }
}
