package graft

import graft.operators.BudgetSelect
import graft.text.{GopherRules, TextFunctions}
import org.apache.spark.sql.functions._

/** Round-13 batch: the Gopher rule battery, histogram token-budget
  * selection, and semantic (embedding-cosine) decontamination.
  */
class Round13OpsSpec extends SparkSpec {
  import spark.implicits._

  private def batteryFor(texts: Seq[String]) = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val toks = TextFunctions.tokens(col("text"))
    df.withColumn("g", GopherRules.battery(col("text"), toks))
      .select("id", "g.*").orderBy("id").collect()
  }

  // ------------------------------------------------------- gopher rules

  test("GopherRules: a healthy document passes all five rules") {
    // 60 words, mean length ~4, two 'the's, no symbols, all alphabetic
    val good = (Seq.fill(29)("word") ++ Seq("the", "the") ++
      Seq.fill(29)("text")).mkString(" ")
    val r = batteryFor(Seq(good)).head
    assert(r.getBoolean(1) && r.getBoolean(2) && r.getBoolean(3) &&
      r.getBoolean(4) && r.getBoolean(5) && r.getBoolean(6))
  }

  test("GopherRules: each rule fails on its own violation") {
    val the50 = Seq.fill(25)("the word").mkString(" ") // 50 toks, healthy
    val cases = Seq(
      // too short: 5 words
      "the word the word word",
      // mean word length < 3 (50 × 1-char tokens + stopword balance)
      (Seq.fill(48)("a") ++ Seq("the", "the")).mkString(" "),
      // symbol ratio: 10 hashes over 52 words > 0.1
      the50 + " " + Seq.fill(10)("#").mkString(" "),
      // alpha fraction: 20 numeric of 70 tokens -> 50/70 < 0.8
      the50 + " " + Seq.fill(20)("12345").mkString(" "),
      // no stop-set tokens at all
      Seq.fill(60)("zebra").mkString(" "))
    val rs = batteryFor(cases)
    assert(!rs(0).getBoolean(1), "word count")
    assert(!rs(1).getBoolean(2), "mean word length")
    assert(!rs(2).getBoolean(3), "symbol ratio")
    assert(!rs(3).getBoolean(4), "alpha fraction")
    assert(!rs(4).getBoolean(5), "stopword hits")
    assert(rs.forall(!_.getBoolean(6)), "pass_gopher all false")
  }

  test("GopherRules: empty text fails count/len/alpha/stop, passes symbol") {
    val r = batteryFor(Seq("")).head
    assert(!r.getBoolean(1) && !r.getBoolean(2) && r.getBoolean(3) &&
      !r.getBoolean(4) && !r.getBoolean(5) && !r.getBoolean(6))
  }

  test("GopherRules: ellipsis counts non-overlapping leftmost-first") {
    // '....' = one ellipsis + one stray dot; '......' = two
    val df = Seq("a .... b ......").toDF("text")
    val n = df.select(size(regexp_extract_all(col("text"),
      lit(GopherRules.SymbolRegex), lit(0)))).as[Int].head()
    assert(n === 3)
  }

  // ------------------------------------------------------ budget select

  test("BudgetSelect keeps whole top buckets within the budget") {
    val df = Seq(
      (1L, 0.9, 40L), (2L, 0.9, 40L),  // bucket .9: 80
      (3L, 0.5, 50L),                  // bucket .5: 50 (cum 130)
      (4L, 0.1, 100L))                 // bucket .1: 100 (cum 230)
      .toDF("id", "score", "w")
    // budget = floor(0.6 * 230) = 138: buckets .9 (80) and .5 (130) fit,
    // .1 (230) does not
    val got = BudgetSelect.select(df, "score", "w", 0.6)
      .select("id").as[Long].collect().sorted
    assert(got.toSeq === Seq(1L, 2L, 3L))
    val thr = BudgetSelect.thresholdByBudget(df, "score", "w", 0.6)
      .collect().head
    assert(thr.getDouble(0) === 0.5)
    assert(thr.getLong(1) === 138L && thr.getLong(2) === 230L)
  }

  test("BudgetSelect boundary bucket is forgone, not split") {
    // budget lands inside bucket .5: only bucket .9 is kept whole
    val df = Seq((1L, 0.9, 40L), (2L, 0.5, 50L), (3L, 0.1, 10L))
      .toDF("id", "score", "w")
    // total 100, frac 0.5 -> budget 50: cum(.9)=40 fits, cum(.5)=90 not
    val got = BudgetSelect.select(df, "score", "w", 0.5)
      .select("id").as[Long].collect()
    assert(got.toSeq === Seq(1L))
  }

  test("BudgetSelect selects nothing when the top bucket overflows") {
    val df = Seq((1L, 0.9, 100L), (2L, 0.5, 1L)).toDF("id", "score", "w")
    // budget = floor(0.2 * 101) = 20 < 100
    assert(BudgetSelect.select(df, "score", "w", 0.2).count() === 0)
    assert(BudgetSelect
      .thresholdByBudget(df, "score", "w", 0.2).count() === 0)
  }

  test("BudgetSelect ignores null scores in histogram AND budget base") {
    // nulls are unrankable: they must not shift the running sum (Spark
    // DESC sorts nulls last, DuckDB first) nor inflate the budget base
    val df = Seq((1L, Some(0.9), 40L), (2L, None, 1000L),
      (3L, Some(0.5), 50L)).toDF("id", "score", "w")
    // base = 90 (not 1090); budget = floor(0.5 * 90) = 45: only .9 fits
    val got = BudgetSelect.select(df, "score", "w", 0.5)
      .select("id").as[Long].collect()
    assert(got.toSeq === Seq(1L))
    val thr = BudgetSelect.thresholdByBudget(df, "score", "w", 0.5)
      .collect().head
    assert(thr.getLong(1) === 45L && thr.getLong(2) === 90L)
  }

  test("BudgetSelect rejects a degenerate budget fraction") {
    val df = Seq((1L, 0.9, 1L)).toDF("id", "score", "w")
    intercept[IllegalArgumentException] {
      BudgetSelect.select(df, "score", "w", 0.0)
    }
  }

  // ------------------------------------------------------- epoch mix

  test("Sampling.epochMix replicates by floor(e) + hash fraction") {
    import graft.operators.Sampling
    val df = (1L to 200L).map(i => (i, if (i <= 100) "a" else "b"))
      .toDF("id", "src")
    // a: 2.0 epochs exactly; b: 0 epochs (dropped)
    val got = Sampling.epochMix(df, "id", "src",
      Map("a" -> 2000L, "b" -> 0L))
    assert(got.where(col("src") === "b").count() === 0)
    val a = got.where(col("src") === "a")
    assert(a.count() === 200) // every 'a' row exactly twice
    assert(a.groupBy("id").count().where(col("count") =!= 2)
      .count() === 0)
    assert(a.select("copy").distinct().as[Long].collect().sorted
      .toSeq === Seq(0L, 1L))
    // fractional epochs: expected share within a loose band, and the
    // extra copy is DETERMINISTIC (same rows on every evaluation)
    val half = Sampling.epochMix(df.where(col("src") === "a"),
      "id", "src", Map("a" -> 1500L))
    val n = half.count()
    assert(n > 100 && n < 200)
    assert(half.count() === n)
    // default: unlisted source = one epoch
    val one = Sampling.epochMix(df, "id", "src", Map.empty)
    assert(one.count() === 200 &&
      one.select(max(col("copy"))).as[Long].head() === 0L)
  }

  // ----------------------------------------------------- curriculum

  test("q_curriculum: bands are quartiles, order is band-then-shuffle") {
    val got = SparkEntry.queries("q_curriculum")(
      spark, "/root/testdata/sf0.001").collect()
    assert(got.length === 500)
    // positions are the contiguous 1..n sequence
    assert(got.map(_.getLong(3)).toSeq === (1L to 500L))
    // bands are non-decreasing along the position order, all 4 present
    val bands = got.map(_.getLong(1)).toSeq
    assert(bands.sliding(2).forall(p => p.head <= p.last))
    assert(bands.distinct.sorted === Seq(0L, 1L, 2L, 3L))
    // within a band, order follows (shuffle_key, doc_id)
    got.groupBy(_.getLong(1)).values.foreach { rows =>
      val keys = rows.sortBy(_.getLong(3))
        .map(r => (r.getLong(2), r.getLong(0))).toSeq
      assert(keys === keys.sorted)
    }
  }

  // ------------------------------------------- semantic decontamination

  test("q_decontam_semantic: flags are consistent and self is excluded") {
    val got = SparkEntry.queries("q_decontam_semantic")(
      spark, "/root/testdata/sf0.001").collect()
    assert(got.length === 450) // 500 vectors minus the 50-vector eval set
    got.foreach { r =>
      val cos = r.getDouble(1)
      assert(cos >= -1.0 - 1e-9 && cos <= 1.0 + 1e-9)
      assert(r.getBoolean(2) === (cos >= 0.35))
      assert(r.getLong(0) >= 50L) // eval rows never appear in the output
    }
  }
}
