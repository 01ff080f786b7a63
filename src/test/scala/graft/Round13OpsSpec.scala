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

  // ------------------------------------------- streamed budget histogram

  private lazy val budgetDocs = (1L to 20L)
    .map(i => (i, (i % 7).toDouble / 10, 10L + i % 4))
    .toDF("id", "score", "w")

  private def budgetSel(df: org.apache.spark.sql.DataFrame) =
    df.select("id").as[Long].collect().toSet

  private def streamBudget(nBatches: Int): (String, Set[Long]) = {
    val base = java.nio.file.Files
      .createTempDirectory(s"sbud_$nBatches").toString
    val stateDir = base + "/state"
    val ids = budgetDocs.select("id").collect().map(_.getLong(0)).sorted
    ids.grouped(math.max(1, ids.length / nBatches)).zipWithIndex
      .foreach { case (g, i) =>
        BudgetSelect.applyBatch(spark,
          budgetDocs.where(col("id").isin(g.toSeq: _*)),
          "score", "w", i.toLong, stateDir)
      }
    (base, budgetSel(BudgetSelect.selectFromState(spark, budgetDocs,
      "score", 0.4, stateDir)))
  }

  test("streamed budget selection is batch-count invariant, equals batch") {
    val truth = budgetSel(BudgetSelect.select(budgetDocs, "score", "w", 0.4))
    assert(truth.nonEmpty && truth.size < 20,
      "fixture must make a non-trivial selection")
    for (n <- Seq(1, 3, 7)) {
      val (_, got) = streamBudget(n)
      assert(got == truth,
        s"budget selection diverged from batch at nBatches=$n")
    }
  }

  test("replayed budget batch is a no-op (batch-id watermark)") {
    val (base, before) = streamBudget(3)
    // re-deliver the whole corpus under a stale batch id: the watermark
    // must reject it (histogram addition is not idempotent)
    BudgetSelect.applyBatch(spark, budgetDocs, "score", "w", 0L,
      base + "/state")
    val after = budgetSel(BudgetSelect.selectFromState(spark, budgetDocs,
      "score", 0.4, base + "/state"))
    assert(after == before)
  }

  // ------------------------------------------------------------ cdf ranks

  test("CdfRank: ties share a rank, values hit [1, n], nulls drop") {
    import graft.operators.CdfRank
    val df = Seq(1L -> Some(10L), 2L -> Some(10L), 3L -> Some(5L),
      4L -> Some(20L), 5L -> None).toDF("id", "k")
    val got = CdfRank.withCdf(df, "k", "cdf")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("cdf"))
      .toMap
    // sorted keys: 5 (1 row) -> cdf 1; 10 (2 rows) -> cdf 3; 20 -> cdf 4
    assert(got === Map(3L -> 1L, 1L -> 3L, 2L -> 3L, 4L -> 4L))
  }

  test("CdfRank: cdf count equals the per-row <=-count (property)") {
    import graft.operators.CdfRank
    val keys = Seq(7L, 3L, 3L, 9L, 1L, 7L, 7L, 2L)
    val df = keys.zipWithIndex.map { case (k, i) => (i.toLong, k) }
      .toDF("id", "k")
    val got = CdfRank.withCdf(df, "k", "cdf").collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[Long]("cdf"))
    got.foreach { case (k, c) =>
      assert(c === keys.count(_ <= k).toLong, s"cdf($k)")
    }
  }

  // ------------------------------------------------- token-balanced shards

  test("Shards: contiguous token-balanced cuts, docs never split") {
    import graft.operators.Shards
    val k = 4
    // 40 docs, lengths 1..40 -> total 820, ideal shard ~205 tokens
    val df = (1L to 40L).map(i => (i, i)).toDF("id", "n")
    val got = Shards.assign(df, Seq("id"), "n", k)
      .orderBy("tok_offset").collect()
    assert(got.length === 40)
    // offsets are the exclusive running sum in id order
    var cum = 0L
    got.foreach { r =>
      assert(r.getAs[Long]("tok_offset") === cum)
      cum += r.getAs[Long]("n_tokens")
    }
    // shard ids are nondecreasing along the order (contiguous ranges)
    val shards = got.map(_.getAs[Long]("shard"))
    assert(shards.zip(shards.tail).forall { case (a, b) => a <= b })
    assert(shards.head === 0L && shards.last === (k - 1).toLong)
    // every shard's token total is within one max-doc-length of ideal
    val perShard = got.groupBy(_.getAs[Long]("shard"))
      .view.mapValues(_.map(_.getAs[Long]("n_tokens")).sum).toMap
    val ideal = 820.0 / k
    perShard.values.foreach(t => assert(math.abs(t - ideal) <= 40.0,
      s"shard imbalance: $perShard"))
  }

  test("Shards: trailing zero-weight run clamps into the last shard") {
    import graft.operators.Shards
    // doc 99 has zero tokens and sorts last: its offset equals the
    // total, so the raw division would say shard k — the clamp keeps it
    val df = Seq((1L, 10L), (2L, 10L), (99L, 0L)).toDF("id", "n")
    val got = Shards.assign(df, Seq("id"), "n", 2)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("shard"))
      .toMap
    assert(got(1L) === 0L && got(2L) === 1L && got(99L) === 1L)
  }

  test("Shards: empty input yields empty output, k=1 puts all in shard 0") {
    import graft.operators.Shards
    val empty = Seq.empty[(Long, Long)].toDF("id", "n")
    assert(Shards.assign(empty, Seq("id"), "n", 4).count() === 0)
    val df = Seq((1L, 5L), (2L, 7L)).toDF("id", "n")
    assert(Shards.assign(df, Seq("id"), "n", 1)
      .select("shard").as[Long].collect().toSet === Set(0L))
  }

  test("empty first budget micro-batch does not wedge the stream") {
    val truth = budgetSel(BudgetSelect.select(budgetDocs, "score", "w", 0.4))
    val base = java.nio.file.Files.createTempDirectory("sbud_e").toString
    BudgetSelect.applyBatch(spark, budgetDocs.where(lit(false)),
      "score", "w", 0L, base + "/state")
    BudgetSelect.applyBatch(spark, budgetDocs, "score", "w", 1L,
      base + "/state")
    assert(budgetSel(BudgetSelect.selectFromState(spark, budgetDocs,
      "score", 0.4, base + "/state")) == truth)
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
