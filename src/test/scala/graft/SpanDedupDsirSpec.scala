package graft

import graft.dedup.SpanDedup
import graft.text.Dsir
import org.apache.spark.sql.functions._

/** Unit tests for the round-8 corpus-prep additions: exact substring-span
  * dedup (Lee et al. 2022 style) and DSIR importance resampling
  * (Xie et al. 2023).
  */
class SpanDedupDsirSpec extends SparkSpec {
  import spark.implicits._

  // ---- span dedup -------------------------------------------------------

  private def docs(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "text")

  private def gram(n: Int, tag: String = "t"): String =
    (1 to n).map(i => s"$tag$i").mkString(" ")

  test("spanStats: disjoint corpora have zero duplicated spans") {
    val df = docs(1L -> gram(12, "a"), 2L -> gram(12, "b"))
    val got = SpanDedup.spanStats(df, "text", "doc_id").orderBy("doc_id")
      .collect()
    assert(got.map(_.getLong(2)).toSeq == Seq(0L, 0L))
    assert(got.map(_.getLong(1)).toSeq == Seq(12L, 12L)) // n_tokens
  }

  test("spanStats: a shared w-token run is found in both documents") {
    val shared = gram(10, "s")
    val df = docs(
      1L -> s"${gram(5, "a")} $shared ${gram(5, "b")}",
      2L -> s"${gram(5, "c")} $shared ${gram(5, "d")}")
    val got = SpanDedup.spanStats(df, "text", "doc_id").orderBy("doc_id")
      .collect()
    // exactly the 10 shared tokens are covered, one span each
    got.foreach { r =>
      assert(r.getLong(1) == 20L)
      assert(r.getLong(2) == 10L)   // dup_tokens
      assert(r.getLong(3) == 1L)    // dup_spans
      assert(r.getDouble(4) == 0.5) // dup_frac
    }
  }

  test("spanStats: overlapping duplicated grams merge into one span") {
    // doc 2 repeats the first 12 tokens of doc 1: grams at positions
    // 1..3 are duplicated in both, and their union is one 12-token span
    val run = gram(12, "s")
    val df = docs(1L -> s"$run ${gram(6, "x")}", 2L -> run)
    val got = SpanDedup.spanStats(df, "text", "doc_id").orderBy("doc_id")
      .collect()
    assert(got(0).getLong(2) == 12L && got(0).getLong(3) == 1L)
    assert(got(1).getLong(2) == 12L && got(1).getLong(3) == 1L)
  }

  test("spanStats: within-document repetition counts as duplication") {
    val run = gram(10, "r")
    val df = docs(1L -> s"$run ${gram(4, "x")} $run")
    val got = SpanDedup.spanStats(df, "text", "doc_id").collect()
    // both copies of the run are covered → 20 tokens, 2 spans
    assert(got(0).getLong(2) == 20L && got(0).getLong(3) == 2L)
  }

  test("spanStats: documents shorter than w have no grams and score 0") {
    val df = docs(1L -> gram(5, "a"), 2L -> "", 3L -> gram(5, "a"))
    val got = SpanDedup.spanStats(df, "text", "doc_id").orderBy("doc_id")
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) == 0L && r.getDouble(4) == 0.0)
    }
  }

  test("spanStats: disjoint duplicated runs yield two merged spans") {
    val r1 = gram(10, "p")
    val r2 = gram(10, "q")
    val df = docs(
      1L -> s"$r1 ${gram(5, "x")} $r2",
      2L -> r1, 3L -> r2)
    val got = SpanDedup.spanStats(df, "text", "doc_id").orderBy("doc_id")
      .collect()
    assert(got(0).getLong(2) == 20L && got(0).getLong(3) == 2L)
  }

  // ---- span removal -----------------------------------------------------

  test("removeSpans: the earliest doc keeps its copy, later docs lose it") {
    val shared = gram(10, "s")
    val df = docs(
      1L -> s"${gram(5, "a")} $shared",
      2L -> s"$shared ${gram(5, "b")}",
      3L -> gram(8, "c"))
    val got = graft.dedup.SpanDedup.removeSpans(df, "text", "doc_id")
      .orderBy("doc_id").collect()
    assert(got(0).getLong(2) == 15L) // keeper: everything survives
    assert(got(0).getString(3) == s"${gram(5, "a")} $shared")
    assert(got(1).getLong(2) == 5L)  // the shared run is cut
    assert(got(1).getString(3) == gram(5, "b"))
    assert(got(2).getLong(2) == 8L)  // untouched doc
  }

  test("removeSpans: within-doc repetition is NOT cut (single doc)") {
    val run = gram(10, "r")
    val df = docs(1L -> s"$run $run")
    val got = graft.dedup.SpanDedup.removeSpans(df, "text", "doc_id")
      .collect()
    assert(got(0).getLong(2) == 20L)
  }

  test("removeSpans: empty documents clean to empty") {
    val got = graft.dedup.SpanDedup.removeSpans(
      docs(1L -> ""), "text", "doc_id").collect()
    assert(got(0).getLong(1) == 0L && got(0).getString(3) == "")
  }

  // ---- DSIR -------------------------------------------------------------

  private def langDocs(rows: (Long, String, String)*) =
    rows.toSeq.toDF("doc_id", "text", "lang")

  test("dsir: target-typical documents score above raw-typical ones") {
    // target (en) slice is all about "good"; raw background about "junk"
    val rows = (1L to 8L).map(i => (i, "good clean text", "en")) ++
      (9L to 16L).map(i => (i, "junk spam noise", "zz"))
    val w = Dsir.importanceWeights(langDocs(rows: _*), "doc_id", "text",
      col("lang") === "en").orderBy("doc_id").collect()
    val enW = w.take(8).map(_.getDouble(2))
    val zzW = w.drop(8).map(_.getDouble(2))
    assert(enW.forall(x => zzW.forall(_ < x)))
    assert(w.take(8).forall(_.getBoolean(3)))  // selected
    assert(w.drop(8).forall(!_.getBoolean(3)))
  }

  test("dsir: every document gets a row; empty docs score exactly 0") {
    val w = Dsir.importanceWeights(
      langDocs((1L, "alpha beta", "en"), (2L, "", "zz")),
      "doc_id", "text", col("lang") === "en").orderBy("doc_id").collect()
    assert(w.length == 2)
    assert(w(1).getLong(1) == 0L && w(1).getDouble(2) == 0.0)
    assert(!w(1).getBoolean(3))
  }

  test("dsir: weight equals the snapped closed form on a tiny corpus") {
    import graft.functions.DetLog.lnIntRef
    val S = Dsir.LnScale
    val B = Dsir.NumBuckets
    // one doc, one token → one unigram feature in some bucket b:
    // cr[b] = 1, ct[b] = 1 (the doc IS the target), tot_r = tot_t = 1
    val w = Dsir.importanceWeights(langDocs((1L, "solo", "en")),
      "doc_id", "text", col("lang") === "en").collect()
    val lw = math.floor(lnIntRef(2) * S).toLong -
      math.floor(lnIntRef(2) * S).toLong
    val c0 = math.floor(lnIntRef(1 + B) * S).toLong -
      math.floor(lnIntRef(1 + B) * S).toLong
    assert(w(0).getLong(1) == 1L)
    assert(w(0).getDouble(2) ==
      BigDecimal((lw + c0).toDouble / S)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("corpus shuffle is a deterministic permutation of all doc ids") {
    val a = SparkEntry.queries("q_corpus_shuffle")(
      spark, "/root/testdata/sf0.001").collect()
    val b = SparkEntry.queries("q_corpus_shuffle")(
      spark, "/root/testdata/sf0.001").collect()
    // permutation: positions are exactly 1..N
    assert(a.map(_.getLong(3)).sorted.toSeq == (1L to a.length).toSeq)
    // deterministic: two runs agree row for row
    assert(a.map(r => (r.getLong(0), r.getLong(3))).toSeq ==
      b.map(r => (r.getLong(0), r.getLong(3))).toSeq)
    // actually shuffled: position order differs from id order
    assert(a.map(_.getLong(0)).toSeq != a.map(_.getLong(0)).sorted.toSeq)
  }

  test("dsir: weights are invariant to input partitioning") {
    val rows = (1L to 20L).map { i =>
      (i, s"tok${i % 5} tok${i % 3} tok${i % 7}",
        if (i % 2 == 0) "en" else "zz")
    }
    val df = langDocs(rows: _*)
    val a = Dsir.importanceWeights(df.repartition(1), "doc_id", "text",
      col("lang") === "en").orderBy("doc_id").collect().toSeq
    val b = Dsir.importanceWeights(df.repartition(13), "doc_id", "text",
      col("lang") === "en").orderBy("doc_id").collect().toSeq
    assert(a == b)
  }
}
