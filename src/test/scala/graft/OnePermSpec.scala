package graft

import graft.dedup.Dedup
import graft.functions.OnePermKernel
import org.apache.spark.sql.functions._

/** One-permutation MinHash: native kernel vs plain-Scala reference
  * parity, densification semantics, and recall against the exact
  * Jaccard ground truth on a synthetic near-dup corpus.
  */
class OnePermSpec extends SparkSpec {
  import spark.implicits._

  test("kernel output equals the plain-Scala reference rendering") {
    val docs = Seq(
      1L -> "the quick brown fox jumps over the lazy dog again and again",
      2L -> "an entirely different document about spark shuffles and joins",
      3L -> "x").toDF("doc_id", "text")
    val sh = docs.select(col("doc_id"),
      Dedup.shinglesFromTokens(
        graft.text.TextFunctions.tokens(col("text"))).as("s"))
    val kernel = sh.select(col("doc_id"),
      graft.functions.GraftFunctions
        .onePermBandKeys(spark, col("s")).as("bands"))
      .orderBy("doc_id").collect()
      .map(r => r.getSeq[String](1).toSeq)
    val ref = sh.orderBy("doc_id").collect()
      .map(r => OnePermKernel.ref(r.getSeq[String](1).toSeq))
    assert(kernel.toSeq == ref.toSeq)
  }

  test("identical shingle sets get identical band keys") {
    val a = OnePermKernel.ref(Seq("x y z", "y z w", "z w v"))
    val b = OnePermKernel.ref(Seq("z w v", "x y z", "y z w"))
    assert(a == b) // order-independent, like any min-based signature
  }

  test("mutually-empty bins never collide spuriously") {
    // two singleton docs with different shingles: 63 of 64 bins are
    // empty in each; without the t·p rotation offset every mutually
    // empty bin pair would collide and band-match the two docs
    val a = OnePermKernel.ref(Seq("alpha"))
    val b = OnePermKernel.ref(Seq("beta"))
    assert(a.zip(b).count { case (x, y) => x == y } == 0)
  }

  test("onePermPairs finds the high-jaccard pairs the exact join finds") {
    // 30 base docs; every third doc gets a near-identical twin (one
    // token changed out of 20) — jaccard ≈ 0.89 on 3-shingles
    val base = (0 until 30).map { i =>
      val toks = (0 until 20).map(t => s"w${i}_$t")
      (i.toLong, toks.mkString(" "))
    }
    val twins = (0 until 30 by 3).map { i =>
      val toks = (0 until 20).map(t => if (t == 19) "CHANGED"
        else s"w${i}_$t")
      (100L + i, toks.mkString(" "))
    }
    val docs = (base ++ twins).toDF("doc_id", "text")
    val truth = Dedup.jaccardPairs(docs, "text", "doc_id", 0.5)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Dedup.onePermPairs(docs, "text", "doc_id", 0.5)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty)
    // verify step makes precision exact; banding recall on ~0.9-jaccard
    // pairs should be high (16 bands × 4 rows: P(miss) ≈ (1-j⁴)^16)
    assert(got.subsetOf(truth))
    assert(got.size >= truth.size * 8 / 10,
      s"recall too low: ${got.size}/${truth.size}")
  }
}
