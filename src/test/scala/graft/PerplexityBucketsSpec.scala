package graft

import org.apache.spark.sql.functions._

import graft.text.{BigramLm, PerplexityBuckets}
import graft.operators.Quantiles

/** Pins [[graft.text.PerplexityBuckets]]: band assignment must equal
  * the standalone threshold computation — including under the DEEP
  * CHECKPOINTED LINEAGE that broke it in round 12 (the flagship
  * funnel's `train0 ⋉ localCheckpoint(ids)` shape, where the unpinned
  * probe join was a self-join on the scored frame and Spark's
  * self-join deduplication mis-bound the cloned threshold columns:
  * every doc classified `tail`).
  */
class PerplexityBucketsSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    // two languages × 40 docs; word composition varies per doc so the
    // bigram-LM scores spread over many distinct snapped grid values
    (0L until 80L).map { i =>
      val lang = if (i % 2 == 0) "aa" else "bb"
      val words = (0 until 25).map(j => s"w${(i * (j + 3) + j * j) % 13}")
      (i, lang, words.mkString(" "))
    }.toDF("doc_id", "lang", "text")
  }

  test("band assignment equals the standalone threshold computation " +
      "under deep checkpointed lineage") {
    val docs = corpus
    // the flagship shape that regressed: survivors re-rooted through a
    // localCheckpointed id frame
    val ids = docs.select("doc_id")
      .where(col("doc_id") % 7 =!= 0).localCheckpoint()
    val deep = docs.join(ids, Seq("doc_id"), "left_semi")
    val train = docs.where(col("doc_id") % 2 === 0)

    val got = PerplexityBuckets.bucket(
      deep, train, "doc_id", "text", Seq("lang"))
      .select("doc_id", "ppl_bucket").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

    // standalone replication: score, snap, exact grouped terciles,
    // threshold comparison — all driver-side off collected values
    val scored = BigramLm.score(deep, train, "doc_id", "text")
      .join(deep.select("doc_id", "lang"), "doc_id")
      .withColumn("__v",
        floor(col("avg_logprob") * PerplexityBuckets.SnapScale.toDouble)
          .cast("long"))
    val ts = Quantiles.groupQuantiles(scored, Seq("lang"), "__v",
      Seq(PerplexityBuckets.Q1, PerplexityBuckets.Q2))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getLong(2)).toMap
    val expect = scored.select("doc_id", "lang", "__v").collect().map { r =>
      val (id, lang, v) = (r.getLong(0), r.getString(1), r.getLong(2))
      val t1 = ts((lang, PerplexityBuckets.Q1))
      val t2 = ts((lang, PerplexityBuckets.Q2))
      id -> (if (v <= t1) "tail" else if (v <= t2) "middle" else "head")
    }.toMap

    assert(got == expect)
    // the regression's visible symptom, pinned directly: every band
    // populated in every language (the mis-bound thresholds collapsed
    // everything into `tail`)
    val byLang = scored.select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    for (lang <- Seq("aa", "bb"); band <- Seq("tail", "middle", "head"))
      assert(got.exists { case (id, b) => byLang(id) == lang && b == band },
        s"band $band empty for lang $lang: " +
          got.groupBy { case (id, _) => byLang(id) })
  }

  test("terciles split a uniform distinct-score group exactly") {
    import spark.implicits._
    // 9 docs, one language, 9 distinct snapped scores -> 3/3/3
    val docs = (0L until 9L).map { i =>
      // token count varies so avg_logprob varies monotonically enough
      // to produce 9 distinct snapped values; composition from a fixed
      // vocab keeps training stable
      val words = (0 until (5 + i.toInt * 3)).map(j => s"t${(i + j) % 7}")
      (i, "xx", words.mkString(" "))
    }.toDF("doc_id", "lang", "text")
    val out = PerplexityBuckets.bucket(
      docs, docs, "doc_id", "text", Seq("lang"))
    val counts = out.groupBy("ppl_bucket").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val snapped = BigramLm.score(docs, docs, "doc_id", "text")
      .select(floor(col("avg_logprob") *
        PerplexityBuckets.SnapScale.toDouble).cast("long"))
      .distinct().count()
    if (snapped == 9)
      assert(counts == Map("tail" -> 3L, "middle" -> 3L, "head" -> 3L),
        s"expected exact terciles, got $counts")
    else // ties on the snap grid shift whole grid-cells between bands;
         // the histogram semantics still cover every doc exactly once
      assert(counts.values.sum == 9L && counts.getOrElse("tail", 0L) >= 3L)
  }
}
