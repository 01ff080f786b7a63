package graft

import graft.similarity.HybridRrf
import org.apache.spark.sql.functions._

/** Pins the RRF fusion arithmetic and the both-lists-beat-one-list
  * property on a corpus small enough to rank by hand. The end-to-end
  * BM25/cosine replay is pinned by the q_hybrid_rrf DuckDB oracle.
  */
class HybridRrfSpec extends SparkSpec {
  import spark.implicits._

  // qid 0 queries with its own first tokens ("alpha beta").
  // doc 1: lexical match AND vector match (identical embedding).
  // doc 2: lexical match only (opposite embedding).
  // doc 3: vector match only (no shared terms).
  private val docs = Seq(
    (0L, "alpha beta"),
    (1L, "alpha beta gamma"),
    (2L, "alpha beta delta"),
    (3L, "epsilon zeta"))
    .toDF("doc_id", "text")
  private val emb = Seq(
    (0L, Seq(1.0f, 0.0f)),
    (1L, Seq(1.0f, 0.3f)),
    (2L, Seq(-1.0f, 0.0f)),
    (3L, Seq(1.0f, 0.1f)))
    .toDF("doc_id", "embedding")

  private def run() = HybridRrf.fuse(spark, docs, emb, "doc_id", "text",
    "embedding", numQueries = 1, topK = 3)
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))

  test("doc present in both rankings fuses ahead of single-list docs") {
    val got = run()
    assert(got.forall(_._1 == 0L))
    assert(got.forall(_._2 != 0L), "query doc must be excluded")
    // doc 1 appears in both lists; best single-list score is
    // 1/(60+1) < 2/(60+2), so doc 1 must lead regardless of ranks
    assert(got.head._2 == 1L)
    assert(got.map(_._4).toSeq == Seq(1L, 2L, 3L))
  }

  test("rrf scores are sums of 1/(60 + rank) over the hit lists") {
    val got = run().map(g => g._2 -> g._3).toMap
    def rrf(rs: Seq[Long]): Double =
      BigDecimal(rs.map(r => 1.0 / (HybridRrf.RrfK + r.toDouble)).sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // lexical: docs 1 and 2 tie on BM25 terms (alpha beta), doc_id
    // breaks the tie -> r1: doc1=1, doc2=2. vector: cosine doc3 >
    // doc1 > doc2 -> r2: doc3=1, doc1=2, doc2=3
    assert(got(1L) == rrf(Seq(1L, 2L)))
    assert(got(2L) == rrf(Seq(2L, 3L)))
    assert(got(3L) == rrf(Seq(1L)))
  }
}
