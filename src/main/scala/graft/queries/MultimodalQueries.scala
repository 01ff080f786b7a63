package graft.queries

import graft._
import graft.multimodal.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-plumbing query: pack `documents.text` into the canonical
  * media struct (binary payload + typed metadata), run the batched
  * mapPartitions feature kernel (deterministic md5-seeded stub — see
  * [[Multimodal]] for what is stub vs real), and emit payload statistics
  * plus the feature vector as scalars. The DuckDB oracle reproduces the
  * kernel's md5 arithmetic exactly.
  */
object MultimodalQueries {
  import Q._

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_multimodal")
      val packed = src(dfl, "documents")
        .select(col("doc_id"), Multimodal.packText(col("text")).as("media"))
      val feat = Multimodal.featurize(packed, "media", "feat")
      feat.select(
        col("doc_id"),
        col("media")("mime").as("mime"),
        Multimodal.payloadBytes(col("media")).as("n_bytes"),
        Multimodal.contentDigest(col("media")).as("digest"),
        element_at(col("feat"), 1).as("f0"),
        element_at(col("feat"), 2).as("f1"),
        element_at(col("feat"), 3).as("f2"),
        element_at(col("feat"), 4).as("f3"))
        .orderBy("doc_id")
    },

    // multimodal retrieval: brute-force cosine top-k over the media
    // feature vectors (queries-as-literals like q_ann_brute — no
    // crossJoin; the 5 query vectors explode into the scan). Swapping
    // FakeKernel for a real decoder turns this into image/audio
    // similarity search with no plan change.
    "q_multimodal_ann" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_multimodal_ann")
      val packed = src(dfl, "documents")
        .select(col("doc_id"), Multimodal.packText(col("text")).as("media"))
      val feats = Multimodal.featurize(packed, "media", "feat")
        .select("doc_id", "feat")
      val qRows = feats.where(col("doc_id") < NumQueries)
        .orderBy("doc_id").collect()
      val qLit = array(qRows.map { r =>
        struct(lit(r.getLong(0)).as("qid"),
          array(r.getSeq[Double](1).map(lit(_)): _*).as("qf"))
      }: _*)
      val rank = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(desc("cosine"), asc("doc_id"))
      feats.select(col("doc_id"), col("feat"), explode(qLit).as("p"))
        .select(col("p.qid").as("qid"), col("doc_id"), col("feat"),
          col("p.qf").as("qf"))
        .where(col("qid") =!= col("doc_id"))
        .withColumn("cosine",
          graft.similarity.VectorFunctions.cosine(col("qf"), col("feat")))
        .withColumn("rank", row_number().over(rank).cast("bigint"))
        .where(col("rank") <= TopK)
        .select(col("qid"), col("doc_id").as("neighbor"), col("cosine"),
          col("rank"))
        .orderBy("qid", "rank")
    })

  private val NumQueries = 5
  private val TopK = 10

  private def featSql(i: Int): String =
    s"""list_reduce(list_transform(range(1, 5),
       |  j -> CAST(instr('0123456789abcdef',
       |    substr(md5(text), ${i * 4} + j, 1)) - 1 AS BIGINT)),
       |  (a, b) -> a * 16 + b)::DOUBLE / 65535.0""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_multimodal" ->
      s"""SELECT doc_id, 'text/plain' AS mime,
        |  octet_length(encode(text)) AS n_bytes,
        |  md5(text) AS digest,
        |  ${featSql(0)} AS f0,
        |  ${featSql(1)} AS f1,
        |  ${featSql(2)} AS f2,
        |  ${featSql(3)} AS f3
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_multimodal_ann" -> {
      val dot = OracleSql.dotExpr("qf", "feat", dim = 4)
      val na = OracleSql.dotExpr("qf", "qf", dim = 4)
      val nb = OracleSql.dotExpr("feat", "feat", dim = 4)
      s"""WITH f AS (SELECT doc_id,
        |    [${featSql(0)}, ${featSql(1)}, ${featSql(2)}, ${featSql(3)}]
        |      AS feat
        |  FROM documents),
        |q AS (SELECT doc_id AS qid, feat AS qf FROM f
        |  WHERE doc_id < $NumQueries),
        |p AS (SELECT qid, doc_id,
        |    ($dot) / (sqrt($na) * sqrt($nb)) AS cosine
        |  FROM q JOIN f ON f.doc_id <> q.qid),
        |r AS (SELECT qid, doc_id, cosine, row_number() OVER
        |  (PARTITION BY qid ORDER BY cosine DESC, doc_id) AS rank FROM p)
        |SELECT qid, doc_id AS neighbor, cosine, rank
        |FROM r WHERE rank <= $TopK ORDER BY qid, rank""".stripMargin
    })
}
