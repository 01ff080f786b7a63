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
    })

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
        |FROM documents ORDER BY doc_id""".stripMargin)
}
