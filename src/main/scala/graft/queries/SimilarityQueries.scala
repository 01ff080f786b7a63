package graft.queries

import graft._
import graft.similarity.VectorFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search (ANN) over the `embeddings` corpus: top-k cosine
  * neighbours for a small set of query vectors.
  *
  *  - `q_ann_brute`: the exact baseline. Query vectors are collected as
  *    PARAMETERS (a handful of rows — this is the query workload, not
  *    data) and exploded as literals against the scan, so the plan is
  *    scan → generate → window, with no crossJoin and one shuffle
  *    (partition by query id for the top-k window).
  *  - `q_ann_lsh`: the scale path. Random-hyperplane band keys bucket the
  *    corpus; candidates are vectors sharing ≥1 band with the query, and
  *    only candidates pay the exact cosine + top-k. At 100 TB the bucket
  *    join shards the work across executors; recall/precision tune via
  *    bits-per-band.
  *
  * Both have DuckDB oracles: brute force is mirrored directly; the LSH
  * variant's oracle mirrors the banding pipeline value-exactly.
  */
object SimilarityQueries {
  import Q._

  private val NumQueries = 5
  private val TopK = 10

  private def annBrute(s: SparkSession, dir: String): DataFrame = {
    implicit val c: GraftConf = conf(dir)
    val dfl = DataFlow(s, "q_ann_brute")
    val emb = src(dfl, "embeddings").select(col("vec_id"), col("embedding"))
    // query vectors as literal parameters (float → double is exact)
    val qRows = emb.filter(col("vec_id") < NumQueries)
      .orderBy("vec_id").collect()
    val qLit = array(qRows.map { r =>
      struct(
        lit(r.getLong(0)).as("qid"),
        array(r.getSeq[Float](1).map(f => lit(f)): _*).as("qv"))
    }: _*)
    val rank = row_number().over(
      Window.partitionBy("qid").orderBy(desc("cosine"), asc("vec_id")))
    emb.select(col("vec_id"), col("embedding"), explode(qLit).as("q"))
      .select(col("q.qid").as("qid"), col("vec_id"), col("embedding"),
        col("q.qv").as("qv"))
      .where(col("qid") =!= col("vec_id"))
      // native codegen'd Catalyst expression — bit-identical to the
      // Column fold, no UDF SerDe, stays inside whole-stage codegen
      .withColumn("cosine",
        graft.functions.GraftFunctions.cosineSim(s, col("qv"), col("embedding")))
      .withColumn("rank", rank.cast("bigint"))
      .where(col("rank") <= TopK)
      .select(col("qid"), col("vec_id").as("neighbor"), col("cosine"),
        col("rank"))
      .orderBy("qid", "rank")
  }

  private def annLsh(s: SparkSession, dir: String): DataFrame = {
    implicit val c: GraftConf = conf(dir)
    val dfl = DataFlow(s, "q_ann_lsh")
    val emb = src(dfl, "embeddings").select(col("vec_id"), col("embedding"))
    val banded = emb.select(col("vec_id"), col("embedding"),
      posexplode(planeBandKeys(col("embedding"))).as(Seq("band", "key")))
      .cache() // probed by both the query side and the corpus side
    val qb = banded.where(col("vec_id") < NumQueries)
      .select(col("band"), col("key"),
        col("vec_id").as("qid"), col("embedding").as("qv"))
    val rank = row_number().over(
      Window.partitionBy("qid").orderBy(desc("cosine"), asc("vec_id")))
    qb.join(banded, Seq("band", "key"))
      .where(col("qid") =!= col("vec_id"))
      .dropDuplicates("qid", "vec_id")
      .withColumn("cosine",
        graft.functions.GraftFunctions.cosineSim(s, col("qv"), col("embedding")))
      .withColumn("rank", rank.cast("bigint"))
      .where(col("rank") <= TopK)
      .select(col("qid"), col("vec_id").as("neighbor"), col("cosine"),
        col("rank"))
      .orderBy("qid", "rank")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ann_brute" -> (annBrute _),
    "q_ann_lsh" -> (annLsh _))

  import OracleSql._

  val oracles: Map[String, String] = Map(
    "q_ann_brute" ->
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
        |  WHERE vec_id < $NumQueries),
        |p AS (SELECT qid, vec_id, ${cosineExpr("qv", "embedding")} AS cosine
        |  FROM q JOIN embeddings ON vec_id <> qid),
        |r AS (SELECT qid, vec_id, cosine, row_number() OVER
        |  (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rank FROM p)
        |SELECT qid, vec_id AS neighbor, cosine, rank
        |FROM r WHERE rank <= $TopK ORDER BY qid, rank""".stripMargin,
    "q_ann_lsh" ->
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
        |bits AS (SELECT vec_id, embedding,
        |  ${planeBitsExpr("embedding")} AS sig FROM e),
        |b0 AS (SELECT vec_id, embedding, sig,
        |  unnest(range(0, $NumPlaneBands)) AS band FROM bits),
        |bands AS (SELECT vec_id, embedding, band,
        |  substr(sig, band * $PlaneBandBits + 1, $PlaneBandBits) AS key
        |  FROM b0),
        |cand AS (SELECT DISTINCT q.vec_id AS qid, q.embedding AS qv,
        |    e.vec_id, e.embedding
        |  FROM bands q JOIN bands e
        |    ON q.band = e.band AND q.key = e.key AND q.vec_id <> e.vec_id
        |  WHERE q.vec_id < $NumQueries),
        |p AS (SELECT qid, vec_id, ${cosineExpr("qv", "embedding")} AS cosine
        |  FROM cand),
        |r AS (SELECT qid, vec_id, cosine, row_number() OVER
        |  (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rank FROM p)
        |SELECT qid, vec_id AS neighbor, cosine, rank
        |FROM r WHERE rank <= $TopK ORDER BY qid, rank""".stripMargin)
}
