package graft.queries

import graft._
import graft.multimodal.{MediaCodecs, Multimodal}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal queries over REAL decoded media: each document id maps to a
  * deterministic, VALID media file ([[MediaCodecs.Synthetic]] — the
  * corpus ships no binary tables), the batched mapPartitions kernels
  * genuinely decode it (BMP header/stride/bottom-up raster, RIFF chunk
  * walk), and the DuckDB oracle replays the decoded statistics from the
  * closed-form pixel/sample generator — so a decoder that mishandled the
  * container would hash-mismatch (the top-half-mean feature is
  * row-order-sensitive on purpose).
  */
object MultimodalQueries {
  import Q._

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // decode BMP payloads and emit header fields + pixel statistics
    "q_multimodal" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_multimodal")
      val bmp = udf((id: Long) => MediaCodecs.Synthetic.bmpFor(id))
      val packed = src(dfl, "documents")
        .select(col("doc_id"), struct(
          bmp(col("doc_id")).as("data"),
          lit("image/bmp").as("mime"),
          lit(null).cast("int").as("width"),
          lit(null).cast("int").as("height"),
          lit(null).cast("int").as("duration_ms")).as("media"))
      val feat = Multimodal.featurize(packed, "media", "feat",
        MediaCodecs.BmpStatsKernel)
      feat.select(
        col("doc_id"),
        col("media")("mime").as("mime"),
        Multimodal.payloadBytes(col("media")).cast("long").as("n_bytes"),
        element_at(col("feat"), 1).cast("long").as("width"),
        element_at(col("feat"), 2).cast("long").as("height"),
        element_at(col("feat"), 3).as("mean_b"),
        element_at(col("feat"), 4).as("mean_g"),
        element_at(col("feat"), 5).as("mean_r"),
        element_at(col("feat"), 6).as("top_half_mean"))
        .orderBy("doc_id")
    },

    // multimodal retrieval: brute-force cosine top-k over WAV band-energy
    // feature vectors (queries-as-literals like q_ann_brute — no
    // crossJoin; the 5 query vectors explode into the scan). The features
    // come from genuinely decoded RIFF/WAVE PCM payloads.
    "q_multimodal_ann" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_multimodal_ann")
      val wav = udf((id: Long) => MediaCodecs.Synthetic.wavFor(id))
      val packed = src(dfl, "documents")
        .select(col("doc_id"), struct(
          wav(col("doc_id")).as("data"),
          lit("audio/wav").as("mime"),
          lit(null).cast("int").as("width"),
          lit(null).cast("int").as("height"),
          lit(null).cast("int").as("duration_ms")).as("media"))
      val feats = Multimodal.featurize(packed, "media", "feat",
        MediaCodecs.WavEnergyKernel)
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

  /** Mean of BMP channel `c` over the generator pixels — mirrors
    * [[MediaCodecs.Synthetic.bmpFor]] (pixel byte j = (id*131+j*31+7)
    * mod 256, j = (y*w+x)*3 + c top-down row-major) and the kernel's
    * exact-integer-sum / final-double-division shape.
    */
  private def bmpChannelMeanSql(c: Int): String =
    s"""CAST(list_sum(list_transform(range(0, w * h),
       |  pi -> (doc_id * 131 + (pi * 3 + $c) * 31 + 7) % 256))
       |  AS DOUBLE) / CAST(w * h * 255 AS DOUBLE)""".stripMargin

  /** Mean over ALL channel bytes of the top half rows (j < 3*w*(h//2))
    * — row-order-sensitive: catches a bottom-up/stride decode bug that
    * channel sums would hide.
    */
  private val bmpTopHalfSql: String =
    s"""CAST(list_sum(list_transform(range(0, 3 * w * (h // 2)),
       |  j -> (doc_id * 131 + j * 31 + 7) % 256))
       |  AS DOUBLE) / CAST(3 * w * (h // 2) * 255 AS DOUBLE)""".stripMargin

  /** RMS of WAV band `b` (4 equal bands, last takes the remainder) —
    * mirrors [[MediaCodecs.Synthetic.wavFor]] and
    * [[MediaCodecs.WavEnergyKernel]]: exact integer square sums, then
    * sqrt(sum/cnt)/32768.
    */
  private def wavBandSql(b: Int): String = {
    val until = if (b == 3) "n" else s"${b + 1} * (n // 4)"
    def s2(i: String) =
      s"((doc_id * 7919 + $i * 104729 + 13) % 65536 - 32768)"
    s"""sqrt(CAST(list_sum(list_transform(range($b * (n // 4), $until),
       |  i -> ${s2("i")} * ${s2("i")}))
       |  AS DOUBLE) / CAST($until - $b * (n // 4) AS DOUBLE)) / 32768.0"""
      .stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q_multimodal" ->
      s"""WITH d AS (SELECT doc_id, 8 + doc_id % 9 AS w,
        |    4 + doc_id % 7 AS h FROM documents)
        |SELECT doc_id, 'image/bmp' AS mime,
        |  54 + ((3 * w + 3) // 4) * 4 * h AS n_bytes,
        |  w AS width, h AS height,
        |  ${bmpChannelMeanSql(0)} AS mean_b,
        |  ${bmpChannelMeanSql(1)} AS mean_g,
        |  ${bmpChannelMeanSql(2)} AS mean_r,
        |  $bmpTopHalfSql AS top_half_mean
        |FROM d ORDER BY doc_id""".stripMargin,

    "q_multimodal_ann" -> {
      val dot = OracleSql.dotExpr("qf", "feat", dim = 4)
      val na = OracleSql.dotExpr("qf", "qf", dim = 4)
      val nb = OracleSql.dotExpr("feat", "feat", dim = 4)
      s"""WITH d AS (SELECT doc_id, 64 + doc_id % 64 AS n FROM documents),
        |f AS (SELECT doc_id,
        |    [${wavBandSql(0)}, ${wavBandSql(1)},
        |     ${wavBandSql(2)}, ${wavBandSql(3)}] AS feat
        |  FROM d),
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
