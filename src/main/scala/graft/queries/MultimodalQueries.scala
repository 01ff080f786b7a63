package graft.queries

import graft._
import graft.multimodal.{Crossmodal, MediaCodecs, Multimodal}
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
      // GENERATOR udf, not an operator: it synthesises the binary
      // payloads the corpus doesn't ship (real corpora carry media
      // columns). The operator under test is the batched decode
      // kernel below, not this row-local byte builder.
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

    // image near-dup: perceptual dHash over the decoded raster + the
    // SimHash 4x15-band Hamming pairing (recall-exact for distance <= 3).
    // Every 10th document gets a perturbed copy (global +1 brightness,
    // +3 on the top-left pixel, clamped) under a shifted id; the
    // gradient hash is brightness-shift invariant, so copies pair with
    // their originals while unrelated images (pseudorandom rasters,
    // expected Hamming ~30) do not. The oracle replays the hash from
    // the closed-form generator and verifies ALL pairs by brute
    // bit_count — banding must lose nothing.
    "q_image_dedup" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_image_dedup")
      val docs = src(dfl, "documents").select("doc_id")
      // generator UDFs (test-data synthesis, not operators): real
      // corpora carry binary media columns
      val bmp = udf((id: Long) => MediaCodecs.Synthetic.bmpTexturedFor(id))
      val bmpPert =
        udf((id: Long) => MediaCodecs.Synthetic.bmpTexturedPerturbedFor(id))
      val orig = docs.select(
        col("doc_id").as("doc"), bmp(col("doc_id")).as("data"))
      val pert = docs.where(col("doc_id") % 10 === 0).select(
        (col("doc_id") + PertIdOffset).as("doc"),
        bmpPert(col("doc_id")).as("data"))
      // decode kernel (bytes -> parsed raster -> 60-bit hash): a scalar
      // kernel UDF like the minhash/decode kernels — the hash value is
      // oracle-replayed bit-for-bit, so parity is pinned by the gate
      val dh = udf((data: Array[Byte]) =>
        MediaCodecs.ImageDHash.hash(MediaCodecs.Bmp.decode(data)))
      val hashed = orig.unionByName(pert)
        .select(col("doc"), dh(col("data")).as("h"))
      graft.dedup.Dedup.hammingPairs(hashed, "doc", "h", maxHamming = 3)
        .orderBy("doc_a", "doc_b")
    },

    // audio near-dup: the audio sibling of q_image_dedup — temporal
    // energy-gradient hash over genuinely decoded PCM (gain-invariant),
    // paired through the same 4x15 banding. Every 10th document gets a
    // +16-DC-offset copy under a shifted id; the oracle replays the
    // hash from the closed-form sample generator and verifies all
    // pairs by brute bit_count.
    "q_audio_dedup" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_audio_dedup")
      val docs = src(dfl, "documents").select("doc_id")
      val wav = udf((id: Long) => MediaCodecs.Synthetic.wavTexturedFor(id))
      val wavPert =
        udf((id: Long) => MediaCodecs.Synthetic.wavTexturedPerturbedFor(id))
      val orig = docs.select(
        col("doc_id").as("doc"), wav(col("doc_id")).as("data"))
      val pert = docs.where(col("doc_id") % 10 === 0).select(
        (col("doc_id") + PertIdOffset).as("doc"),
        wavPert(col("doc_id")).as("data"))
      val ah = udf((data: Array[Byte]) =>
        MediaCodecs.AudioEnergyHash.hash(MediaCodecs.Wav.decode(data)))
      val hashed = orig.unionByName(pert)
        .select(col("doc"), ah(col("data")).as("h"))
      graft.dedup.Dedup.hammingPairs(hashed, "doc", "h", maxHamming = 3)
        .orderBy("doc_a", "doc_b")
    },

    // video near-dup: temporal-spatial hash over genuinely decoded AVI
    // frames (RIFF chunk walk, strf raster layout, bottom-up strided
    // frames) — grid row r samples frame r*F/6, contributing 10 spatial
    // luminance-gradient bits; paired through the same 4x15 banding.
    // Every 10th document gets a brightened copy (+1 everywhere, +3 on
    // frame 0's top-left pixel, clamped) under a shifted id; the oracle
    // replays the hash from the closed-form frame generator and
    // verifies ALL pairs by brute bit_count — banding must lose nothing.
    "q_video_dedup" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_video_dedup")
      val docs = src(dfl, "documents").select("doc_id")
      val avi = udf((id: Long) => MediaCodecs.Synthetic.aviTexturedFor(id))
      val aviPert =
        udf((id: Long) => MediaCodecs.Synthetic.aviTexturedPerturbedFor(id))
      val orig = docs.select(
        col("doc_id").as("doc"), avi(col("doc_id")).as("data"))
      val pert = docs.where(col("doc_id") % 10 === 0).select(
        (col("doc_id") + PertIdOffset).as("doc"),
        aviPert(col("doc_id")).as("data"))
      val vh = udf((data: Array[Byte]) =>
        MediaCodecs.VideoTemporalHash.hash(MediaCodecs.Avi.decode(data)))
      val hashed = orig.unionByName(pert)
        .select(col("doc"), vh(col("data")).as("h"))
      graft.dedup.Dedup.hammingPairs(hashed, "doc", "h", maxHamming = 3)
        .orderBy("doc_a", "doc_b")
    },

    // multimodal retrieval: brute-force cosine top-k over WAV band-energy
    // feature vectors (queries-as-literals like q_ann_brute — no
    // crossJoin; the 5 query vectors explode into the scan). The features
    // come from genuinely decoded RIFF/WAVE PCM payloads.
    "q_multimodal_ann" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_multimodal_ann")
      // generator udf (test-data synthesis), see q_multimodal
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
    },

    // cross-modal retrieval (text→media): each tower's native features
    // (exact text stats / genuinely decoded WAV band-RMS) project into
    // one shared 8-dim space via per-modality deterministic planes
    // (Crossmodal — the CLIP two-tower shape with reproducible stand-in
    // encoders); retrieval is cosine top-k ACROSS modalities with the
    // queries-as-literals explode (no crossJoin)
    "q_crossmodal_ann" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_crossmodal_ann")
      val docs = src(dfl, "documents")
      // media tower (generator udf synthesises payloads, see q_multimodal)
      val wav = udf((id: Long) => MediaCodecs.Synthetic.wavFor(id))
      val packed = docs.select(col("doc_id"), struct(
        wav(col("doc_id")).as("data"),
        lit("audio/wav").as("mime"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("int").as("duration_ms")).as("media"))
      val media = Multimodal.featurize(packed, "media", "feat",
        MediaCodecs.WavEnergyKernel)
        .select(col("doc_id"),
          Crossmodal.projectMedia(col("feat")).as("mv"))
      // text tower: the NumQueries caption-side queries as literals
      val qRows = docs.where(col("doc_id") < NumQueries)
        .select(col("doc_id"), Crossmodal.projectText(
          Crossmodal.textFeatures(col("text"))).as("qv"))
        .orderBy("doc_id").collect()
      val qLit = array(qRows.map { r =>
        struct(lit(r.getLong(0)).as("qid"),
          array(r.getSeq[Double](1).map(lit(_)): _*).as("qv"))
      }: _*)
      val rank = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(desc("cosine"), asc("doc_id"))
      media.select(col("doc_id"), col("mv"), explode(qLit).as("p"))
        .select(col("p.qid").as("qid"), col("doc_id"), col("mv"),
          col("p.qv").as("qv"))
        .withColumn("cosine",
          graft.similarity.VectorFunctions.cosine(col("qv"), col("mv")))
        .withColumn("rank", row_number().over(rank).cast("bigint"))
        .where(col("rank") <= TopK)
        .select(col("qid"), col("doc_id").as("neighbor"), col("cosine"),
          col("rank"))
        .orderBy("qid", "rank")
    },

    // cross-modal retrieval THROUGH the trained coarse index — the
    // shared-space vectors composed with the IVF family: the media
    // tower's projections unit-normalise (spherical k-means — cosine
    // retrieval is scale-invariant, and normalising restores the
    // fixed-point quantizer's |v| < 2 precondition that raw
    // feature-space magnitudes would break), KMeans.fitModel trains
    // k = ⌊√n⌋ coarse cells over them, and each text query probes only
    // its nprobe nearest cells instead of the brute full-corpus
    // explode (q_crossmodal_ann) — the path that survives a 100× media
    // corpus. Oracle: the trained-IVF kmeans-replay chain RE-ROOTED at
    // the projected media vectors (both towers replay from the
    // 3-decimal plane literals), bit-exact through training,
    // assignment, probe, and scan.
    "q_crossmodal_ann_ivf" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_crossmodal_ann_ivf")
      val docs = src(dfl, "documents")
      val wav = udf((id: Long) => MediaCodecs.Synthetic.wavFor(id))
      val packed = docs.select(col("doc_id"), struct(
        wav(col("doc_id")).as("data"),
        lit("audio/wav").as("mime"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("int").as("duration_ms")).as("media"))
      val media = Multimodal.featurize(packed, "media", "feat",
        MediaCodecs.WavEnergyKernel)
        .select(col("doc_id"),
          Crossmodal.projectMedia(col("feat")).as("mv"))
      val mediaN = media
        .withColumn("nrm",
          graft.similarity.VectorFunctions.norm(col("mv")))
        .select(col("doc_id"),
          transform(col("mv"), x => x / col("nrm")).as("mvn"))
        .localCheckpoint()
      val k = SimilarityQueries.ivfK(mediaN.count())
      val (centFp, asg) = graft.similarity.KMeans.fitModel(
        mediaN, "doc_id", "mvn", k, SimilarityQueries.IvfIters)
      val cents = SimilarityQueries.trainedCentroids(centFp)
      val qRows = docs.where(col("doc_id") < NumQueries)
        .select(col("doc_id"), Crossmodal.projectText(
          Crossmodal.textFeatures(col("text"))).as("qv"))
        .orderBy("doc_id").collect()
      // probe assignment driver-side, the ivfSearch convention — the
      // cosine mirrors the SQL fold exactly (sequential accumulators)
      def cosD(a: Seq[Double], b: Array[Double]): Double = {
        var dt = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length) {
          dt += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i)
          i += 1
        }
        dt / (math.sqrt(na) * math.sqrt(nb))
      }
      val nprobe = SimilarityQueries.ivfNProbe(k)
      val probeRows = qRows.flatMap { r =>
        val qid = r.getLong(0)
        val qv = r.getSeq[Double](1)
        cents.toSeq
          .map { case (cid, cv) => (cid, cosD(qv, cv)) }
          .sortBy { case (cid, cc) => (-cc, cid) }
          .take(nprobe)
          .map { case (cid, _) =>
            org.apache.spark.sql.Row(qid, qv, cid.toLong) }
      }
      val probeSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("qid",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("qv",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType)),
        org.apache.spark.sql.types.StructField("cid",
          org.apache.spark.sql.types.LongType)))
      val probes = s.createDataFrame(
        s.sparkContext.parallelize(probeRows.toSeq, 1), probeSchema)
      val rank = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(desc("cosine"), asc("doc_id"))
      mediaN.join(asg.select(col("vec_id").as("doc_id"),
          col("cid").cast("long").as("cid")), Seq("doc_id"))
        .join(broadcast(probes), Seq("cid"))
        .withColumn("cosine",
          graft.similarity.VectorFunctions.cosine(col("qv"), col("mvn")))
        .withColumn("rank", row_number().over(rank).cast("bigint"))
        .where(col("rank") <= TopK)
        .select(col("qid"), col("doc_id").as("neighbor"), col("cosine"),
          col("rank"))
        .orderBy("qid", "rank")
    })

  private[graft] val NumQueries = 5
  private[graft] val TopK = 10
  private val PertIdOffset = 1000000L

  /** DuckDB replay of [[MediaCodecs.ImageDHash]] over the closed-form
    * generator raster: 60 gradient bits on the 6×11 nearest-neighbour
    * luminance grid. `byteExpr` is the pixel-byte formula with `$J` as
    * the byte-index placeholder (original vs perturbed generator);
    * `w`/`h`/`doc_id` are in scope from the surrounding CTE.
    */
  private def dhashSql(byteExpr: String): String = {
    def bexpr(j: String) = byteExpr.replace("$J", j)
    def g(sx: String): String = {
      // sy: grid row b//10 samples raster row (b//10)*h//6
      val p = s"((((b // 10) * h // 6) * w + $sx) * 3)"
      s"(${bexpr(p)} + ${bexpr(s"($p + 1)")} + ${bexpr(s"($p + 2)")})"
    }
    val sxl = "((b % 10) * w // 11)"
    val sxr = "(((b % 10) + 1) * w // 11)"
    s"""list_sum(list_transform(range(0, 60),
       |    b -> CASE WHEN ${g(sxr)} > ${g(sxl)}
       |      THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END))"""
      .stripMargin
  }

  /** DuckDB replay of [[MediaCodecs.VideoTemporalHash]] over the
    * closed-form frame generator: 60 bits where grid row b//10 samples
    * frame `(b//10)*F/6` at raster row `(b//10)*h/6` and bit position
    * b%10 compares the luminance of spatial columns b%10 / b%10+1 of
    * the 11-column grid. `byteExpr` carries `$T` (frame index) and `$J`
    * (byte index) placeholders; `w`/`h`/`f`/`doc_id` come from the CTE.
    */
  private def vhashSql(byteExpr: String): String = {
    val t = "((b // 10) * f // 6)"
    def bexpr(j: String) = byteExpr.replace("$T", t).replace("$J", j)
    def g(sx: String): String = {
      val p = s"((((b // 10) * h // 6) * w + $sx) * 3)"
      s"(${bexpr(p)} + ${bexpr(s"($p + 1)")} + ${bexpr(s"($p + 2)")})"
    }
    val sxl = "((b % 10) * w // 11)"
    val sxr = "(((b % 10) + 1) * w // 11)"
    s"""list_sum(list_transform(range(0, 60),
       |    b -> CASE WHEN ${g(sxr)} > ${g(sxl)}
       |      THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END))"""
      .stripMargin
  }

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

  /** DuckDB replay of [[MediaCodecs.AudioEnergyHash]] over the
    * closed-form textured sample generator: 60 temporal energy-gradient
    * bits over 61 equal frames. `sampleExpr` carries `$I` as the
    * sample-index placeholder; `n`/`doc_id` come from the CTE.
    */
  private def audioHashSql(sampleExpr: String): String = {
    def energy(f: String): String = {
      val s = sampleExpr.replace("$I", "i")
      s"""list_sum(list_transform(
         |      range(($f) * n // 61, (($f) + 1) * n // 61),
         |      i -> ($s) * ($s)))""".stripMargin
    }
    s"""list_sum(list_transform(range(0, 60),
       |    b -> CASE WHEN ${energy("b + 1")} > ${energy("b")}
       |      THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END))"""
      .stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q_audio_dedup" -> {
      val orig = "((doc_id * 7919 + ($I) * 104729 + " +
        "(doc_id % 13 + 1) * ($I) * ($I) * 97 + 13) % 65536 - 32768)"
      val pert = s"least($orig + 16, 32767)"
      s"""WITH d AS (SELECT doc_id, 64 + doc_id % 64 AS n FROM documents),
        |ha AS (
        |  SELECT doc_id AS doc, ${audioHashSql(orig)} AS h FROM d
        |  UNION ALL
        |  SELECT doc_id + $PertIdOffset AS doc, ${audioHashSql(pert)} AS h
        |  FROM d WHERE doc_id % 10 = 0)
        |SELECT a.doc AS doc_a, b.doc AS doc_b,
        |  CAST(bit_count(xor(a.h::UBIGINT, b.h::UBIGINT)) AS INTEGER)
        |    AS hamming
        |FROM ha a JOIN ha b ON a.doc < b.doc
        |WHERE bit_count(xor(a.h::UBIGINT, b.h::UBIGINT)) <= 3
        |ORDER BY doc_a, doc_b""".stripMargin
    },

    // the oracle verifies ALL pairs by brute bit_count (no banding):
    // the Spark side's band blocking must lose no pair within distance 3
    "q_image_dedup" -> {
      val orig = "((doc_id * 131 + ($J) * 31 + " +
        "(doc_id % 13 + 1) * ($J) * ($J) + 7) % 256)"
      val pert = s"least($orig + CASE WHEN ($$J) < 3 THEN 4 ELSE 1 END, 255)"
      s"""WITH d AS (SELECT doc_id, 8 + doc_id % 9 AS w,
        |    4 + doc_id % 7 AS h FROM documents),
        |ha AS (
        |  SELECT doc_id AS doc, ${dhashSql(orig)} AS h FROM d
        |  UNION ALL
        |  SELECT doc_id + $PertIdOffset AS doc, ${dhashSql(pert)} AS h
        |  FROM d WHERE doc_id % 10 = 0)
        |SELECT a.doc AS doc_a, b.doc AS doc_b,
        |  CAST(bit_count(xor(a.h::UBIGINT, b.h::UBIGINT)) AS INTEGER)
        |    AS hamming
        |FROM ha a JOIN ha b ON a.doc < b.doc
        |WHERE bit_count(xor(a.h::UBIGINT, b.h::UBIGINT)) <= 3
        |ORDER BY doc_a, doc_b""".stripMargin
    },

    // brute-force verification like q_image_dedup: every pair within
    // Hamming 3 must surface, so the Spark side's banding is recall-pinned
    "q_video_dedup" -> {
      val orig = "((doc_id * 131 + ($T) * 37 + ($J) * 31 + " +
        "(doc_id % 13 + 1) * ($J) * ($J) + " +
        "(doc_id % 7 + 1) * ($T) * ($J) + 7) % 256)"
      val pert = s"least($orig + CASE WHEN ($$T) = 0 AND ($$J) < 3 " +
        "THEN 4 ELSE 1 END, 255)"
      s"""WITH d AS (SELECT doc_id, 8 + doc_id % 9 AS w,
        |    4 + doc_id % 7 AS h, 6 + doc_id % 5 AS f FROM documents),
        |ha AS (
        |  SELECT doc_id AS doc, ${vhashSql(orig)} AS h FROM d
        |  UNION ALL
        |  SELECT doc_id + $PertIdOffset AS doc, ${vhashSql(pert)} AS h
        |  FROM d WHERE doc_id % 10 = 0)
        |SELECT a.doc AS doc_a, b.doc AS doc_b,
        |  CAST(bit_count(xor(a.h::UBIGINT, b.h::UBIGINT)) AS INTEGER)
        |    AS hamming
        |FROM ha a JOIN ha b ON a.doc < b.doc
        |WHERE bit_count(xor(a.h::UBIGINT, b.h::UBIGINT)) <= 3
        |ORDER BY doc_a, doc_b""".stripMargin
    },

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
    },

    "q_crossmodal_ann" -> {
      // per-modality projection: SharedDim dots against the 3-decimal
      // plane literals (Crossmodal.planeSqlLiterals — the same values
      // the Spark towers embed)
      def projSql(fcol: String, salt: Long, featDim: Int): String =
        "[" + (0 until Crossmodal.SharedDim).map { p =>
          val lits = Crossmodal.planeSqlLiterals(salt, p, featDim)
            .mkString(", ")
          OracleSql.dotExpr(fcol, s"[$lits]", featDim)
        }.mkString(",\n     ") + "]"
      val dot = OracleSql.dotExpr("qv", "mv", Crossmodal.SharedDim)
      val na = OracleSql.dotExpr("qv", "qv", Crossmodal.SharedDim)
      val nb = OracleSql.dotExpr("mv", "mv", Crossmodal.SharedDim)
      s"""WITH ${OracleSql.toksCte},
        |tf AS (SELECT doc_id,
        |    [CAST(length(text) AS DOUBLE), CAST(len(w) AS DOUBLE),
        |     CAST(length(text) - length(regexp_replace(text, 'e', '', 'g'))
        |       AS DOUBLE),
        |     CAST(length(regexp_replace(lower(text), '[^aeiou]', '', 'g'))
        |       AS DOUBLE)] AS f
        |  FROM toks WHERE doc_id < $NumQueries),
        |tq AS (SELECT doc_id AS qid,
        |    ${projSql("f", Crossmodal.TextSalt, Crossmodal.TextFeatDim)}
        |    AS qv FROM tf),
        |d AS (SELECT doc_id, 64 + doc_id % 64 AS n FROM documents),
        |mf AS (SELECT doc_id,
        |    [${wavBandSql(0)}, ${wavBandSql(1)},
        |     ${wavBandSql(2)}, ${wavBandSql(3)}] AS feat
        |  FROM d),
        |mq AS (SELECT doc_id,
        |    ${projSql("feat", Crossmodal.MediaSalt, Crossmodal.MediaFeatDim)}
        |    AS mv FROM mf),
        |p AS (SELECT qid, doc_id,
        |    ($dot) / (sqrt($na) * sqrt($nb)) AS cosine
        |  FROM tq, mq),
        |r AS (SELECT qid, doc_id, cosine, row_number() OVER
        |  (PARTITION BY qid ORDER BY cosine DESC, doc_id) AS rank FROM p)
        |SELECT qid, doc_id AS neighbor, cosine, rank
        |FROM r WHERE rank <= $TopK ORDER BY qid, rank""".stripMargin
    },

    "q_crossmodal_ann_ivf" -> {
      // the trained-IVF replay re-rooted at the normalised media tower:
      // towers from the 3-decimal plane literals, spherical kmeans via
      // the re-rooted CTE chain, probe + scan with the shared cosine
      def projSql(fcol: String, salt: Long, featDim: Int): String =
        "[" + (0 until Crossmodal.SharedDim).map { p =>
          val lits = Crossmodal.planeSqlLiterals(salt, p, featDim)
            .mkString(", ")
          OracleSql.dotExpr(fcol, s"[$lits]", featDim)
        }.mkString(",\n     ") + "]"
      val sd = Crossmodal.SharedDim
      def cosSql(a: String, b: String): String =
        s"(${OracleSql.dotExpr(a, b, sd)}) / " +
          s"(sqrt(${OracleSql.dotExpr(a, a, sd)}) * " +
          s"sqrt(${OracleSql.dotExpr(b, b, sd)}))"
      val t = SimilarityQueries.IvfIters
      val kExpr =
        "(SELECT CAST(floor(sqrt(count(*))) AS BIGINT) FROM documents)"
      val npExpr =
        """(SELECT greatest(1, CAST(ceil(0.22 * floor(sqrt(count(*))))
          |  AS BIGINT)) FROM documents)""".stripMargin
      s"""WITH ${OracleSql.toksCte},
        |tf AS (SELECT doc_id,
        |    [CAST(length(text) AS DOUBLE), CAST(len(w) AS DOUBLE),
        |     CAST(length(text) - length(regexp_replace(text, 'e', '', 'g'))
        |       AS DOUBLE),
        |     CAST(length(regexp_replace(lower(text), '[^aeiou]', '', 'g'))
        |       AS DOUBLE)] AS f
        |  FROM toks WHERE doc_id < $NumQueries),
        |tq AS (SELECT doc_id AS qid,
        |    ${projSql("f", Crossmodal.TextSalt, Crossmodal.TextFeatDim)}
        |    AS qv FROM tf),
        |d AS (SELECT doc_id, 64 + doc_id % 64 AS n FROM documents),
        |mf AS (SELECT doc_id,
        |    [${wavBandSql(0)}, ${wavBandSql(1)},
        |     ${wavBandSql(2)}, ${wavBandSql(3)}] AS feat
        |  FROM d),
        |mq AS (SELECT doc_id,
        |    ${projSql("feat", Crossmodal.MediaSalt, Crossmodal.MediaFeatDim)}
        |    AS mv FROM mf),
        |mqn AS (SELECT doc_id, list_transform(mv,
        |    x -> x / sqrt(${OracleSql.dotExpr("mv", "mv", sd)})) AS mvn
        |  FROM mq),
        |${OracleSql.kmeansCtes(kExpr, t, src = "mqn", idCol = "doc_id",
            vecCol = "mvn", dim = sd)},
        |cent AS (SELECT cid, list_transform(c,
        |  x -> x / ${graft.similarity.KMeans.Scale}.0
        |    - ${graft.similarity.KMeans.Offset}) AS cv FROM c$t),
        |e AS (SELECT mqn.doc_id, mqn.mvn, asg.cid
        |  FROM mqn JOIN a${t + 1} asg ON mqn.doc_id = asg.vec_id),
        |pr AS (SELECT qid, qv, cid, ${cosSql("qv", "cv")} AS cc
        |  FROM tq CROSS JOIN cent),
        |p AS (SELECT qid, qv, cid FROM (
        |    SELECT qid, qv, cid,
        |      row_number() OVER (PARTITION BY qid ORDER BY cc DESC, cid)
        |        AS rn
        |    FROM pr) WHERE rn <= $npExpr),
        |cand AS (SELECT p.qid, p.qv, e.doc_id, e.mvn
        |  FROM p JOIN e USING (cid)),
        |sc AS (SELECT qid, doc_id, ${cosSql("qv", "mvn")} AS cosine
        |  FROM cand),
        |r AS (SELECT qid, doc_id, cosine, row_number() OVER
        |  (PARTITION BY qid ORDER BY cosine DESC, doc_id) AS rank FROM sc)
        |SELECT qid, doc_id AS neighbor, cosine, rank
        |FROM r WHERE rank <= $TopK ORDER BY qid, rank""".stripMargin
    })
}
