package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads ride through the
  * engine as opaque `binary` columns inside a typed media struct, and
  * per-batch kernels (decode, feature-extract, resize, frame-sample) run
  * over partition iterators — the Scala analogue of batched Pandas-UDF
  * processing.
  *
  * The decode kernels are REAL: [[MediaCodecs.BmpStatsKernel]] parses
  * 24bpp BMP (header, 4-byte row stride, bottom-up raster) and
  * [[MediaCodecs.WavEnergyKernel]] parses RIFF/WAVE 16-bit PCM (chunk
  * walk), both dependency-free and byte-for-byte unit-asserted.
  * [[DigestKernel]] remains for opaque payloads with no parseable
  * container (md5-derived features — a stand-in for an embedding-model
  * forward pass, not a decoder).
  */
object Multimodal {

  /** Canonical media struct schema: payload + typed metadata. */
  val MediaSchema: StructType = StructType(Seq(
    StructField("data", BinaryType),
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", IntegerType)))

  /** Pack a string column into a media struct (UTF-8 payload). The test
    * corpus has no binary tables, so text doubles as the payload source;
    * a real pipeline packs file bytes the same way.
    */
  def packText(c: Column, mime: String = "text/plain"): Column =
    struct(
      encode(c, "UTF-8").as("data"),
      lit(mime).as("mime"),
      lit(null).cast(IntegerType).as("width"),
      lit(null).cast(IntegerType).as("height"),
      lit(null).cast(IntegerType).as("duration_ms"))

  /** Payload size in bytes — pure Column op, no kernel needed. */
  def payloadBytes(media: Column): Column = octet_length(media("data"))

  /** Content digest of the payload. */
  def contentDigest(media: Column): Column = md5(media("data"))

  /** Deterministic pseudo-feature vector from the payload digest: `dim`
    * doubles in [0,1), each from a 4-hex-digit window of the md5. Stands
    * in for an embedding-model forward pass; reproducible in any oracle
    * engine.
    */
  def digestFeatures(media: Column, dim: Int = 4): Column = {
    require(dim <= 8, "md5 provides 32 hex chars = 8 four-digit windows")
    array((0 until dim).map { i =>
      conv(substring(md5(media("data")), i * 4 + 1, 4), 16, 10)
        .cast("double") / 65535.0
    }: _*)
  }

  /** Metadata-level resize: records the target raster size on the struct.
    * A real decoder would also transform `data`; the stub keeps bytes
    * intact (documented divergence, see class doc).
    */
  def resizeMeta(media: Column, width: Int, height: Int): Column =
    media.withField("width", lit(width)).withField("height", lit(height))

  // ------------------------------------------------------------------
  // batched kernel execution (mapPartitions — the Pandas-UDF analogue)
  // ------------------------------------------------------------------

  /** A per-payload kernel: bytes in, feature vector out. */
  trait Kernel extends Serializable {
    def features(data: Array[Byte]): Array[Double]
  }

  /** md5-derived features for payloads with no parseable container
    * (identical to [[digestFeatures]] for dim 4) — a deterministic
    * stand-in for an embedding-model forward pass over opaque bytes.
    * For decodable media use the real codec kernels in [[MediaCodecs]].
    */
  object DigestKernel extends Kernel {
    def features(data: Array[Byte]): Array[Double] = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(data)
      (0 until 4).map { i =>
        val hi = d(i * 2) & 0xff
        val lo = d(i * 2 + 1) & 0xff
        ((hi << 8) | lo).toDouble / 65535.0
      }.toArray
    }
  }

  /** Run a kernel over every row's media payload, batched per partition:
    * one kernel instance per partition, iterator-in/iterator-out, so
    * per-row overhead is a virtual call — the execution shape a
    * vectorised UDF wants. Appends `featCol` (array<double>) to the
    * schema. The id column rides along untouched; partitioning is
    * preserved (narrow transformation, no shuffle).
    */
  def featurize(
      df: DataFrame, mediaCol: String, featCol: String,
      kernel: Kernel = DigestKernel): DataFrame = {
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+
      StructField(featCol, ArrayType(DoubleType)))
    val mediaIdx = inSchema.fieldIndex(mediaCol)
    val dataIdx = inSchema(mediaIdx).dataType.asInstanceOf[StructType]
      .fieldIndex("data")
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val media = r.getStruct(mediaIdx)
        val data =
          if (media == null || media.isNullAt(dataIdx)) Array.empty[Byte]
          else media.getAs[Array[Byte]](dataIdx)
        Row.fromSeq(r.toSeq :+ kernel.features(data).toSeq)
      }
    }(enc)
  }

  /** Frame-sample stub for video payloads: split the byte payload into
    * `n` contiguous chunks and emit one media row per "frame". The
    * chunking is a stand-in for codec frame extraction; the explode
    * shape (one row per frame, frame index column) is the real contract.
    */
  def frameSample(df: DataFrame, mediaCol: String, n: Int): DataFrame = {
    val data = col(mediaCol)("data")
    val len = octet_length(data)
    val chunk = greatest(ceil(len.cast("double") / n).cast("int"), lit(1))
    df.select(col("*"),
      posexplode(transform(sequence(lit(0), lit(n - 1)), i =>
        data.substr((i * chunk + 1).cast("int"), chunk)))
        .as(Seq("frame_idx", "frame_data")))
      .where(octet_length(col("frame_data")) > 0)
  }
}
