package graft.io

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file interchange on the BUNDLED avro-core jars
  * (avro/avro-mapred ship on the Spark classpath; the spark-avro
  * connector does not in this deployment) — the Xlsx precedent: when
  * the format library is absent, the engine carries its own
  * dependency-light codec and keeps the Spark-side contract real.
  *
  * Read is a DISTRIBUTED per-file decode: one task per container file
  * (the MediaCodecs per-file-split pattern — Avro files are
  * block-synced internally, so a finer sync-marker split is the
  * upgrade path for giant single files; multi-file layouts, the
  * default produced by [[AvroDatastore.write]], already parallelise).
  * Write streams each partition through its own `DataFileWriter`, one
  * container per partition — no driver funnel in either direction.
  *
  * Type surface (documented, checked): boolean / int / long / float /
  * double / string / bytes, nullable via `union(null, T)`, and arrays
  * of those — the interchange subset the engine's tables use.
  * Logical types (decimal/timestamp) are out of scope and rejected
  * loudly rather than mis-decoded.
  */
object Avro {

  // ------------------------------------------------------------------
  // schema mapping
  // ------------------------------------------------------------------

  /** Spark → Avro schema (every field nullable via union(null, T),
    * matching Spark's nullable-by-default semantics).
    */
  def sparkToAvro(st: StructType, name: String): Schema = {
    val fields = new java.util.ArrayList[Schema.Field]()
    st.fields.foreach { f =>
      val s = nullable(typeToAvro(f.dataType, f.name))
      fields.add(new Schema.Field(f.name, s, null, Schema.Field.NULL_DEFAULT_VALUE))
    }
    Schema.createRecord(name, null, "graft.avro", false, fields)
  }

  private def nullable(s: Schema): Schema =
    Schema.createUnion(java.util.Arrays.asList(
      Schema.create(Schema.Type.NULL), s))

  private def typeToAvro(dt: DataType, field: String): Schema = dt match {
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
    case LongType => Schema.create(Schema.Type.LONG)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case ArrayType(et, _) => Schema.createArray(nullable(typeToAvro(et, field)))
    case other => throw new IllegalArgumentException(
      s"AvroDatastore: unsupported Spark type $other for field '$field' " +
        "(supported: boolean/int/long/float/double/string/binary + arrays)")
  }

  /** Avro → Spark schema (union(null, T) → nullable T). */
  def avroToSpark(s: Schema): StructType = {
    require(s.getType == Schema.Type.RECORD,
      s"AvroDatastore: top-level schema must be a record, got ${s.getType}")
    StructType(s.getFields.toArray.map { f0 =>
      val f = f0.asInstanceOf[Schema.Field]
      StructField(f.name(), avroTypeToSpark(unwrap(f.schema()), f.name()))
    })
  }

  /** Strip the null branch of a nullable union. */
  private def unwrap(s: Schema): Schema =
    if (s.getType != Schema.Type.UNION) s
    else {
      val branches = s.getTypes.toArray.map(_.asInstanceOf[Schema])
        .filter(_.getType != Schema.Type.NULL)
      require(branches.length == 1,
        s"AvroDatastore: only union(null, T) unions are supported, got $s")
      branches(0)
    }

  private def avroTypeToSpark(s: Schema, field: String): DataType =
    s.getType match {
      case Schema.Type.BOOLEAN => BooleanType
      case Schema.Type.INT => IntegerType
      case Schema.Type.LONG => LongType
      case Schema.Type.FLOAT => FloatType
      case Schema.Type.DOUBLE => DoubleType
      case Schema.Type.STRING => StringType
      case Schema.Type.BYTES => BinaryType
      case Schema.Type.ARRAY =>
        ArrayType(avroTypeToSpark(unwrap(s.getElementType), field))
      case other => throw new IllegalArgumentException(
        s"AvroDatastore: unsupported Avro type $other for field '$field'")
    }

  // ------------------------------------------------------------------
  // value mapping (per row, executor-side)
  // ------------------------------------------------------------------

  private def toAvroValue(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (b: Array[Byte], BinaryType) => java.nio.ByteBuffer.wrap(b)
    case (s: scala.collection.Seq[_], ArrayType(et, _)) =>
      val l = new java.util.ArrayList[Any](s.length)
      s.foreach(x => l.add(toAvroValue(x, et)))
      l
    case (x, _) => x
  }

  private def fromAvroValue(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (u: CharSequence, StringType) => u.toString
    case (bb: java.nio.ByteBuffer, BinaryType) =>
      val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
    case (l: java.util.Collection[_], ArrayType(et, _)) =>
      val out = new scala.collection.mutable.ArrayBuffer[Any](l.size())
      val it = l.iterator()
      while (it.hasNext) out += fromAvroValue(it.next(), et)
      out.toSeq
    case (x, _) => x
  }

  // ------------------------------------------------------------------
  // distributed read / write
  // ------------------------------------------------------------------

  private def listAvroFiles(spark: SparkSession, path: String): Seq[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(p), s"AvroDatastore: no such path $path")
    if (fs.getFileStatus(p).isFile) Seq(path)
    else fs.listStatus(p).toSeq.filter(_.isFile)
      .map(_.getPath.toString).filter(_.endsWith(".avro")).sorted
  }

  /** Read a container file's schema (driver-side, first file only). */
  private def fileSchema(path: String): Schema = {
    val in = new org.apache.avro.mapred.FsInput(
      new Path(path), new Configuration())
    val rd = new DataFileReader[GenericRecord](
      in, new GenericDatumReader[GenericRecord]())
    try rd.getSchema finally rd.close()
  }

  /** Distributed read: schema off the first file, one decode task per
    * container file.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val files = listAvroFiles(spark, path)
    require(files.nonEmpty, s"AvroDatastore: no .avro files under $path")
    val st = avroToSpark(fileSchema(files.head))
    val fieldTypes = st.fields.map(_.dataType)
    val n = st.fields.length
    val rdd = spark.sparkContext
      .parallelize(files, files.length)
      .flatMap { f =>
        val in = new org.apache.avro.mapred.FsInput(
          new Path(f), new Configuration())
        val rd = new DataFileReader[GenericRecord](
          in, new GenericDatumReader[GenericRecord]())
        val it = new Iterator[Row] {
          def hasNext: Boolean = { val h = rd.hasNext; if (!h) rd.close(); h }
          def next(): Row = {
            val rec = rd.next()
            val vals = new Array[Any](n)
            var i = 0
            while (i < n) {
              vals(i) = fromAvroValue(rec.get(i), fieldTypes(i)); i += 1
            }
            Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(vals))
          }
        }
        it
      }
    spark.createDataFrame(rdd, st)
  }

  /** Distributed write: one container file per non-empty partition,
    * deflate-compressed (codec from avro-core, no extra dependency).
    */
  def write(spark: SparkSession, df: DataFrame, path: String,
      mode: String): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    mode match {
      case "overwrite" => if (fs.exists(p)) fs.delete(p, true)
      case "append" => ()
      case other => throw new IllegalArgumentException(
        s"AvroDatastore: unsupported write mode '$other'")
    }
    fs.mkdirs(p)
    val st = df.schema
    val schemaJson = sparkToAvro(st, "row").toString
    val fieldTypes = st.fields.map(_.dataType)
    val uid = java.util.UUID.randomUUID().toString.take(8)
    df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      if (rows.isEmpty) Iterator.empty
      else {
        val schema = new Schema.Parser().parse(schemaJson)
        val out = new Path(path, f"part-$pid%05d-$uid.avro")
        val os = out.getFileSystem(new Configuration()).create(out, true)
        val w = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](schema))
        w.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
        w.create(schema, os)
        var cnt = 0L
        rows.foreach { r =>
          val rec = new GenericData.Record(schema)
          var i = 0
          while (i < fieldTypes.length) {
            rec.put(i, Avro.toAvroValue(r.get(i), fieldTypes(i))); i += 1
          }
          w.append(rec)
          cnt += 1
        }
        w.close()
        Iterator.single(cnt)
      }
    }.count() // materialise the write
    ()
  }
}

/** Directory of Avro container tables: `<dir>/<table>.avro/part-*.avro`
  * (a bare `<table>.avro` FILE also reads). The third columnar-ish
  * interchange sibling of [[OrcDatastore]]/[[ParquetDatastore]], built
  * on avro-core ([[Avro]]) because the spark-avro connector is absent
  * in this deployment.
  */
case class AvroDatastore(dir: String) extends Datastore {
  def read(spark: SparkSession, table: String): DataFrame =
    Avro.read(spark, s"$dir/$table.avro")

  override def write(spark: SparkSession, df: DataFrame, table: String,
      mode: String = "overwrite"): Unit =
    Avro.write(spark, df, s"$dir/$table.avro", mode)

  override def tableNames(spark: SparkSession): Seq[String] = {
    val d = new java.io.File(dir)
    Option(d.list()).getOrElse(Array.empty[String]).toSeq
      .filter(_.endsWith(".avro")).map(_.stripSuffix(".avro")).sorted
  }
}
