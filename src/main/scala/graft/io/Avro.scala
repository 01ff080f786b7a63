package graft.io

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file interchange on the BUNDLED avro-core jars
  * (avro/avro-mapred ship on the Spark classpath; the spark-avro
  * connector does not in this deployment) — the Xlsx precedent: when
  * the format library is absent, the engine carries its own
  * dependency-light codec and keeps the Spark-side contract real.
  *
  * Read is a DISTRIBUTED sync-marker-split decode: every container
  * file is cut into byte ranges of [[DefaultSplitBytes]] and each task
  * seeks to the first block sync at-or-after its range start
  * (`DataFileReader.sync`) and decodes until the first sync past its
  * range end (`pastSync`) — the standard Avro input-split contract, so
  * ONE giant container file decodes across many tasks, and multi-file
  * layouts parallelise per file on top. Write streams each partition
  * through its own `DataFileWriter`, one container per partition — no
  * driver funnel in either direction.
  *
  * Type surface (documented, checked): boolean / int / long / float /
  * double / string / bytes, nullable via `union(null, T)`, and arrays
  * of those — the interchange subset the engine's tables use. Spark's
  * Short/Byte columns widen to Avro INT on write (and come back as
  * IntegerType — Avro has no narrower integer). Logical types
  * (decimal/timestamp) are out of scope and rejected loudly rather
  * than mis-decoded.
  *
  * Schema discipline: records decode by field position against the
  * FIRST file's schema, so every read task verifies its own file's
  * schema equals the expected one (fail loudly, never misalign), and
  * `write(mode="append")` refuses a frame whose Avro schema differs
  * from the files already in the directory.
  */
object Avro {

  /** Target bytes per read split — small enough that a handful of
    * executors share one multi-block file, large enough that split
    * overhead (open + seek) stays negligible.
    */
  val DefaultSplitBytes: Long = 32L * 1024 * 1024

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
    // ShortType/ByteType advertise as Avro INT — widen the boxed value
    // too, or GenericDatumWriter's union resolution (which accepts
    // Integer only) throws UnresolvedUnionException at write time
    case (x: Short, _) => Int.box(x.toInt)
    case (x: Byte, _) => Int.box(x.toInt)
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

  /** The session Hadoop conf as a serializable entry list — executor
    * tasks rebuild it instead of `new Configuration()`, so filesystem
    * settings/credentials configured on the session reach the tasks.
    */
  private def confEntries(spark: SparkSession): Seq[(String, String)] = {
    val hc = spark.sessionState.newHadoopConf()
    val it = hc.iterator()
    val out = scala.collection.mutable.ArrayBuffer[(String, String)]()
    while (it.hasNext) { val e = it.next(); out += (e.getKey -> e.getValue) }
    out.toSeq
  }

  private def rebuildConf(entries: Seq[(String, String)]): Configuration = {
    val hc = new Configuration(false)
    entries.foreach { case (k, v) => hc.set(k, v) }
    hc
  }

  private def listAvroFiles(spark: SparkSession, path: String): Seq[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(p), s"AvroDatastore: no such path $path")
    if (fs.getFileStatus(p).isFile) Seq(path)
    else fs.listStatus(p).toSeq.filter(_.isFile)
      .map(_.getPath.toString).filter(_.endsWith(".avro")).sorted
  }

  /** Read a container file's schema (driver-side, first file only). */
  private def fileSchema(spark: SparkSession, path: String): Schema = {
    val in = new org.apache.avro.mapred.FsInput(
      new Path(path), spark.sessionState.newHadoopConf())
    val rd = new DataFileReader[GenericRecord](
      in, new GenericDatumReader[GenericRecord]())
    try rd.getSchema finally rd.close()
  }

  /** Distributed read: schema off the first file (every task verifies
    * its own file matches — position-based decode must never misalign),
    * one decode task per sync-marker byte-range split, so a single
    * multi-block container file parallelises across tasks.
    */
  def read(spark: SparkSession, path: String,
      splitBytes: Long = DefaultSplitBytes): DataFrame = {
    require(splitBytes > 0, "AvroDatastore: splitBytes must be positive")
    val files = listAvroFiles(spark, path)
    require(files.nonEmpty, s"AvroDatastore: no .avro files under $path")
    val expected = fileSchema(spark, files.head)
    val expectedJson = expected.toString
    val st = avroToSpark(expected)
    val fieldTypes = st.fields.map(_.dataType)
    val n = st.fields.length
    val hc = spark.sessionState.newHadoopConf()
    // (file, rangeStart, rangeEnd) splits: a block belongs to the split
    // whose range contains its starting sync marker, so the ranges
    // partition the blocks exactly (the Avro/Hadoop input-split rule)
    val splits: Seq[(String, Long, Long)] = files.flatMap { f =>
      val len = new Path(f).getFileSystem(hc)
        .getFileStatus(new Path(f)).getLen
      val nSplits = math.max(1L, (len + splitBytes - 1) / splitBytes)
      (0L until nSplits).map { i =>
        (f, i * splitBytes, math.min(len, (i + 1) * splitBytes))
      }
    }
    val entries = confEntries(spark)
    val rdd = spark.sparkContext
      .parallelize(splits, splits.length)
      .flatMap { case (f, start, end) =>
        val in = new org.apache.avro.mapred.FsInput(
          new Path(f), rebuildConf(entries))
        val rd = new DataFileReader[GenericRecord](
          in, new GenericDatumReader[GenericRecord]())
        // partially-consumed iterators (limit/take/downstream failure)
        // must not leak the file handle — close on task completion
        Option(TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit] { _ =>
            try rd.close() catch { case _: java.io.IOException => () }
          })
        if (rd.getSchema.toString != expectedJson) {
          val got = rd.getSchema.toString
          rd.close()
          throw new IllegalStateException(
            s"AvroDatastore: $f schema differs from ${splits.head._1} — " +
              s"position-based decode would misalign.\nexpected: " +
              s"$expectedJson\ngot: $got")
        }
        rd.sync(start)
        val it = new Iterator[Row] {
          def hasNext: Boolean = {
            val h = rd.hasNext && !rd.pastSync(end)
            if (!h) rd.close()
            h
          }
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
    * `syncInterval` caps the approximate block payload bytes — smaller
    * values produce more sync points and therefore finer read splits.
    * Appending a frame whose Avro schema differs from the container
    * files already present is rejected (reads decode by position
    * against one schema — a silent mismatch would misalign).
    */
  def write(spark: SparkSession, df: DataFrame, path: String,
      mode: String, syncInterval: Int = 64 * 1024): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val st = df.schema
    val schemaJson = sparkToAvro(st, "row").toString
    mode match {
      case "overwrite" => if (fs.exists(p)) fs.delete(p, true)
      case "append" =>
        if (fs.exists(p)) listAvroFiles(spark, path).headOption.foreach {
          f =>
            val existing = fileSchema(spark, f).toString
            require(existing == schemaJson,
              s"AvroDatastore: append schema mismatch at $path —\n" +
                s"existing: $existing\nappending: $schemaJson")
        }
      case other => throw new IllegalArgumentException(
        s"AvroDatastore: unsupported write mode '$other'")
    }
    fs.mkdirs(p)
    val fieldTypes = st.fields.map(_.dataType)
    val uid = java.util.UUID.randomUUID().toString.take(8)
    val entries = confEntries(spark)
    df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      if (rows.isEmpty) Iterator.empty
      else {
        val schema = new Schema.Parser().parse(schemaJson)
        val out = new Path(path, f"part-$pid%05d-$uid.avro")
        val os = out.getFileSystem(rebuildConf(entries)).create(out, true)
        val w = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](schema))
        w.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
        w.setSyncInterval(syncInterval)
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
