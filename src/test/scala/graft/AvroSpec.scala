package graft

import graft.io.{Avro, AvroDatastore}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The avro-core interchange codec (io/Avro.scala): schema mapping
  * both ways, typed round trips over the supported surface (scalars,
  * nullable unions, binary, arrays), the distributed multi-file
  * layout, and the Datastore contract (tableNames, modes, loud
  * rejection of out-of-scope types).
  */
class AvroSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("avro").toString

  test("schema mapping round-trips the supported surface") {
    val st = StructType(Seq(
      StructField("b", BooleanType), StructField("i", IntegerType),
      StructField("l", LongType), StructField("f", FloatType),
      StructField("d", DoubleType), StructField("s", StringType),
      StructField("bin", BinaryType),
      StructField("af", ArrayType(FloatType)),
      StructField("as", ArrayType(StringType))))
    assert(Avro.avroToSpark(Avro.sparkToAvro(st, "row")) === st)
  }

  test("typed round trip: scalars, nulls, binary, float arrays") {
    val dir = tmp()
    val ds = AvroDatastore(dir)
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, "alpha", 1.5, Array[Byte](1, 2, 3), Seq(0.5f, -2.0f), true),
        Row(2L, null, null, null, null, false),
        Row(3L, "", -0.0, Array.empty[Byte], Seq.empty[Float], null)),
      StructType(Seq(
        StructField("id", LongType), StructField("s", StringType),
        StructField("d", DoubleType), StructField("bin", BinaryType),
        StructField("emb", ArrayType(FloatType)),
        StructField("flag", BooleanType))))
    ds.write(spark, df, "t")
    val back = ds.read(spark, "t").orderBy("id").collect()
    assert(back.length === 3)
    assert(back(0).getLong(0) === 1L)
    assert(back(0).getString(1) === "alpha")
    assert(back(0).getDouble(2) === 1.5)
    assert(back(0).getAs[Array[Byte]](3).toSeq === Seq[Byte](1, 2, 3))
    assert(back(0).getSeq[Float](4) === Seq(0.5f, -2.0f))
    assert(back(0).getBoolean(5) === true)
    assert(back(1).isNullAt(1) && back(1).isNullAt(2) &&
      back(1).isNullAt(3) && back(1).isNullAt(4))
    assert(back(2).getString(1) === "")
    assert(back(2).getAs[Array[Byte]](3).length === 0)
    assert(back(2).getSeq[Float](4).isEmpty)
    assert(back(2).isNullAt(5))
  }

  test("multi-file layout: one container per non-empty partition, " +
      "one decode task per file, values exact") {
    val dir = tmp()
    val ds = AvroDatastore(dir)
    val df = spark.range(0, 1000).repartition(7)
      .select(col("id"), concat(lit("doc "), col("id")).as("text"))
    ds.write(spark, df, "docs")
    val files = new java.io.File(s"$dir/docs.avro")
      .listFiles().filter(_.getName.endsWith(".avro"))
    assert(files.length > 1 && files.length <= 7)
    val back = ds.read(spark, "docs")
    assert(back.rdd.getNumPartitions === files.length)
    assert(back.count() === 1000L)
    assert(back.agg(sum(col("id"))).head.getLong(0) === 499500L)
    assert(back.where(col("text") =!= concat(lit("doc "), col("id")))
      .count() === 0L)
  }

  test("corpus-table round trip: documents and embeddings read back " +
      "bit-equal through the avro layer") {
    val dir = tmp()
    val ds = AvroDatastore(dir)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ds.write(spark, docs, "documents")
    val backDocs = ds.read(spark, "documents")
    assert(backDocs.schema === docs.schema)
    assert(backDocs.exceptAll(docs).count() === 0L)
    assert(docs.exceptAll(backDocs).count() === 0L)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    ds.write(spark, emb, "embeddings")
    val backEmb = ds.read(spark, "embeddings")
    assert(backEmb.exceptAll(emb).count() === 0L)
    assert(emb.exceptAll(backEmb).count() === 0L)
  }

  test("datastore contract: tableNames, append mode, overwrite, and " +
      "loud rejection of unsupported types") {
    val dir = tmp()
    val ds = AvroDatastore(dir)
    ds.write(spark, Seq((1L, "a")).toDF("k", "v"), "t1")
    ds.write(spark, Seq((2L, "b")).toDF("k", "v"), "t2")
    assert(ds.tableNames(spark) === Seq("t1", "t2"))
    ds.write(spark, Seq((3L, "c")).toDF("k", "v"), "t1", mode = "append")
    assert(ds.read(spark, "t1").count() === 2L)
    ds.write(spark, Seq((9L, "z")).toDF("k", "v"), "t1")
    assert(ds.read(spark, "t1").collect().map(_.getLong(0)).toSeq === Seq(9L))
    val bad = Seq((1L, java.sql.Timestamp.valueOf("2020-01-01 00:00:00")))
      .toDF("k", "ts")
    assertThrows[IllegalArgumentException] { ds.write(spark, bad, "t3") }
  }

  test("sync-marker splits: one multi-block container file decodes " +
      "across >1 partition with bit-equal rows") {
    val dir = tmp()
    // one container FILE (coalesce(1)) with many small blocks (tiny
    // syncInterval) — payload big enough that splitBytes cuts it
    val df = spark.range(0, 20000)
      .select(col("id"), concat(lit("row-"), col("id")).as("s"),
        (col("id").cast("double") / 7.0).as("d"))
    Avro.write(spark, df.coalesce(1), s"$dir/t.avro", "overwrite",
      syncInterval = 256)
    val files = new java.io.File(s"$dir/t.avro")
      .listFiles().filter(_.getName.endsWith(".avro"))
    assert(files.length === 1, "expected exactly one container file")
    val len = files(0).length()
    assert(len > 40000, s"fixture too small to split: $len bytes")
    val split = Avro.read(spark, s"$dir/t.avro", splitBytes = len / 5)
    assert(split.rdd.getNumPartitions > 1,
      "a multi-block file must decode across more than one task")
    // every split-task partition is non-trivially used (blocks really
    // distribute across ranges, not all funnel to split 0)
    val perPart = split.rdd
      .mapPartitions(it => Iterator.single(it.size)).collect()
    assert(perPart.count(_ > 0) > 1,
      s"blocks decoded in one split only: ${perPart.toSeq}")
    assert(perPart.sum === 20000)
    // bit-equal to the unsplit read AND the source frame
    val whole = Avro.read(spark, s"$dir/t.avro")
    assert(split.exceptAll(whole).count() === 0L)
    assert(whole.exceptAll(split).count() === 0L)
    assert(split.exceptAll(df).count() === 0L)
    assert(df.exceptAll(split).count() === 0L)
  }

  test("short/byte columns widen to Avro INT and write cleanly") {
    val dir = tmp()
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, 7.toShort, 3.toByte), Row(2L, null, null)),
      StructType(Seq(StructField("id", LongType),
        StructField("sh", ShortType), StructField("by", ByteType))))
    Avro.write(spark, df, s"$dir/t.avro", "overwrite")
    val back = Avro.read(spark, s"$dir/t.avro").orderBy("id").collect()
    assert(back(0).getInt(1) === 7 && back(0).getInt(2) === 3)
    assert(back(1).isNullAt(1) && back(1).isNullAt(2))
  }

  test("append with a different schema is rejected loudly") {
    val dir = tmp()
    Avro.write(spark, Seq((1L, "a")).toDF("k", "v"), s"$dir/t.avro",
      "overwrite")
    // different column order → different Avro schema → refuse
    val ex = intercept[IllegalArgumentException] {
      Avro.write(spark, Seq(("b", 2L)).toDF("v", "k"), s"$dir/t.avro",
        "append")
    }
    assert(ex.getMessage.contains("append schema mismatch"))
    // same schema appends fine
    Avro.write(spark, Seq((2L, "b")).toDF("k", "v"), s"$dir/t.avro",
      "append")
    assert(Avro.read(spark, s"$dir/t.avro").count() === 2L)
  }
}
