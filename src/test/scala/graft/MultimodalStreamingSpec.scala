package graft

import graft.multimodal.Multimodal
import graft.streaming.StreamFlow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class MultimodalStreamingSpec extends SparkSpec {
  import spark.implicits._

  private def packed() =
    Seq((1L, "hello world"), (2L, "other payload"))
      .toDF("id", "text")
      .select(col("id"), Multimodal.packText(col("text")).as("media"))

  test("packText builds the canonical media struct with UTF-8 payload") {
    val r = packed().orderBy("id").head()
    val media = r.getStruct(1)
    assert(media.getAs[Array[Byte]]("data").toSeq ==
      "hello world".getBytes("UTF-8").toSeq)
    assert(media.getAs[String]("mime") == "text/plain")
    assert(media.isNullAt(media.fieldIndex("width")))
  }

  test("payloadBytes and contentDigest are exact") {
    val r = packed().orderBy("id")
      .select(
        Multimodal.payloadBytes(col("media")).as("n"),
        Multimodal.contentDigest(col("media")).as("d"))
      .head()
    assert(r.getInt(0) == 11)
    assert(r.getString(1) ==
      "5eb63bbbe01eeed093cb22bb8f5acdc3") // md5("hello world")
  }

  test("featurize (mapPartitions kernel) matches digestFeatures columns") {
    val viaKernel = Multimodal.featurize(packed(), "media", "feat")
      .select(col("id"), col("feat")).orderBy("id").collect()
      .map(_.getSeq[Double](1).toSeq)
    val viaColumns = packed()
      .select(col("id"),
        Multimodal.digestFeatures(col("media"), 4).as("feat"))
      .orderBy("id").collect().map(_.getSeq[Double](1).toSeq)
    assert(viaKernel.toSeq == viaColumns.toSeq)
    assert(viaKernel.forall(f => f.size == 4 &&
      f.forall(v => v >= 0.0 && v < 1.0)))
  }

  test("featurize preserves partitioning (no shuffle)") {
    val df = packed().repartition(3)
    val out = Multimodal.featurize(df, "media", "feat")
    assert(out.rdd.getNumPartitions == 3)
  }

  test("resizeMeta stamps raster metadata without touching bytes") {
    val h = packed().select(
      Multimodal.resizeMeta(col("media"), 640, 480).as("m")).head().getStruct(0)
    assert(h.getAs[Int]("width") == 640 && h.getAs[Int]("height") == 480)
    assert(h.getAs[Array[Byte]]("data").nonEmpty)
  }

  test("frameSample explodes n chunks that reassemble the payload") {
    val frames = Multimodal.frameSample(packed().filter(col("id") === 1), "media", 4)
      .orderBy("frame_idx")
      .select(col("frame_idx"), col("frame_data"))
      .collect()
    assert(frames.length == 4)
    val joined = frames.flatMap(_.getAs[Array[Byte]](1)).toSeq
    assert(joined == "hello world".getBytes("UTF-8").toSeq)
  }

  test("streaming windowed agg over a parquet file matches batch totals") {
    val dir = java.nio.file.Files.createTempDirectory("stream-src").toString
    val events = Seq(
      ("2024-01-01 00:10:00", "click", 1.0),
      ("2024-01-01 00:50:00", "click", 2.0),
      ("2024-01-01 01:10:00", "view", 5.0))
      .toDF("ts_str", "event_type", "value")
      .select(to_timestamp(col("ts_str")).as("ts"),
        col("event_type"), col("value"))
    events.write.mode("overwrite").parquet(dir)
    val schema = StructType(Seq(
      StructField("ts", TimestampType),
      StructField("event_type", StringType),
      StructField("value", DoubleType)))
    val stream = StreamFlow.readParquetStream(spark, dir, schema)
    val agg = StreamFlow.windowedAgg(stream, "ts", "1 hour", "10 minutes",
      Seq("event_type"),
      Seq(count(lit(1)).as("n"), sum("value").as("total")))
    val got = StreamFlow.runToMemory(agg, spark, "spec_stream")
      .select(date_format(col("window.start"), "HH:mm").as("w"),
        col("event_type"), col("n"), col("total"))
      .orderBy("w").collect()
    assert(got.map(r => (r.getString(0), r.getString(1), r.getLong(2),
      r.getDouble(3))).toSeq ==
      Seq(("00:00", "click", 2L, 3.0), ("01:00", "view", 1L, 5.0)))
  }

  test("stream-stream left-outer join flushes unmatched tail rows") {
    // the sentinel harness must emit EVERY unmatched click — including
    // those near the end of the bounded source, whose outer state a
    // plain drain strands in the state store
    val dir = "/root/testdata/sf0.001"
    val got = graft.queries.StreamingQueries.defs("q_stream_join_outer")(
      spark, dir).collect()
    assert(got.nonEmpty)
    assert(got.exists(_.isNullAt(1)), "no null-padded outer rows emitted")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.schema(graft.queries.Q.EventsSchema)
      .parquet(s"$dir/events.parquet")
      .select(col("user_id"), col("event_id"),
        col("event_type"), expr("ts div 1000").as("us"))
    val c = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("us").as("cus"))
    val p = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("event_id").as("purchase_id"),
        col("us").as("pus"))
    val batch = c.join(p, col("user_id") === col("pu") &&
        col("pus") >= col("cus") - 3600000000L && col("pus") <= col("cus"),
      "left")
      .select("click_id", "purchase_id", "user_id")
      .orderBy("click_id", "purchase_id").collect()
    assert(got.toSeq === batch.toSeq)
  }

  test("incremental sessionize is split-count invariant") {
    import graft.queries.StreamingQueries
    val min = 60L * 1000 * 1000
    // epoch-0 timestamps collide with the initial watermark and are
    // dropped as late — base the timeline in 2024 like real data
    val t0 = 1704067200L * 1000 * 1000
    // u1: two sessions ([0,10], [60,75]) split across batch boundaries
    // when nSplits>1; u2: singleton sessions far apart
    val events = Seq(
      (1L, t0), (1L, t0 + 10 * min), (1L, t0 + 60 * min),
      (1L, t0 + 75 * min), (2L, t0 + 5 * min), (2L, t0 + 200 * min))
      .toDF("user_id", "ts_us")
    val expected = Seq(
      (1L, 1, 2L, t0, t0 + 10 * min),
      (1L, 2, 2L, t0 + 60 * min, t0 + 75 * min),
      (2L, 1, 1L, t0 + 5 * min, t0 + 5 * min),
      (2L, 2, 1L, t0 + 200 * min, t0 + 200 * min))
    Seq(1, 4).foreach { n =>
      val dir = java.nio.file.Files
        .createTempDirectory(s"sess-split-$n").toString
      val got = StreamingQueries.sessionize(
        spark, events, s"$dir/splits", n, s"spec_sess_$n")
        .orderBy("user_id", "session_idx")
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSeq
      assert(got == expected, s"nSplits=$n")
    }
  }
}
