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

  test("Bmp.decode parses a hand-crafted padded bottom-up file " +
      "byte for byte") {
    import graft.multimodal.MediaCodecs.Bmp
    // 3x2 24bpp: stride 12 (9 pixel bytes + 3 pad). Build the file BY
    // HAND — header fields at their absolute offsets, rows bottom-up,
    // pad bytes set to a 0xEE sentinel that must never leak out.
    val w = 3; val h = 2; val st = 12
    val data = new Array[Byte](54 + st * h)
    def le32(off: Int, v: Int): Unit = (0 until 4).foreach(i =>
      data(off + i) = ((v >> (8 * i)) & 0xff).toByte)
    def le16(off: Int, v: Int): Unit = (0 until 2).foreach(i =>
      data(off + i) = ((v >> (8 * i)) & 0xff).toByte)
    data(0) = 'B'; data(1) = 'M'
    le32(2, data.length); le32(10, 54); le32(14, 40)
    le32(18, w); le32(22, h); le16(26, 1); le16(28, 24); le32(30, 0)
    le32(34, st * h)
    // logical top row = bytes 10..18, stored LAST (bottom-up)
    val top = Array[Byte](10, 11, 12, 13, 14, 15, 16, 17, 18)
    val bot = Array[Byte](20, 21, 22, 23, 24, 25, 26, 27, 28)
    System.arraycopy(bot, 0, data, 54, 9)
    System.arraycopy(top, 0, data, 54 + st, 9)
    data(54 + 9) = 0xee.toByte; data(54 + 10) = 0xee.toByte
    data(54 + 11) = 0xee.toByte
    val img = Bmp.decode(data)
    assert(img.w == 3 && img.h == 2)
    assert(img.pixels.toSeq == (top ++ bot).toSeq)
    // negative height = top-down storage: same logical pixels
    le32(22, -h)
    System.arraycopy(top, 0, data, 54, 9)
    System.arraycopy(bot, 0, data, 54 + st, 9)
    assert(Bmp.decode(data).pixels.toSeq == (top ++ bot).toSeq)
  }

  test("Bmp encode/decode round-trips across stride classes") {
    import graft.multimodal.MediaCodecs.Bmp
    val rnd = new scala.util.Random(3)
    for (w <- 1 to 5; h <- Seq(1, 3)) {
      val px = Array.fill[Byte](3 * w * h)(rnd.nextInt(256).toByte)
      val img = Bmp.decode(Bmp.encode(w, h, px))
      assert(img.w == w && img.h == h && img.pixels.toSeq == px.toSeq,
        s"w=$w h=$h")
      assert(Bmp.encode(w, h, px).length == Bmp.fileSize(w, h))
    }
  }

  test("Wav.decode walks chunks, skips LIST, and preserves sign") {
    import graft.multimodal.MediaCodecs.Wav
    val samples = Array[Short](0, 1, -1, 32767, -32768, 12345, -12345)
    val plain = Wav.encode(8000, samples)
    val au = Wav.decode(plain)
    assert(au.sampleRate == 8000 && au.samples.toSeq == samples.toSeq)
    // splice an unknown LIST chunk (odd length → word-aligned skip)
    // between fmt and data; a real-tool WAV often carries one
    val listBody = "INFOx".getBytes("US-ASCII") // 5 bytes, odd
    val spliced = new java.io.ByteArrayOutputStream()
    spliced.write(plain, 0, 36) // up to end of fmt chunk
    spliced.write("LIST".getBytes("US-ASCII"))
    spliced.write(Array[Byte](5, 0, 0, 0)) // le32 length 5
    spliced.write(listBody); spliced.write(0) // pad to even
    spliced.write(plain, 36, plain.length - 36) // data chunk onward
    val arr = spliced.toByteArray
    // fix the RIFF size field (bytes 4..7): total - 8
    (0 until 4).foreach(i =>
      arr(4 + i) = (((arr.length - 8) >> (8 * i)) & 0xff).toByte)
    val au2 = Wav.decode(arr)
    assert(au2.samples.toSeq == samples.toSeq)
  }

  test("BmpStatsKernel features are the hand-computed pixel stats") {
    import graft.multimodal.MediaCodecs.{Bmp, BmpStatsKernel}
    // 2x2: top row pixels (B,G,R) = (10,20,30),(40,50,60);
    // bottom row = (70,80,90),(100,110,120)
    val px = Array[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120)
    val f = BmpStatsKernel.features(Bmp.encode(2, 2, px))
    assert(f(0) == 2.0 && f(1) == 2.0)
    assert(f(2) == (10.0 + 40 + 70 + 100) / (4 * 255)) // mean B
    assert(f(3) == (20.0 + 50 + 80 + 110) / (4 * 255)) // mean G
    assert(f(4) == (30.0 + 60 + 90 + 120) / (4 * 255)) // mean R
    // top half = logical FIRST row only — catches a bottom-up bug
    assert(f(5) == (10.0 + 20 + 30 + 40 + 50 + 60) / (6 * 255))
  }

  test("WavEnergyKernel band RMS matches the naive computation") {
    import graft.multimodal.MediaCodecs.{Wav, WavEnergyKernel}
    val samples = Array[Short](3, -4, 5, 0, 100, -100, 7, -24, 32000)
    val f = WavEnergyKernel.features(Wav.encode(44100, samples))
    val n = samples.length; val base = n / 4
    val want = (0 until 4).map { b =>
      val until = if (b == 3) n else (b + 1) * base
      val sl = samples.slice(b * base, until).map(_.toLong)
      math.sqrt(sl.map(x => x * x).sum.toDouble / sl.length) / 32768.0
    }
    assert(f.toSeq == want)
  }

  test("Synthetic media decodes back to the closed-form generator") {
    import graft.multimodal.MediaCodecs.{Bmp, Synthetic, Wav}
    Seq(0L, 7L, 62L, 123L).foreach { id =>
      val img = Bmp.decode(Synthetic.bmpFor(id))
      assert(img.w == Synthetic.bmpWidth(id) &&
        img.h == Synthetic.bmpHeight(id))
      img.pixels.zipWithIndex.foreach { case (p, j) =>
        assert((p & 0xff) == (id * 131 + j * 31 + 7) % 256, s"id=$id j=$j")
      }
      val au = Wav.decode(Synthetic.wavFor(id))
      assert(au.samples.length == Synthetic.wavSamples(id))
      au.samples.zipWithIndex.foreach { case (sm, i) =>
        assert(sm == (id * 7919 + i * 104729 + 13) % 65536 - 32768,
          s"id=$id i=$i")
      }
    }
  }

  test("ImageDHash: brightness-shift invariant, edit-local, id-discriminative") {
    import graft.multimodal.MediaCodecs
    import graft.multimodal.MediaCodecs.{Bmp, ImageDHash}
    def hashOf(bytes: Array[Byte]): Long = ImageDHash.hash(Bmp.decode(bytes))
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    // exact invariance under a uniform brightness shift (no clamping in
    // range): every luminance moves together, no gradient flips
    val w = 12; val h = 8
    val px = Array.tabulate(3 * w * h)(j => ((j * 37 + 11) % 200).toByte)
    val brighter = px.map(v => ((v & 0xff) + 40).toByte)
    assert(hashOf(Bmp.encode(w, h, px)) == hashOf(Bmp.encode(w, h, brighter)))
    // perturbed generator copies stay within the banding's Hamming radius
    // for most ids (clamp effects can cost a couple of bits); unrelated
    // images sit near the random-hash expectation of ~30
    val near = (0L until 200L by 10).map { id =>
      hamming(hashOf(MediaCodecs.Synthetic.bmpTexturedFor(id)),
        hashOf(MediaCodecs.Synthetic.bmpTexturedPerturbedFor(id)))
    }
    assert(near.count(_ <= 3) >= near.size * 8 / 10,
      s"perturbed copies should mostly pair: $near")
    val far = (0L until 50L).map { id =>
      hamming(hashOf(MediaCodecs.Synthetic.bmpTexturedFor(id)),
        hashOf(MediaCodecs.Synthetic.bmpTexturedFor(id + 1)))
    }
    assert(far.count(_ > 3) >= far.size * 9 / 10,
      s"distinct images should not pair: $far")
  }

  test("hammingPairs over image dHashes pairs copies with their originals") {
    import graft.multimodal.MediaCodecs
    import graft.multimodal.MediaCodecs.{Bmp, ImageDHash}
    val ids = (0L until 40L)
    val rows = ids.map(id => (id,
      ImageDHash.hash(Bmp.decode(
        MediaCodecs.Synthetic.bmpTexturedFor(id))))) ++
      ids.filter(_ % 10 == 0).map(id => (id + 1000L,
        ImageDHash.hash(Bmp.decode(
          MediaCodecs.Synthetic.bmpTexturedPerturbedFor(id)))))
    val hashed = rows.toDF("doc", "h")
    val pairs = graft.dedup.Dedup.hammingPairs(hashed, "doc", "h")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute-force truth over the same hashes
    val truth = (for {
      (a, ha) <- rows; (b, hb) <- rows if a < b
      if java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (a, b)).toSet
    assert(pairs == truth, "banding must match the brute-force pair set")
    assert(truth.nonEmpty && truth.forall { case (a, b) => b - a == 1000L },
      s"expected only original->copy pairs, got $truth")
  }

  test("AudioEnergyHash: gain-invariant, DC-offset-local, id-discriminative") {
    import graft.multimodal.MediaCodecs
    import graft.multimodal.MediaCodecs.{AudioEnergyHash, Wav}
    def hashOf(bytes: Array[Byte]): Long =
      AudioEnergyHash.hash(Wav.decode(bytes))
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    // exact invariance under integer gain (energies scale by g² together)
    val samples = Array.tabulate(100)(i => ((i * 733 + 17) % 2000 - 1000).toShort)
    val louder = samples.map(s => (s * 3).toShort)
    assert(hashOf(Wav.encode(8000, samples)) ==
      hashOf(Wav.encode(8000, louder)))
    // DC-offset copies pair; distinct ids do not
    val near = (0L until 200L by 10).map { id =>
      hamming(hashOf(MediaCodecs.Synthetic.wavTexturedFor(id)),
        hashOf(MediaCodecs.Synthetic.wavTexturedPerturbedFor(id)))
    }
    assert(near.count(_ <= 3) >= near.size * 8 / 10,
      s"offset copies should mostly pair: $near")
    val far = (0L until 50L).map { id =>
      hamming(hashOf(MediaCodecs.Synthetic.wavTexturedFor(id)),
        hashOf(MediaCodecs.Synthetic.wavTexturedFor(id + 1)))
    }
    assert(far.count(_ > 3) >= far.size * 9 / 10,
      s"distinct audio should not pair: $far")
  }

  test("Avi encode/decode round-trips frames across stride classes") {
    import graft.multimodal.MediaCodecs.Avi
    for (w <- Seq(8, 9, 10, 11); h <- Seq(4, 5)) {
      val frames = (0 until 4).map(t =>
        Array.tabulate(3 * w * h)(j => ((t * 41 + j * 13 + 5) % 251).toByte))
      val v = Avi.decode(Avi.encode(w, h, frames))
      assert(v.w == w && v.h == h && v.frames.length == 4)
      frames.zip(v.frames).foreach { case (a, b) =>
        assert(a.sameElements(b), s"frame mismatch at w=$w h=$h")
      }
    }
  }

  test("Avi.decode skips unknown chunks (JUNK) and honors strf layout") {
    import graft.multimodal.MediaCodecs.Avi
    val w = 9; val h = 4
    val frame = Array.tabulate(3 * w * h)(j => ((j * 7 + 3) % 256).toByte)
    val enc = Avi.encode(w, h, Seq(frame))
    // splice a JUNK chunk between hdrl and movi: find the movi LIST and
    // insert 8+4 bytes of JUNK before it
    val moviAt = enc.indexOfSlice("movi".getBytes.toSeq) - 8
    val junk = Array[Byte]('J', 'U', 'N', 'K', 4, 0, 0, 0, 1, 2, 3, 4)
    val spliced = enc.take(moviAt) ++ junk ++ enc.drop(moviAt)
    // patch the RIFF size field
    val sz = spliced.length - 8
    spliced(4) = (sz & 0xff).toByte; spliced(5) = ((sz >> 8) & 0xff).toByte
    spliced(6) = ((sz >> 16) & 0xff).toByte
    spliced(7) = ((sz >> 24) & 0xff).toByte
    val v = Avi.decode(spliced)
    assert(v.w == w && v.h == h && v.frames.length == 1)
    assert(v.frames(0).sameElements(frame))
  }

  test("VideoTemporalHash: brightness-invariant, 50/50 copies, 0 spurious") {
    import graft.multimodal.MediaCodecs
    import graft.multimodal.MediaCodecs.{Avi, VideoTemporalHash}
    def hashOf(bytes: Array[Byte]): Long =
      VideoTemporalHash.hash(Avi.decode(bytes))
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    // exact invariance under a uniform brightness shift across the clip
    val w = 11; val h = 6
    val frames = (0 until 6).map(t =>
      Array.tabulate(3 * w * h)(j => ((t * 31 + j * 37 + 11) % 200).toByte))
    val brighter = frames.map(_.map(v => ((v & 0xff) + 40).toByte))
    assert(hashOf(Avi.encode(w, h, frames)) ==
      hashOf(Avi.encode(w, h, brighter)))
    // the oracle-facing claim over the full sf0.01 id range: every
    // perturbed copy pairs with its original and NOTHING else does
    val ids = (0L until 500L)
    val hs = ids.map(id => id -> hashOf(
      MediaCodecs.Synthetic.aviTexturedFor(id))).toMap
    val copies = ids.filter(_ % 10 == 0).map(id => id -> hashOf(
      MediaCodecs.Synthetic.aviTexturedPerturbedFor(id)))
    assert(copies.forall { case (id, ph) => hamming(hs(id), ph) <= 3 },
      "every perturbed copy must stay within the banding radius")
    val all = hs.toSeq ++ copies.map { case (id, ph) => (id + 1000000L, ph) }
    val spurious = for {
      (a, ha) <- all; (b, hb) <- all
      if a < b && (b - a != 1000000L) && hamming(ha, hb) <= 3
    } yield (a, b)
    assert(spurious.isEmpty, s"spurious pairs: ${spurious.take(5)}")
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

  test("stateful drains run on the RocksDB state store provider") {
    // a stateful dedup with an explicit checkpoint: after the drain the
    // state dir must hold RocksDB artifacts (zip snapshots/changelogs),
    // NOT the HDFS provider's .delta files — proving the provider took,
    // not merely that the conf string was set
    val ckpt = java.nio.file.Files
      .createTempDirectory("rocks-ckpt").toString
    val src = java.nio.file.Files.createTempDirectory("rocks-src").toString
    Seq((1L, "2024-01-01 00:10:00"), (1L, "2024-01-01 00:11:00"),
      (2L, "2024-01-01 00:12:00"))
      .toDF("id", "ts_str")
      .select(col("id"), to_timestamp(col("ts_str")).as("ts"))
      .write.mode("overwrite").parquet(src)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("ts", TimestampType)))
    val dedup = StreamFlow.readParquetStream(spark, src, schema)
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("id")
    val got = StreamFlow.runToMemory(dedup, spark, "spec_rocks",
      outputMode = "append", checkpointLocation = Some(ckpt))
    assert(got.count() == 2)
    assert(spark.conf.get("spark.sql.streaming.stateStore.providerClass")
      == StreamFlow.StateStoreProvider)
    import scala.jdk.CollectionConverters._
    val stateFiles = java.nio.file.Files
      .walk(java.nio.file.Paths.get(ckpt, "state"))
      .iterator().asScala.map(_.getFileName.toString).toSeq
    // with changelog checkpointing RocksDB writes per-batch .changelog
    // deltas (full .zip snapshots only at snapshot intervals); the HDFS
    // provider writes neither — it writes .delta files
    assert(stateFiles.exists(f =>
      f.endsWith(".changelog") || f.endsWith(".zip")),
      s"no RocksDB artifacts under $ckpt/state: $stateFiles")
    assert(!stateFiles.exists(_.endsWith(".delta")),
      "HDFS-provider .delta files present - RocksDB did not take")
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
      .select(col("user_id"), col("event_id"), col("event_type"),
        graft.queries.Q.eventsTsUs(spark, dir).as("us"))
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
