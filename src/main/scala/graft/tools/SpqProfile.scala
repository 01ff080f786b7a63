package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Phase-timing harness for the q_stream_ann_pq bimodality diagnosis
  * (round-12 isolated runs split 12.7s vs 24.7s at sf0.1, a clean 2×
  * mode): replicates the query's exact phases with per-phase wall
  * timers so the variance can be attributed. Dev measurement tool —
  * not part of the query surface.
  *
  * Usage: SPARK_GRAFT_SF_DIR=… SPARK_GRAFT_CPUS=32 runMain
  * graft.tools.SpqProfile; prints one JSON line of phase seconds.
  */
object SpqProfile {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env("SPARK_GRAFT_SF_DIR")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")

    val t = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def phase[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      t(name) = (System.nanoTime() - t0) / 1e9
      r
    }

    import graft.similarity.{ProductQuantizer, StreamingPq}
    import graft.queries.SimilarityQueries
    import graft.streaming.StreamFlow

    val reps = sys.env.getOrElse("SPARK_GRAFT_SPQ_REPS", "1").toInt
    for (_ <- 1 to reps) {
    t.clear()
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    val emb = s.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val base = java.nio.file.Files
      .createTempDirectory("graft_spq_prof").toString
    val postingsDir = base + "/postings"
    phase("init")(StreamingPq.initState(s, postingsDir))
    phase("splits")(
      StreamFlow.writeTimeSplits(emb, "vec_id", 3, base + "/splits"))
    val books = phase("train") {
      val bRow = emb.agg(min(col("vec_id")), max(col("vec_id")))
        .collect()(0)
      val (lo, hi) = (bRow.getLong(0), bRow.getLong(1))
      val step = math.max(1L, (hi - lo) / 3 + 1)
      val b = ProductQuantizer.trainBooks(
        emb.where(col("vec_id") < lo + step), "vec_id", "embedding")
      // trainBooks returns localCheckpointed frames; nothing to force
      b
    }
    phase("drain") {
      val schema = StructType(Seq(
        StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType))))
      var i = 0
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(base + "/splits")
        .writeStream.outputMode("append")
        .foreachBatch { (b: DataFrame, _: Long) =>
          val t0 = System.nanoTime()
          StreamingPq.applyFrozenBatch(s, b, books, postingsDir)
          t(s"batch_$i") = (System.nanoTime() - t0) / 1e9
          i += 1
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val out = phase("search") {
      SimilarityQueries.pqSearchFromPostings(
        s, s.read.parquet(postingsDir), books).localCheckpoint(true)
    }
    phase("count")(out.count())
    s.conf.set("spark.sql.shuffle.partitions", prevParts)
    s.catalog.clearCache()
    // total counts each phase once (batch_i timers nest inside drain)
    val total = t.filterNot(_._1.startsWith("batch_")).values.sum
    println(t.map { case (k, v) => s""""$k":${f"$v%.2f"}""" }
      .mkString("{", ",", s""","total":${f"$total%.2f"}}"""))
    }
    s.stop()
  }
}
