package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark harness. Each query is FULLY materialised through a
  * `noop`-format write: every column of every row is computed and sent to
  * the sink, so projection/UDF-shaped queries measure real operator work
  * (a bare `.count()` lets Catalyst prune computed columns to a metadata
  * read — see VERDICT.md round 1 "What's wrong").
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // ContextCleaner frees a query's shuffle files only after its RDDs
      // are garbage-collected; the default 30min periodic GC lets dozens
      // of queries' shuffle data pile up and drag late queries down
      .config("spark.cleaner.periodicGC.interval", "30s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional comma-separated name-prefix filter for profiling one query
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(',').toSeq)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.exists(n.startsWith)) }
    // untimed warm-up: pay JIT/codegen/page-cache costs once outside the
    // timed loop, so the alphabetically-first query stops absorbing them
    // and round-over-round per-query deltas stop aliasing warm-up noise
    selected.headOption.foreach { case (_, fn) =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      spark.catalog.clearCache()
      System.gc()
    }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      val elapsed = (System.nanoTime() - t0) / 1e9
      // between queries: drop cached intermediates (LSH bands,
      // signatures) and nudge the ContextCleaner so the next query isn't
      // timed under this one's pinned storage / shuffle files
      spark.catalog.clearCache()
      System.gc()
      name -> elapsed
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
