package graft

import graft.catalog._
import graft.io.ParquetUtil
import graft.warehouse._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scheduler-retry (Airflow) contract for the batch pipeline ops
  * (reference PipelineClass.py:456-514 re-runs a failed task's op): kill
  * an op inside each write window via the ParquetUtil failpoints, re-run
  * it, and assert the final warehouse state equals the never-failed run.
  *
  * Streaming state got this treatment in round 7 (NearlineSpec /
  * AnalyticsSpec replay-idempotence); this closes the batch side.
  */
class RerunSafetySpec extends SparkSpec {
  import spark.implicits._

  /** Kill windows of the staged swap / pending-marker append. */
  private val SwapPoints = Seq("after-staging", "mid-swap", "after-swap")
  private val AppendPoints = Seq("pending-recorded", "after-append")

  /** Table content as a sorted multiset of row strings, timestamp
    * columns dropped (audit stamps differ between the clean run and the
    * retry by wall-clock, not by semantics).
    */
  private def stateOf(c: GraftConf, layer: Layer, table: String)
      : Seq[String] = {
    val df = spark.read.parquet(c.tablePath(layer, table))
    val keep = df.schema.fields
      .filterNot(_.dataType.typeName.startsWith("timestamp")).map(_.name)
    df.select(keep.map(col): _*).collect().map(_.toString).sorted.toSeq
  }

  /** Run `op` once cleanly to capture the expected state, then for each
    * failpoint: rebuild the setup, crash inside the window, re-run, and
    * compare every observed table to the clean run.
    */
  private def retryContract(
      points: Seq[String],
      setup: GraftConf => Unit,
      op: GraftConf => Unit,
      observed: Seq[(Layer, String)]): Unit = {
    val clean = tmpConf()
    setup(clean)
    op(clean)
    val expected = observed.map { case (l, t) => stateOf(clean, l, t) }
    points.foreach { point =>
      val c = tmpConf()
      setup(c)
      ParquetUtil.crashPoint = Some(point)
      try {
        val e = intercept[Exception](op(c))
        def chain(t: Throwable): Seq[String] =
          Option(t).toSeq.flatMap(x => x.getMessage +: chain(x.getCause))
        assert(chain(e).exists(m => m != null && m.contains("injected crash")),
          s"expected the injected crash to surface, got: $e")
      } finally {
        // a crash point that never armed (op doesn't pass that window)
        // would silently test nothing — fail loudly instead
        assert(ParquetUtil.crashPoint.isEmpty,
          s"crash point $point never fired for this op")
      }
      op(c) // the scheduler retry
      observed.zip(expected).foreach { case ((l, t), exp) =>
        assert(stateOf(c, l, t) == exp,
          s"$l/$t diverged after crash at $point + retry")
      }
    }
  }

  private def seedLodDim(c: GraftConf): Unit = {
    val dfl = new DataFlow(spark, "seed", c)
    dfl.createDataset("src", Map(
      "cust_id" -> Seq("20", "10", "30"),
      "name" -> Seq("Bob", "Alice", "Cid")))
    dfl.write("src", "dm_cust", Layer.LOD)
  }

  test("bulkLoadDimension: killed in any swap window, retry == clean run") {
    retryContract(SwapPoints,
      setup = seedLodDim,
      op = c => StageLoad.bulkLoadDimension(spark, c,
        DimensionSpec("dm_cust", Seq("cust_id"), Seq("name"))),
      observed = Seq(Layer.BSE -> "dm_cust", Layer.LOD -> "sk_cust"))
  }

  test("bulkLoadFact: killed in any swap window, retry == clean run") {
    def setup(c: GraftConf): Unit = {
      seedLodDim(c)
      StageLoad.bulkLoadDimension(spark, c,
        DimensionSpec("dm_cust", Seq("cust_id"), Seq("name")))
      val dfl = new DataFlow(spark, "seedf", c)
      dfl.createDataset("f", Map(
        "cust_id" -> Seq("10", "99", "20"),
        "amount" -> Seq("5", "7", "9")))
      dfl.write("f", "ft_sales", Layer.LOD)
    }
    retryContract(SwapPoints, setup,
      op = c => StageLoad.bulkLoadFact(spark, c,
        FactSpec("ft_sales", Seq(FkMapping("cust_id", "dm_cust", "cust_id")))),
      observed = Seq(Layer.BSE -> "ft_sales"))
  }

  test("deltaLoadDimension: reads its own target; killed mid-swap the " +
      "retry must see the PRE-crash dimension") {
    def setup(c: GraftConf): Unit = {
      seedLodDim(c)
      StageLoad.bulkLoadDimension(spark, c,
        DimensionSpec("dm_cust", Seq("cust_id"), Seq("name")))
      // the delta: 10 updated, 30 deleted, 40 inserted
      val dfl = new DataFlow(spark, "seedd", c)
      dfl.createDataset("d", Map(
        "cust_id" -> Seq("10", "20", "40"),
        "name" -> Seq("Alice2", "Bob", "Dee")))
      dfl.write("d", "dm_cust", Layer.LOD)
    }
    retryContract(SwapPoints, setup,
      op = c => StageLoad.deltaLoadDimension(spark, c,
        DimensionSpec("dm_cust", Seq("cust_id"), Seq("name")),
        deltaLoadDate = Some("2024-02-01 00:00:00")),
      observed = Seq(Layer.BSE -> "dm_cust", Layer.LOD -> "sk_cust"))
  }

  test("deltaLoadFact: append killed in either marker window never " +
      "double-lands the batch") {
    def setup(c: GraftConf): Unit = {
      seedLodDim(c)
      StageLoad.bulkLoadDimension(spark, c,
        DimensionSpec("dm_cust", Seq("cust_id"), Seq("name")))
      val dfl = new DataFlow(spark, "seedf", c)
      dfl.createDataset("f", Map(
        "cust_id" -> Seq("10", "20"), "amount" -> Seq("5", "7")))
      dfl.write("f", "ft_sales", Layer.LOD)
      StageLoad.bulkLoadFact(spark, c,
        FactSpec("ft_sales", Seq(FkMapping("cust_id", "dm_cust", "cust_id"))))
      // the delta batch replaces LOD with two new rows
      val dfl2 = new DataFlow(spark, "seedf2", c)
      dfl2.createDataset("f2", Map(
        "cust_id" -> Seq("30", "10"), "amount" -> Seq("11", "13")))
      dfl2.write("f2", "ft_sales", Layer.LOD)
    }
    retryContract(AppendPoints, setup,
      op = c => StageLoad.deltaLoadFact(spark, c,
        FactSpec("ft_sales", Seq(FkMapping("cust_id", "dm_cust", "cust_id")))),
      observed = Seq(Layer.BSE -> "ft_sales"))
  }

  test("scd2 load: killed in any swap window, retry == clean run " +
      "(history closed exactly once)") {
    def setup(c: GraftConf): Unit = {
      seedLodDim(c)
      Scd2Load.load(spark, c,
        DimensionSpec("dm_cust", Seq("cust_id"), Seq("name")),
        "2024-01-01 00:00:00", initial = true)
      val dfl = new DataFlow(spark, "seedd", c)
      dfl.createDataset("d", Map(
        "cust_id" -> Seq("10", "20", "40"),
        "name" -> Seq("Alice2", "Bob", "Dee")))
      dfl.write("d", "dm_cust", Layer.LOD)
    }
    retryContract(SwapPoints, setup,
      op = c => Scd2Load.load(spark, c,
        DimensionSpec("dm_cust", Seq("cust_id"), Seq("name")),
        "2024-02-01 00:00:00"),
      observed = Seq(Layer.BSE -> "dm_cust"))
  }

  test("deltaExtract: killed in any swap window, retry == clean run") {
    val srcDir = java.nio.file.Files
      .createTempDirectory("graft-rr-src").toString
    Seq(("10", "Alice2"), ("20", "Bob"), ("40", "Dee"))
      .toDF("cust_id", "name").write.mode("overwrite")
      .parquet(s"$srcDir/customer.parquet")
    def setup(c0: GraftConf): Unit = {
      val c = c0.copy(srcSystems =
        Map("S" -> graft.io.ParquetDatastore(srcDir)))
      val dfl = new DataFlow(spark, "seed", c)
      dfl.createDataset("prev", Map(
        "cust_id" -> Seq("10", "20", "30"),
        "name" -> Seq("Alice", "Bob", "Cid")))
      dfl.setAuditCols("prev", "BULK", "S")
      dfl.write("prev", "customer", Layer.EXT)
    }
    // conf must carry the source system for the op too
    def op(c0: GraftConf): Unit = {
      val c = c0.copy(srcSystems =
        Map("S" -> graft.io.ParquetDatastore(srcDir)))
      StageExtract.deltaExtract(spark, c, "S", "customer", Seq("cust_id"),
        deltaLoadDate = Some("2024-02-01 00:00:00"))
    }
    retryContract(SwapPoints, setup, op,
      observed = Seq(Layer.EXT -> "customer"))
  }

  test("defaultSummarisePrep: killed in any swap window, retry still " +
      "truncates to the same empty shape") {
    def setup(c: GraftConf): Unit = {
      val dfl = new DataFlow(spark, "seed", c)
      dfl.createDataset("s", Map(
        "seg" -> Seq("A", "B"), "total" -> Seq("1", "2")))
      dfl.write("s", "su_totals", Layer.SUM)
    }
    retryContract(SwapPoints, setup,
      op = c => StageSummarise.defaultSummarisePrep(spark, c),
      observed = Seq(Layer.SUM -> "su_totals"))
  }

  test("compact and optimizeLayout: killed in any swap window, retry " +
      "preserves content exactly") {
    def setup(c: GraftConf): Unit =
      (1 to 40).map(i => (i, i * 7 % 13)).toDF("k", "v")
        .repartition(4).write.parquet(c.tablePath(Layer.BSE, "bse_t"))
    retryContract(SwapPoints, setup,
      op = c => Admin.compact(spark, c, Layer.BSE, "bse_t"),
      observed = Seq(Layer.BSE -> "bse_t"))
    retryContract(SwapPoints, setup,
      op = c => Admin.optimizeLayout(spark, c, Layer.BSE, "bse_t",
        Seq("k", "v")),
      observed = Seq(Layer.BSE -> "bse_t"))
  }

  test("safeAppend rolls back a COMMITTED batch when the ack marker " +
      "survives (the double-append hole plain append has)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-rr-app").toString + "/t"
    Seq(1, 2, 3).toDF("v").write.parquet(dir)
    // crash AFTER the append job committed, before the ack delete
    ParquetUtil.crashPoint = Some("after-append")
    intercept[RuntimeException] {
      ParquetUtil.safeAppend(spark, Seq(4, 5).toDF("v"), dir)
    }
    // the batch is visible right now (committed)...
    assert(spark.read.parquet(dir).count() == 5)
    // ...but the retry rolls it back before re-appending: no duplicates
    ParquetUtil.safeAppend(spark, Seq(4, 5).toDF("v"), dir)
    assert(spark.read.parquet(dir).as[Int].collect().sorted.toSeq ==
      Seq(1, 2, 3, 4, 5))
  }
}
