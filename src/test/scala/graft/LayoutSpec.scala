package graft

import graft.catalog.Layer
import graft.io.Bucketing
import org.apache.spark.sql.functions._

/** Physical-layout levers for scale: bucketed co-located joins
  * (shuffle-free) and hive-style partitioned layer tables (partition
  * pruning). Assertions are on the EXECUTED plans, not just results.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val left = (1 to 500).map(i => (i.toLong, s"l$i")).toDF("k", "lv")
      val right = (1 to 500).map(i => (i.toLong, i * 2)).toDF("k", "rv")
      Bucketing.writeBucketed(left, "spec_bkt_left", Seq("k"), 4, Seq("k"))
      Bucketing.writeBucketed(right, "spec_bkt_right", Seq("k"), 4, Seq("k"))
      val joined = Bucketing.readBucketed(spark, "spec_bkt_left")
        .join(Bucketing.readBucketed(spark, "spec_bkt_right"), Seq("k"))
      assert(joined.count() == 500)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should be shuffle-free, got:\n$plan")
      // and the result is the plain join
      val got = joined.orderBy("k").limit(3).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq
      assert(got == Seq((1L, "l1", 2), (2L, "l2", 4), (3L, "l3", 6)))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS spec_bkt_left")
      spark.sql("DROP TABLE IF EXISTS spec_bkt_right")
    }
  }

  test("FK broadcast gate: small SK maps hint broadcast, big ones defer to AQE") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val dir = java.nio.file.Files.createTempDirectory("fk-gate").toString
    (1L to 100L).map(i => (i, i + 1000L)).toDF("nk", "sk")
      .write.parquet(s"$dir/sk_small")
    def hasHint(df: DataFrame): Boolean =
      df.queryExecution.analyzed.collect {
        case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
      }.nonEmpty
    // under the threshold (4x-inflated on-disk bytes << 10MB default):
    // the gate hints broadcast and the join plans BroadcastHashJoin
    val small = graft.warehouse.StageLoad.maybeBroadcast(
      spark, spark.read.parquet(s"$dir/sk_small"), s"$dir/sk_small")
    assert(hasHint(small), "small SK map should carry a broadcast hint")
    val fact = (1L to 1000L).map(i => (i % 100 + 1, i.toDouble)).toDF("nk", "v")
    assert(fact.join(small, "nk").queryExecution.sparkPlan.collect {
      case b: BroadcastHashJoinExec => b
    }.nonEmpty, "hinted join should plan BroadcastHashJoin")
    // over the threshold: no hint — strategy left to Catalyst/AQE (which
    // may STILL broadcast runtime-small sides; the gate only guarantees
    // the driver is never forced to materialise a 500M-member map)
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64")
      val big = graft.warehouse.StageLoad.maybeBroadcast(
        spark, spark.read.parquet(s"$dir/sk_small"), s"$dir/sk_small")
      assert(!hasHint(big), "over-threshold map must not be force-broadcast")
      // broadcasting disabled entirely (-1) also gates off
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      assert(!hasHint(graft.warehouse.StageLoad.maybeBroadcast(
        spark, spark.read.parquet(s"$dir/sk_small"), s"$dir/sk_small")))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("partitionBy lays out hive-style dirs and scans prune partitions") {
    implicit val c: GraftConf = tmpConf()
    val dfl = flow("layout")
    val df = (1 to 300).map(i => (i, s"2024-0${i % 3 + 1}", i * 1.5))
      .toDF("id", "dt", "v")
    dfl.createDataset("t", df)
    dfl.write("t", "ft_part", Layer.BSE, partitionBy = Seq("dt"))
    // hive-style layout on disk
    val dirs = new java.io.File(c.tablePath(Layer.BSE, "ft_part"))
      .listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("dt=2024-01", "dt=2024-02", "dt=2024-03"))
    // a dt filter reaches the scan as a PartitionFilter: 1 of 3 dirs read
    val read = spark.read.parquet(c.tablePath(Layer.BSE, "ft_part"))
      .where(col("dt") === "2024-02")
    assert(read.count() == 100)
    val scan = read.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("dt"),
      s"expected partition pruning in:\n$scan")
  }

  test("zorder clustering turns 2-D range predicates into file skipping") {
    implicit val c: GraftConf = tmpConf()
    // two independent uniform keys: round-robin layout spreads both
    // domains over every file, so footer stats prune nothing
    val rnd = new scala.util.Random(11)
    val df = (1 to 20000).map { i =>
      (i.toLong, rnd.nextInt(1000).toLong, rnd.nextInt(100).toLong,
        rnd.nextDouble())
    }.toDF("id", "k1", "k2", "v")
    val plainPath = c.tablePath(Layer.BSE, "zplain")
    df.repartition(16).write.mode("overwrite").parquet(plainPath)
    val zPath = c.tablePath(Layer.BSE, "zclustered")
    df.repartition(16).write.mode("overwrite").parquet(zPath)
    Admin.optimizeLayout(spark, c, Layer.BSE, "zclustered",
      Seq("k1", "k2"),
      targetBytes = math.max(1L,
        graft.io.ParquetUtil.dirSizeBytes(spark, zPath) / 16))
    val pred = col("k1") <= 110 && col("k2") <= 20 // ~1/9 x ~1/5 domain
    def filesTouched(path: String): Long =
      spark.read.parquet(path).where(pred)
        .select(input_file_name()).distinct().count()
    val (plainFiles, zFiles) = (filesTouched(plainPath), filesTouched(zPath))
    // round-robin: every file holds the full key range -> all read
    assert(plainFiles >= 14, s"expected no skipping on plain: $plainFiles")
    // clustered: the 2-D slice lives in a narrow band of the z-range
    assert(zFiles <= 4, s"expected file skipping on zorder: $zFiles")
    // and the layout never changes values
    val a = spark.read.parquet(plainPath).where(pred)
      .orderBy("id").collect().toSeq
    val b = spark.read.parquet(zPath).where(pred)
      .orderBy("id").collect().toSeq
    assert(a == b)
  }
}
