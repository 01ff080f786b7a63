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
}
