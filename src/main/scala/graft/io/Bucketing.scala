package graft.io

import org.apache.spark.sql.DataFrame

/** Bucketed-table helpers — the co-located-join lever for repeated big
  * joins on a stable key (fact ⋈ fact, fact ⋈ big dim at 100 TB): both
  * sides pre-hashed into the same number of buckets on the join key makes
  * the join SHUFFLE-FREE — the single biggest cost at scale.
  *
  * The reference has no notion of physical layout (pandas + Postgres
  * heap tables); this is deliberately Spark-first. Bucketed tables live
  * in the session catalog (`saveAsTable`) because bucket metadata is what
  * tells the planner the layout exists — a bare parquet path cannot
  * carry it.
  */
object Bucketing {

  /** Write `df` as a bucketed (and per-bucket sorted) catalog table.
    * Bucket counts must match across tables meant to join shuffle-free.
    */
  def writeBucketed(
      df: DataFrame,
      tableName: String,
      bucketCols: Seq[String],
      numBuckets: Int,
      sortCols: Seq[String] = Seq.empty): Unit = {
    require(bucketCols.nonEmpty, "writeBucketed: need >= 1 bucket column")
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*)
     else w).saveAsTable(tableName)
  }

  /** Read a bucketed table back (bucket metadata rides along from the
    * catalog, so joins on the bucket key skip their exchange).
    */
  def readBucketed(
      spark: org.apache.spark.sql.SparkSession, tableName: String): DataFrame =
    spark.table(tableName)
}
