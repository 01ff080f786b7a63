package graft.warehouse

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Deterministic, dense, 1-based surrogate key assignment.
  *
  * The reference delegates SK generation to Postgres `SERIAL` columns and
  * resets them with `TRUNCATE … RESTART IDENTITY` on every bulk load
  * (betl/datamodel/ColumnClass.py:28-31, betl/io/dbIO.py:47-53), which makes
  * SKs "order of arrival". Spark-native we make them *deterministic*:
  * SK = rank of the natural key in NK sort order.
  *
  * Scale note: the naive rendering — `row_number().over(Window.orderBy(nk))`
  * — collapses to a single partition and dies on a large dimension. This
  * implementation stays fully distributed AND fully inside Tungsten (no
  * RDD detour, no external-Row boxing of the attribute columns):
  *
  *   1. range-repartition by NK (one shuffle; sampled balanced boundaries),
  *   2. sort within partitions (no further shuffle),
  *   3. stamp `monotonically_increasing_id()` — which encodes
  *      (partition id << 33) + local row index in physical order — and
  *      persist, so the shuffle is paid once,
  *   4. a tiny per-partition count aggregation (numPartitions rows) turns
  *      local indices into global ranks via a broadcast offsets join.
  *
  * Equivalent result to the global window, O(n/p) memory per task.
  */
object SurrogateKeys {

  def assign(
      df: DataFrame,
      orderCols: Seq[String],
      skName: String,
      numPartitions: Option[Int] = None): DataFrame = {
    val spark = df.sparkSession
    val p = numPartitions.getOrElse(
      spark.sessionState.conf.numShufflePartitions)
    val sortCols = orderCols.map(col)
    // the id must be stamped once and reused by both the counts job and
    // the final plan — persisting pins the shuffled+sorted rows so the
    // range exchange is not recomputed (the ContextCleaner unpersists
    // when the plan is garbage-collected)
    val withMid = df
      .repartitionByRange(p, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .select(monotonically_increasing_id().as("__mid"), col("*"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val pidOf = shiftright(col("__mid"), 33)
    // per-partition row counts: map-side partial agg, p-row shuffle
    val parts = withMid
      .groupBy(pidOf.as("__pid"))
      .agg(count(lit(1)).as("__n"), min(col("__mid")).as("__base"))
      .collect()
      .sortBy(_.getLong(0))
    var cum = 0L
    val offRows: Seq[Row] = parts.toSeq.map { r =>
      val off = cum
      cum += r.getLong(1)
      Row(r.getLong(0), off, r.getLong(2))
    }
    val offSchema = StructType(Seq(
      StructField("__pid", LongType, nullable = false),
      StructField("__off", LongType, nullable = false),
      StructField("__base", LongType, nullable = false)))
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offRows, 1), offSchema)
    withMid
      .join(broadcast(offDf), pidOf === col("__pid"))
      .withColumn(skName, col("__off") + (col("__mid") - col("__base")) + 1L)
      .select((skName +: df.columns.toSeq).map(col): _*)
  }
}
