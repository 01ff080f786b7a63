package graft.warehouse

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
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
  * implementation stays fully distributed:
  *
  *   1. range-repartition by NK (one shuffle; sampled balanced boundaries),
  *   2. sort within partitions (no further shuffle),
  *   3. `zipWithIndex` — a narrow count job to size partition offsets,
  *      then per-partition local index + offset.
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
    val sorted = df
      .repartitionByRange(p, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val schema = StructType(
      StructField(skName, LongType, nullable = false) +: sorted.schema.fields)
    val indexed = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq((i + 1L) +: r.toSeq)
    }
    spark.createDataFrame(indexed, schema)
  }
}
