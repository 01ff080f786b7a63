package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Latest/extreme row per key without a window sort.
  *
  * `argMax` keeps, for every key group, the payload of the row with the
  * greatest `ordering` tuple (lexicographic struct comparison). Equivalent
  * to `row_number() OVER (PARTITION BY keys ORDER BY ordering DESC) = 1`
  * but planned as a plain hash aggregation: `max_by` gets a map-side
  * partial, so each partition ships ONE candidate row per key instead of
  * sorting whole partitions — at 100 TB that is the difference between an
  * agg shuffle of |keys| rows and a full-data sort.
  *
  * Pass a unique column last in `ordering` to make ties deterministic.
  */
object PerKey {

  def argMax(
      df: DataFrame,
      keys: Seq[String],
      ordering: Seq[String],
      payload: Seq[String]): DataFrame = {
    val out = (ordering ++ payload).distinct
    val best = df.groupBy(keys.map(col): _*)
      .agg(max_by(
        struct(out.map(col): _*),
        struct(ordering.map(col): _*)).as("_best"))
    best.select(
      keys.map(col) ++ out.map(c => col(s"_best.$c").as(c)): _*)
  }
}
