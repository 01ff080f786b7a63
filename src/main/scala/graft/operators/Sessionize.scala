package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch gap-based sessionization: assign events to sessions that close
  * after `gap` time units of inactivity, then aggregate per session.
  *
  * The batch complement of the streaming sessionizer
  * (`queries/StreamingQueries.sessionize`): same 30-minute-gap semantics,
  * expressed as a window cumulative-sum instead of keyed state.
  *
  * Scale shape: ONE shuffle. The window (lag + running sum) hash-partitions
  * by the session key; the follow-up per-session aggregation groups by
  * (key, session_seq), and `HashPartitioning(key)` already satisfies the
  * clustered distribution on the superset key, so Catalyst plans NO second
  * exchange — verified by `SessionizeSpec`.
  *
  * Boundary determinism: the gap test compares only timestamps, so rows
  * with equal timestamps can never open a session mid-tie; `tieBreak`
  * still pins the lag order so both engines walk rows identically.
  */
object Sessionize {

  def sessionize(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      gap: Long,
      tieBreak: Seq[String] = Nil): DataFrame = {
    val order = (col(tsCol).asc +: tieBreak.map(col(_).asc))
    val w = Window.partitionBy(keyCol).orderBy(order: _*)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("_prev_ts", lag(col(tsCol), 1).over(w))
      .withColumn("_boundary",
        when(col("_prev_ts").isNull ||
          col(tsCol) - col("_prev_ts") > gap, 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("_boundary")).over(run))
      .groupBy(col(keyCol), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"))
      .withColumn("duration", col("session_end") - col("session_start"))
  }
}
