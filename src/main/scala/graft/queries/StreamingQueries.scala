package graft.queries

import graft._
import graft.streaming.StreamFlow
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming query over the `events` table: a watermarked hourly tumbling
  * window per event_type, drained with Trigger.AvailableNow into a memory
  * sink (the bounded-backfill pattern). Deterministic: complete output
  * mode emits every window; the value sum takes the decimal detour so it
  * is order-insensitive; window starts render as UTC strings.
  */
object StreamingQueries {
  import Q._

  /** events.parquet carries TIMESTAMP(NANOS) — a parquet type Spark does
    * not map to a timestamp. It is read as raw nanos (legacy nanosAsLong
    * flag) and converted to a micros TIMESTAMP, which watermarks accept.
    */
  private val EventsSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stream_events" -> { (s, dir) =>
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val events = StreamFlow.readParquetStream(
        s, s"$dir/events.parquet", EventsSchema)
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      val agg = StreamFlow.windowedAgg(events, "ts",
        windowLength = "1 hour", watermarkDelay = "10 minutes",
        groupCols = Seq("event_type"),
        aggs = Seq(
          count(lit(1)).as("n_events"),
          dsum(col("value"), 2).as("total_value")))
      StreamFlow.runToMemory(agg, s, "q_stream_events")
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
            .as("window_start"),
          col("event_type"), col("n_events"), col("total_value"))
        .orderBy("window_start", "event_type")
    },

    // batch JSON extraction over the events props column
    "q_events_json" -> { (s, dir) =>
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val events = s.read.schema(EventsSchema)
        .parquet(s"$dir/events.parquet")
      events
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n_events"),
          sum(col("k")).as("k_total"),
          max(col("k")).as("k_max"))
        .orderBy("event_type")
    })

  val oracles: Map[String, String] = Map(
    "q_stream_events" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
        |    AS window_start,
        |  event_type, count(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY window_start, event_type""".stripMargin,
    "q_events_json" ->
      """SELECT event_type, count(*) AS n_events,
        |  SUM(CAST(props->>'k' AS BIGINT)) AS k_total,
        |  MAX(CAST(props->>'k' AS BIGINT)) AS k_max
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
}
