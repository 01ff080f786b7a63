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

    // stateful streaming: per-user sessionization via
    // flatMapGroupsWithState (30-minute inactivity gap). AvailableNow
    // drains the bounded source in one batch, so every session closes
    // deterministically; per-group events are sorted by event time inside
    // the state function (iterator order is not guaranteed).
    "q_stream_sessionize" -> { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val gapMicros = 30L * 60 * 1000 * 1000
      val events = StreamFlow.readParquetStream(
        s, s"$dir/events.parquet", EventsSchema)
        .select(col("user_id"), expr("ts div 1000").as("ts_us"))
        .as[(Long, Long)]
      // BOUNDED-BACKFILL sessionization: correct when the whole source
      // drains in ONE AvailableNow batch (our sources are single-file).
      // Incremental multi-batch sessionization needs event-time timeouts
      // to flush open sessions; rather than emit silently wrong splits,
      // the state records that a batch ran and a second batch fails fast.
      val sessions = events.groupByKey(_._1)
        .flatMapGroupsWithState[Boolean, (Long, Int, Long, Long, Long)](
          OutputMode.Append, GroupStateTimeout.NoTimeout) {
          case (uid, evs, state) =>
            if (state.exists)
              throw new IllegalStateException(
                "sessionize backfill expects a single AvailableNow batch " +
                  s"per key; got a second batch for user $uid")
            state.update(true)
            val ts = evs.map(_._2).toArray.sorted
            val out = scala.collection.mutable.ArrayBuffer
              .empty[(Long, Int, Long, Long, Long)]
            var sessionIdx = 0
            var start = 0
            for (i <- ts.indices) {
              if (i == 0 || ts(i) - ts(i - 1) > gapMicros) {
                if (i > 0) out += ((uid, sessionIdx, (i - start).toLong,
                  ts(start), ts(i - 1)))
                sessionIdx += 1
                start = i
              }
            }
            if (ts.nonEmpty) out += ((uid, sessionIdx, (ts.length - start).toLong,
              ts(start), ts.last))
            out.iterator
        }
      val drained = StreamFlow.runToMemory(
        sessions.toDF("user_id", "session_idx", "n_events", "start_us", "end_us"),
        s, "q_stream_sessionize", outputMode = "append")
      drained.select(
        col("user_id"), col("session_idx").cast("bigint").as("session_idx"),
        col("n_events"),
        date_format(timestamp_micros(col("start_us")), "yyyy-MM-dd HH:mm:ss")
          .as("session_start"),
        date_format(timestamp_micros(col("end_us")), "yyyy-MM-dd HH:mm:ss")
          .as("session_end"))
        .orderBy("user_id", "session_idx")
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
    "q_stream_sessionize" ->
      """WITH o AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |           IS NULL
        |      OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |           > INTERVAL 30 MINUTE
        |      THEN 1 ELSE 0 END AS is_new
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts,
        |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS session_idx
        |  FROM o)
        |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
        |  COUNT(*) AS n_events,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end
        |FROM s GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin,
    "q_events_json" ->
      """SELECT event_type, count(*) AS n_events,
        |  CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS k_total,
        |  MAX(CAST(props->>'k' AS BIGINT)) AS k_max
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
}
