package graft.queries

import graft._
import graft.functions.HllSketch
import graft.operators.{FuzzyJoin, Outliers, PageRank, PerKey, Profile,
  Quantiles, Sampling, Sessionize, TemporalJoins, TimeSeries, Transitions,
  Triangles}
import graft.similarity.Centroids
import graft.text.{Chunker, TextFunctions, TfIdf}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-4 analytics operators: temporal joins (as-of, range), exact
  * grouped quantiles, TF-IDF, embedding centroids, a deterministic HLL
  * distinct sketch, hash sampling, and document chunking. Every query has
  * a full DuckDB oracle; the temporal-join oracles are INDEPENDENT
  * formulations (DuckDB's native ASOF / inequality joins), not pipeline
  * mirrors.
  */
object AnalyticsQueries {
  import Q._

  /** Batch events read off the shared [[Q.EventsSchema]]; the µs
    * derivation is unit-detected ([[Q.eventsTsUs]]) and matches DuckDB's
    * `epoch_us(ts)` exactly for either testdata generation.
    */
  private def eventsUs(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.schema(EventsSchema).parquet(s"$dir/events.parquet")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), eventsTsUs(s, dir).as("ts_us"))
  }

  private val TwoDaysUs = 2L * 86400L * 1000000L
  private val OneDayUs = 86400L * 1000000L

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // as-of join: each click attaches the latest prior-or-equal purchase
    // of the same user (union trick — one shuffle, no join node)
    "q_asof_join" -> { (s, dir) =>
      val ev = eventsUs(s, dir)
      val clicks = ev.where(col("event_type") === "click")
        .select("event_id", "user_id", "ts_us", "value")
      // right side unique per (user, ts): deterministic as-of target
      val purchases = ev.where(col("event_type") === "purchase")
        .groupBy("user_id", "ts_us")
        .agg(max(col("event_id")).as("p_event_id"),
          max(col("value")).as("p_value"))
        .withColumn("p_ts_us", col("ts_us"))
      TemporalJoins.asofJoin(clicks, purchases,
        on = Seq("user_id"), leftTs = "ts_us", rightTs = "ts_us",
        rightCols = Seq("p_ts_us", "p_event_id", "p_value"))
        .orderBy("event_id")
    },

    // range join: clicks landing inside any 2-day attribution window
    // opened by a signup of the same user (binned equi-join, no BNLJ)
    "q_range_join" -> { (s, dir) =>
      val ev = eventsUs(s, dir)
      val clicks = ev.where(col("event_type") === "click")
        .select("event_id", "user_id", "ts_us")
      val windows = ev.where(col("event_type") === "signup")
        .select(col("event_id").as("s_event_id"), col("user_id"),
          col("ts_us").as("start_us"),
          (col("ts_us") + TwoDaysUs).as("end_us"))
      TemporalJoins.rangeJoin(clicks, windows, on = Seq("user_id"),
        tsCol = "ts_us", startCol = "start_us", endCol = "end_us",
        binWidth = OneDayUs)
        .select("event_id", "user_id", "ts_us", "s_event_id", "start_us")
        .orderBy("event_id", "s_event_id")
    },

    // exact grouped quantiles off the value histogram
    "q_quantiles" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_quantiles")
      src(dfl, "lineitem")
      Quantiles.groupQuantiles(dfl.get("lineitem"),
        Seq("l_returnflag"), "l_quantity", Seq(0.25, 0.5, 0.75, 1.0))
        .orderBy("l_returnflag", "q")
    },

    // approximate quantiles of a high-cardinality double (grid-snapped
    // exact quantiles — deterministic, error ≤ 64)
    "q_quantiles_approx" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_quantiles_approx")
      src(dfl, "lineitem")
      Quantiles.approxGroupQuantiles(dfl.get("lineitem"),
        Seq("l_returnflag"), "l_extendedprice", width = 64,
        qs = Seq(0.5, 0.9, 0.99))
        .orderBy("l_returnflag", "q")
    },

    // TF-IDF top-5 salient terms per document (linear idf — one exact
    // integer double division, bit-reproducible)
    "q_tfidf" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_tfidf")
      src(dfl, "documents")
      val docs = dfl.get("documents")
      TfIdf.topTerms(docs, "doc_id", "text", k = 5)
        .select(col("doc_id"), col("term"), col("tf"), col("df"),
          col("tf_idf"), col("rank").cast("long").as("rank"))
        .orderBy("doc_id", "rank")
    },

    // per-label embedding centroids in exact fixed-point
    "q_embedding_centroid" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_embedding_centroid")
      src(dfl, "embeddings")
      Centroids.centroids(dfl.get("embeddings"), "label", "embedding")
        .orderBy("label", "dim")
    },

    // deterministic HyperLogLog distinct sketch + exact control count
    "q_hll_distinct" -> { (s, dir) =>
      val ev = eventsUs(s, dir)
      val est = HllSketch.estimate(HllSketch.registers(s, ev, "event_id"))
      est.crossJoin(
        ev.agg(count_distinct(col("event_id")).as("exact_distinct")))
    },

    // grouped HLL: distinct users per event type — the realistic sketch
    // shape at scale. The linear-counting branch's ln(M/V) runs through
    // DetLog (mirrored by a literal lookup list in the oracle), so both
    // engines produce the same double bit-for-bit.
    "q_hll_grouped" -> { (s, dir) =>
      val ev = eventsUs(s, dir)
      val est = HllSketch.groupedEstimate(
        HllSketch.groupedRegisters(s, ev, Seq("event_type"), "user_id"),
        Seq("event_type"))
      est
        .join(ev.groupBy("event_type")
          .agg(count_distinct(col("user_id")).as("exact_distinct")),
          Seq("event_type"))
        .select(col("event_type"), col("m_buckets"), col("sum_pow"),
          col("n_zero"), round(col("estimate"), 6).as("est_r"),
          col("exact_distinct"))
        .orderBy("event_type")
    },

    // stratified deterministic hash sample (50% en / 20% rest)
    "q_sample_stratified" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_sample_stratified")
      src(dfl, "documents")
      Sampling.stratifiedSample(dfl.get("documents"), "doc_id", "lang",
        rates = Map("en" -> 50), defaultPct = 20)
        .withColumn("bucket", Sampling.hashBucket(col("doc_id"), "sample:"))
        .select("doc_id", "lang", "bucket")
        .orderBy("doc_id")
    },

    // bloom-pruned exact semi-join: the probe side is filtered by a
    // row-local bitset predicate BEFORE the join shuffle; the trailing
    // left-semi join keeps the result exact, so the oracle is a plain IN
    "q_bloom_semijoin" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_bloom_semijoin")
      src(dfl, "supplier")
      src(dfl, "lineitem")
      val dim = dfl.get("supplier")
        .filter(col("s_acctbal") > 6000).select("s_suppkey")
      val fact = dfl.get("lineitem")
        .select("l_orderkey", "l_linenumber", "l_suppkey", "l_quantity")
      graft.functions.BloomFilter.semiJoin(fact, "l_suppkey", dim, "s_suppkey")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // hopping (sliding) event-time windows: 1-hour windows every 30
    // minutes — each event lands in two windows
    "q_window_hopping" -> { (s, dir) =>
      val ev = eventsUs(s, dir)
        .withColumn("tsm", timestamp_micros(col("ts_us")))
      ev.groupBy(window(col("tsm"), "1 hour", "30 minutes"),
        col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          Q.dsum(col("value"), 2).as("total_value"))
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
            .as("window_start"),
          col("event_type"), col("n_events"), col("total_value"))
        .orderBy("window_start", "event_type")
    },

    // sliding-window chunking: 40-token windows, stride 30
    "q_chunk_docs" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_chunk_docs")
      src(dfl, "documents")
      Chunker.chunk(dfl.get("documents"), "doc_id", "text",
        chunkSize = 40, stride = 30)
        .select(col("doc_id"), col("chunk_id"),
          col("chunk_start").cast("long").as("chunk_start"),
          col("n_tokens").cast("long").as("n_tokens"), col("chunk_text"))
        .orderBy("doc_id", "chunk_id")
    },

    // ROLLUP grouping sets: subtotal rows use an 'ALL' sentinel (not
    // null) so ordering is engine-independent
    "q_rollup" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_rollup")
      src(dfl, "lineitem")
      dfl.get("lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping(col("l_returnflag")).as("g1"),
          grouping(col("l_linestatus")).as("g2"),
          Q.dsum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n_rows"))
        .select(
          when(col("g1") === 1, lit("ALL"))
            .otherwise(col("l_returnflag")).as("returnflag"),
          when(col("g2") === 1, lit("ALL"))
            .otherwise(col("l_linestatus")).as("linestatus"),
          col("sum_qty"), col("n_rows"))
        .orderBy("returnflag", "linestatus")
    },

    // CUBE over two order dimensions — all four grouping sets
    "q_cube" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_cube")
      src(dfl, "orders")
      dfl.get("orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(grouping(col("o_orderstatus")).as("g1"),
          grouping(col("o_orderpriority")).as("g2"),
          Q.dsum(col("o_totalprice")).as("sum_price"),
          count(lit(1)).as("n_rows"))
        .select(
          when(col("g1") === 1, lit("ALL"))
            .otherwise(col("o_orderstatus")).as("orderstatus"),
          when(col("g2") === 1, lit("ALL"))
            .otherwise(col("o_orderpriority")).as("orderpriority"),
          col("sum_price"), col("n_rows"))
        .orderBy("orderstatus", "orderpriority")
    },

    // cohort retention: users grouped by first-seen day, distinct-user
    // counts per day offset. ONE shuffle for the cohort day (window min
    // over user) + the final aggregation — no self-join of events.
    "q_retention" -> { (s, dir) =>
      val byUser = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id")
      eventsUs(s, dir)
        .select(col("user_id"),
          expr("ts_us div 86400000000").as("d"))
        .withColumn("d0", min(col("d")).over(byUser))
        .groupBy(col("d0").as("cohort_day"),
          (col("d") - col("d0")).as("day_offset"))
        .agg(count_distinct(col("user_id")).as("n_users"))
        .orderBy("cohort_day", "day_offset")
    },

    // ordered event funnel: users reaching signup → later click → later
    // purchase. Three cascaded keyed aggregations — each stage's frame
    // is user-sized, so AQE broadcasts it into the next stage's join;
    // nothing is ever events × events.
    "q_funnel" -> { (s, dir) =>
      val ev = eventsUs(s, dir)
      val s1 = ev.where(col("event_type") === "signup")
        .groupBy("user_id").agg(min("ts_us").as("t1"))
      val s2 = ev.where(col("event_type") === "click")
        .join(s1, Seq("user_id")).where(col("ts_us") >= col("t1"))
        .groupBy("user_id").agg(min("ts_us").as("t2"))
      val s3 = ev.where(col("event_type") === "purchase")
        .join(s2, Seq("user_id")).where(col("ts_us") >= col("t2"))
        .groupBy("user_id").agg(min("ts_us").as("t3"))
      def stage(df: DataFrame, name: String) =
        df.agg(count(lit(1)).as("n_users"))
          .withColumn("stage", lit(name))
      stage(s1, "1_signup")
        .unionByName(stage(s2, "2_click"))
        .unionByName(stage(s3, "3_purchase"))
        .select("stage", "n_users")
        .orderBy("stage")
    },

    // ranking-window battery: rank / dense_rank / ntile / lag / lead
    // over a deterministic total order within each customer
    "q_window_rank" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_window_rank")
      src(dfl, "orders")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      dfl.get("orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"),
          ntile(4).over(w).cast("long").as("quartile"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"))
        .where(col("rnk") <= 3)
        .orderBy("o_custkey", "rnk", "o_orderkey")
    },

    // batch gap sessionization (30-minute inactivity): the batch
    // complement of q_stream_sessionize — one window shuffle, and the
    // per-session aggregation reuses the window's hash partitioning
    "q_sessionize" -> { (s, dir) =>
      Sessionize.sessionize(
        eventsUs(s, dir).select("user_id", "ts_us", "event_id"),
        keyCol = "user_id", tsCol = "ts_us",
        gap = 30L * 60 * 1000000, tieBreak = Seq("event_id"))
        .orderBy("user_id", "session_seq")
    },

    // long→wide pivot with EXPLICIT values (no distinct pre-scan)
    "q_pivot" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_pivot")
      src(dfl, "lineitem")
      dfl.pivotRowsToCols("lineitem",
        groupCols = Seq("l_returnflag"), pivotCol = "l_linestatus",
        pivotValues = Seq("F", "O"),
        agg = sum(col("l_quantity").cast(DecimalType(28, 4))),
        prefix = "qty_")
      dfl.get("lineitem")
        .select(col("l_returnflag"),
          col("qty_F").cast("double").as("qty_F"),
          col("qty_O").cast("double").as("qty_O"))
        .orderBy("l_returnflag")
    },

    // latest order per customer: max_by aggregation (map-side combine)
    // instead of a window sort — each partition ships one candidate row
    // per key
    "q_latest_per_key" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_latest_per_key")
      src(dfl, "orders")
      val o = dfl.get("orders").select(
        col("o_custkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("order_us"),
        col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      PerKey.argMax(o, keys = Seq("o_custkey"),
        ordering = Seq("order_us", "o_orderkey"),
        payload = Seq("o_totalprice", "o_orderstatus"))
        .orderBy("o_custkey")
    },

    // time-series gap fill: dense daily axis per event type, missing
    // days zero-filled — grid frames are output-sized, never input-sized
    "q_gapfill" -> { (s, dir) =>
      val ev = eventsUs(s, dir).select("event_type", "ts_us", "value")
      TimeSeries.gapFill(ev, groupCol = "event_type",
        bucket = expr("ts_us div 86400000000"), bucketName = "day",
        aggs = Seq(count(lit(1)).as("n_events"),
          Q.dsum(col("value"), 2).as("total_value")))
        .orderBy("event_type", "day")
    },

    // token-length histogram of the document corpus (fixed-width,
    // open-ended last bucket) — one combine-reduced aggregation
    "q_histogram" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_histogram")
      src(dfl, "documents")
      Quantiles.histogram(dfl.get("documents"),
        value = size(TextFunctions.tokens(col("text"))),
        width = 20, nBuckets = 20)
        .orderBy("bucket")
    },

    // rolling-frame aggregates: 3-order moving sum/average per customer
    // (decimal-exact frame sums; the avg divides two exact operands so
    // the double is engine-identical)
    "q_moving_avg" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_moving_avg")
      src(dfl, "orders")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey")
        .orderBy(col("order_us"), col("o_orderkey"))
        .rowsBetween(-2, org.apache.spark.sql.expressions.Window.currentRow)
      val frameSum =
        sum(col("o_totalprice").cast(DecimalType(28, 4))).over(w)
          .cast("double")
      dfl.get("orders")
        .select(col("o_custkey"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("order_us"),
          col("o_orderkey"), col("o_totalprice"))
        .select(col("o_custkey"), col("order_us"), col("o_orderkey"),
          frameSum.as("mov_sum3"),
          (frameSum / count(lit(1)).over(w)).as("mov_avg3"))
        .orderBy("o_custkey", "order_us", "o_orderkey")
    },

    // fixed-k deterministic sample per stratum: exactly 5 docs per
    // language, same rows on any cluster/engine
    "q_group_sample" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_group_sample")
      src(dfl, "documents")
      Sampling.groupSample(dfl.get("documents"), "lang", "doc_id", k = 5)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    },

    // fixed-point PageRank over the part↔supplier co-occurrence graph
    // (both directions, so no dangling nodes); 5 rounds, bit-exact
    // integer arithmetic replayed by a DuckDB recursive CTE
    "q_pagerank" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_pagerank")
      src(dfl, "lineitem")
      val li = dfl.get("lineitem").select("l_partkey", "l_suppkey")
      val fwd = li.select((col("l_partkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      val rev = li.select((col("l_suppkey") * 2 + 1).as("src"),
        (col("l_partkey") * 2).as("dst"))
      PageRank.run(fwd.unionByName(rev).distinct(), iterations = 5)
        .orderBy("id")
    },

    // one-pass column profiling: nulls / distincts / bounds for four
    // customer columns out of a single scan
    "q_profile" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_profile")
      src(dfl, "customer")
      Profile.profile(dfl.get("customer"), ProfileCols)
        .orderBy("col_name")
    },

    // exact per-type z-score outliers (2σ) on the cents grid — integer
    // membership test, group stats broadcast back into the probe scan
    "q_outliers" -> { (s, dir) =>
      val ev = eventsUs(s, dir)
        .withColumn("cents", round(col("value") * 100).cast("long"))
      Outliers.flag(ev, Seq("event_type"), "cents", z = 2)
        .select("event_id", "event_type", "cents")
        .orderBy("event_id")
    },

    // first-order Markov transition matrix over each user's event
    // timeline: one keyed window + output-sized normalisation
    "q_event_transitions" -> { (s, dir) =>
      Transitions.matrix(eventsUs(s, dir), "user_id", "event_type",
        Seq("ts_us", "event_id"))
        .orderBy("from_state", "to_state")
    },

    // triangle count of the market-basket graph (parts co-occurring in
    // an order) — degree-oriented wedge join, each triangle counted
    // once. Baskets are bounded (an order has a handful of lines), so
    // the co-occurrence graph is sparse by construction — the property
    // that makes triangle counting tractable at any scale
    "q_triangles" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_triangles")
      src(dfl, "lineitem")
      // co-occurrence edges via per-order collect_set + ROW-LOCAL pair
      // explode: ONE exchange (the groupBy, whose set-agg also dedupes
      // (ok, pk)) versus distinct + self-join's three; the per-order
      // pair fan-out is bounded by basket size, and array_sort makes
      // pa < pb hold by construction. Measured 8.0s → ~5.5s at sf0.1.
      val parts = dfl.get("lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .groupBy("ok").agg(array_sort(collect_set(col("pk"))).as("ps"))
      val edges = parts.select(explode(flatten(transform(
          col("ps"), (x, i) => transform(
            slice(col("ps"), i + lit(2), size(col("ps"))),
            y => struct(x.as("pa"), y.as("pb")))))).as("e"))
        .select(col("e.pa").as("pa"), col("e.pb").as("pb"))
      Triangles.run(edges, "pa", "pb")
    },

    // entity resolution pair stage: FastSS deletion-neighborhood
    // blocking + exact levenshtein verify over customer names — every
    // distance-≤1 pair from equi-joins only
    "q_entity_pairs" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_entity_pairs")
      src(dfl, "customer")
      FuzzyJoin.editDistancePairs(dfl.get("customer"), "c_custkey", "c_name")
        .orderBy("id_a", "id_b")
    },

    // weight-proportional deterministic Poisson sample (importance
    // sampling by document length; expected ~100 docs)
    "q_weighted_sample" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_weighted_sample")
      src(dfl, "documents")
      Sampling.weightedSample(dfl.get("documents"), "doc_id", "n_chars",
        k = 100)
        .select("doc_id", "n_chars")
        .orderBy("doc_id")
    },

    // temperature-flattened source mixing (T = 1/2, the IEEE-exact
    // temperature): rare sources upsampled toward sqrt-flattened shares,
    // membership an exact integer test the oracle replays
    "q_mix_sources" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_mix_sources")
      src(dfl, "documents")
      Sampling.temperatureMix(dfl.get("documents"), "doc_id", "source",
        k = 200)
        .select("doc_id", "source")
        .orderBy("doc_id")
    },

    // epoch-weighted source mixing (the LLaMA-style "epochs over
    // sources" table): each row replicated per its source's epoch
    // factor — floor(e) copies plus a hash-deterministic fractional
    // one; copy index carried for downstream shuffle spreading
    "q_mix_epochs" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_mix_epochs")
      src(dfl, "documents")
      Sampling.epochMix(
        dfl.get("documents").select(col("doc_id"), col("source")),
        "doc_id", "source", EpochMillis)
        .orderBy("doc_id", "copy")
    })

  /** q_mix_epochs' epoch table (fixed-point millis; 2450 = 2.45
    * epochs): a query parameter exercising every regime — >2 epochs,
    * exactly 1, fractional, sub-half, and zero (source dropped);
    * unlisted sources default to one epoch.
    */
  private[graft] val EpochMillis: Map[String, Long] = Map(
    "src0" -> 2450L, "src1" -> 1000L, "src2" -> 640L, "src3" -> 300L,
    "src4" -> 0L)

  /** Columns profiled by q_profile: strings and integers only — float
    * min/max would surface engine-specific decimal rendering.
    */
  private val ProfileCols =
    Seq("c_custkey", "c_name", "c_nationkey", "c_mktsegment")

  // ------------------------------------------------------------------
  // oracles
  // ------------------------------------------------------------------

  private val evCte =
    """ev AS (SELECT event_id, user_id, event_type, value,
      |  epoch_us(ts) AS ts_us FROM events)""".stripMargin

  /** Mirror of [[HllSketch.rhoCol]] over a 54-bit `rest` expression. */
  private def hllRho(rest: String): String = {
    val bitLen = (0 until HllSketch.RestBits)
      .map(j => s"CASE WHEN $rest >= ${1L << j} THEN 1 ELSE 0 END")
      .mkString("(", " + ", ")")
    s"least(${HllSketch.RestBits + 1} - $bitLen, ${HllSketch.MaxRho})"
  }

  /** Mirror of [[HllSketch.powCol]]: 2^(31-m) lookup list. */
  private val hllPowList: String =
    (0 to HllSketch.MaxRho).map(j => s"${1L << (HllSketch.MaxRho - j)}")
      .mkString("[", ", ", "]")

  /** [[HllSketch.EstNumerator]] as a literal that parses to the same
    * double (shortest round-trip representation).
    */
  private val hllNumerator: String =
    java.lang.Double.toString(HllSketch.EstNumerator)

  /** ln(M / V) for V in 1..M — the exact doubles the Spark plan's
    * [[graft.functions.DetLog]] expression produces (no libm ln in
    * either engine), as a 1-based DuckDB lookup list of
    * shortest-round-trip literals.
    */
  private val hllLnList: String =
    (1 to HllSketch.M).map(v => java.lang.Double.toString(
      graft.functions.DetLog.lnRatioRef(HllSketch.M.toLong, v.toLong)))
      .mkString("[", ", ", "]")

  val oracles: Map[String, String] = Map(
    "q_asof_join" ->
      s"""WITH $evCte,
         |c AS (SELECT event_id, user_id, ts_us, value FROM ev
         |      WHERE event_type = 'click'),
         |p AS (SELECT user_id, ts_us, max(event_id) AS p_event_id,
         |        max(value) AS p_value
         |      FROM ev WHERE event_type = 'purchase' GROUP BY 1, 2)
         |SELECT c.event_id, c.user_id, c.ts_us, c.value,
         |  p.ts_us AS p_ts_us, p.p_event_id, p.p_value
         |FROM c ASOF LEFT JOIN p
         |  ON c.user_id = p.user_id AND c.ts_us >= p.ts_us
         |ORDER BY c.event_id""".stripMargin,

    "q_range_join" ->
      s"""WITH $evCte,
         |c AS (SELECT event_id, user_id, ts_us FROM ev
         |      WHERE event_type = 'click'),
         |w AS (SELECT event_id AS s_event_id, user_id,
         |        ts_us AS start_us, ts_us + $TwoDaysUs AS end_us
         |      FROM ev WHERE event_type = 'signup')
         |SELECT c.event_id, c.user_id, c.ts_us, w.s_event_id, w.start_us
         |FROM c JOIN w ON c.user_id = w.user_id
         |  AND c.ts_us >= w.start_us AND c.ts_us < w.end_us
         |ORDER BY c.event_id, w.s_event_id""".stripMargin,

    "q_quantiles" ->
      """WITH hist AS (
        |  SELECT l_returnflag, l_quantity, count(*) AS cnt
        |  FROM lineitem GROUP BY 1, 2),
        |c AS (
        |  SELECT l_returnflag, l_quantity, cnt,
        |    CAST(sum(cnt) OVER (PARTITION BY l_returnflag
        |      ORDER BY l_quantity
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum,
        |    CAST(sum(cnt) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
        |  FROM hist)
        |SELECT l_returnflag, q, l_quantity AS quantile_value, n AS n_rows
        |FROM c, (SELECT unnest([0.25::DOUBLE, 0.5::DOUBLE, 0.75::DOUBLE,
        |  1.0::DOUBLE]) AS q) qs
        |WHERE cum - cnt < ceil(q * n) AND ceil(q * n) <= cum
        |ORDER BY l_returnflag, q""".stripMargin,

    "q_quantiles_approx" ->
      """WITH hist AS (
        |  SELECT l_returnflag,
        |    CAST(floor(l_extendedprice / 64) * 64 AS BIGINT) AS v,
        |    count(*) AS cnt
        |  FROM lineitem GROUP BY 1, 2),
        |c AS (
        |  SELECT l_returnflag, v, cnt,
        |    CAST(sum(cnt) OVER (PARTITION BY l_returnflag ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum,
        |    CAST(sum(cnt) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
        |  FROM hist)
        |SELECT l_returnflag, q, v AS quantile_value, n AS n_rows
        |FROM c, (SELECT unnest([0.5::DOUBLE, 0.9::DOUBLE,
        |  0.99::DOUBLE]) AS q) qs
        |WHERE cum - cnt < ceil(q * n) AND ceil(q * n) <= cum
        |ORDER BY l_returnflag, q""".stripMargin,

    "q_tfidf" ->
      s"""WITH ${OracleSql.toksCte},
         |t AS (SELECT doc_id, unnest(w) AS term FROM toks),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
         |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |scored AS (
         |  SELECT doc_id, term, tf, df,
         |    CAST(tf * (SELECT count(*) FROM documents) AS DOUBLE) / df
         |      AS tf_idf
         |  FROM tf JOIN dfq USING (term)),
         |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
         |  ORDER BY tf_idf DESC, term) AS rank FROM scored)
         |SELECT doc_id, term, tf, df, tf_idf, rank
         |FROM r WHERE rank <= 5 ORDER BY doc_id, rank""".stripMargin,

    "q_embedding_centroid" ->
      s"""SELECT label, r.range AS dim,
         |  count(*) AS n_vectors,
         |  CAST(CAST(sum(CAST(floor(embedding[r.range]::DOUBLE
         |      * ${Centroids.Scale}) AS BIGINT)) AS BIGINT) AS DOUBLE)
         |    / (${Centroids.Scale}.0 * count(*)) AS centroid
         |FROM embeddings, range(1, ${graft.similarity.VectorFunctions.Dim + 1}) r
         |GROUP BY 1, 2
         |ORDER BY label, dim""".stripMargin,

    "q_hll_distinct" ->
      s"""WITH h AS (
         |  SELECT ${OracleSql.tokenHash("'hll:' || CAST(event_id AS VARCHAR)")}
         |    AS h FROM events),
         |b AS (SELECT h % ${HllSketch.M} AS bucket,
         |        h // ${HllSketch.M} AS rest FROM h),
         |r AS (SELECT bucket, ${hllRho("rest")} AS rho FROM b),
         |regs0 AS (SELECT bucket, max(rho) AS m FROM r GROUP BY bucket),
         |allb AS (SELECT range AS bucket FROM range(0, ${HllSketch.M})),
         |regs AS (SELECT allb.bucket, coalesce(regs0.m, 0) AS m
         |  FROM allb LEFT JOIN regs0 ON allb.bucket = regs0.bucket),
         |agg AS (SELECT count(*) AS m_buckets,
         |  CAST(sum($hllPowList[m + 1]) AS BIGINT) AS sum_pow,
         |  CAST(sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero
         |  FROM regs)
         |SELECT m_buckets, sum_pow, n_zero,
         |  CASE WHEN $hllNumerator / sum_pow <= ${HllSketch.SmallRangeThreshold}
         |      AND n_zero > 0
         |    THEN ${HllSketch.M}.0 * $hllLnList[n_zero]
         |    ELSE $hllNumerator / sum_pow END AS estimate,
         |  (SELECT count(DISTINCT event_id) FROM events) AS exact_distinct
         |FROM agg""".stripMargin,

    "q_hll_grouped" ->
      s"""WITH h AS (
         |  SELECT event_type,
         |    ${OracleSql.tokenHash("'hll:' || CAST(user_id AS VARCHAR)")}
         |    AS h FROM events),
         |b AS (SELECT event_type, h % ${HllSketch.M} AS bucket,
         |        h // ${HllSketch.M} AS rest FROM h),
         |r AS (SELECT event_type, bucket, ${hllRho("rest")} AS rho FROM b),
         |regs0 AS (SELECT event_type, bucket, max(rho) AS m FROM r
         |  GROUP BY 1, 2),
         |g AS (SELECT DISTINCT event_type FROM regs0),
         |allb AS (SELECT g.event_type, range AS bucket
         |  FROM g CROSS JOIN range(0, ${HllSketch.M})),
         |regs AS (SELECT allb.event_type, allb.bucket,
         |    coalesce(regs0.m, 0) AS m
         |  FROM allb LEFT JOIN regs0
         |    ON allb.event_type IS NOT DISTINCT FROM regs0.event_type
         |    AND allb.bucket = regs0.bucket),
         |agg AS (SELECT event_type, count(*) AS m_buckets,
         |  CAST(sum($hllPowList[m + 1]) AS BIGINT) AS sum_pow,
         |  CAST(sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero
         |  FROM regs GROUP BY 1),
         |ex AS (SELECT event_type, count(DISTINCT user_id)
         |    AS exact_distinct FROM events GROUP BY 1)
         |SELECT agg.event_type, m_buckets, sum_pow, n_zero,
         |  round(CASE
         |    WHEN $hllNumerator / sum_pow <= ${HllSketch.SmallRangeThreshold}
         |      AND n_zero > 0
         |    THEN ${HllSketch.M}.0 * $hllLnList[n_zero]
         |    ELSE $hllNumerator / sum_pow END, 6) AS est_r,
         |  exact_distinct
         |FROM agg JOIN ex ON agg.event_type = ex.event_type
         |ORDER BY agg.event_type""".stripMargin,

    "q_sample_stratified" -> {
      val h = OracleSql.tokenHash("'sample:' || CAST(doc_id AS VARCHAR)")
      s"""SELECT doc_id, lang, ($h) % 100 AS bucket
         |FROM documents
         |WHERE ($h) % 100 <
         |  CASE WHEN lang = 'en' THEN 50 ELSE 20 END
         |ORDER BY doc_id""".stripMargin
    },

    "q_bloom_semijoin" ->
      """SELECT l_orderkey, l_linenumber, l_suppkey, l_quantity
        |FROM lineitem
        |WHERE l_suppkey IN
        |  (SELECT s_suppkey FROM supplier WHERE s_acctbal > 6000)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_window_hopping" ->
      """WITH e AS (SELECT event_type, value, epoch_us(ts) AS us
        |  FROM events),
        |x AS (SELECT event_type, value, unnest([
        |    (us // 1800000000) * 1800000000,
        |    (us // 1800000000) * 1800000000 - 1800000000]) AS ws
        |  FROM e)
        |SELECT strftime(make_timestamp(ws), '%Y-%m-%d %H:%M:%S')
        |    AS window_start,
        |  event_type, count(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total_value
        |FROM x GROUP BY 1, 2
        |ORDER BY window_start, event_type""".stripMargin,

    "q_chunk_docs" ->
      s"""WITH ${OracleSql.toksCte},
         |st AS (SELECT doc_id, w,
         |  unnest(range(1, greatest(1, len(w)) + 1, 30)) AS chunk_start
         |  FROM toks),
         |c AS (SELECT doc_id, (chunk_start - 1) // 30 AS chunk_id,
         |  chunk_start, list_slice(w, chunk_start, chunk_start + 39) AS ch
         |  FROM st)
         |SELECT doc_id, chunk_id, chunk_start, len(ch) AS n_tokens,
         |  array_to_string(ch, ' ') AS chunk_text
         |FROM c ORDER BY doc_id, chunk_id""".stripMargin,

    "q_rollup" ->
      """SELECT
        |  CASE WHEN GROUPING(l_returnflag) = 1 THEN 'ALL'
        |    ELSE l_returnflag END AS returnflag,
        |  CASE WHEN GROUPING(l_linestatus) = 1 THEN 'ALL'
        |    ELSE l_linestatus END AS linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE)
        |    AS sum_qty,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,

    "q_cube" ->
      """SELECT
        |  CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL'
        |    ELSE o_orderstatus END AS orderstatus,
        |  CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL'
        |    ELSE o_orderpriority END AS orderpriority,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE)
        |    AS sum_price,
        |  count(*) AS n_rows
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY orderstatus, orderpriority""".stripMargin,

    "q_retention" ->
      s"""WITH $evCte,
         |d AS (SELECT user_id, ts_us // 86400000000 AS d FROM ev),
         |f AS (SELECT user_id, min(d) AS d0 FROM d GROUP BY 1)
         |SELECT f.d0 AS cohort_day, d.d - f.d0 AS day_offset,
         |  count(DISTINCT d.user_id) AS n_users
         |FROM d JOIN f USING (user_id)
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_funnel" ->
      s"""WITH $evCte,
         |s1 AS (SELECT user_id, min(ts_us) AS t1 FROM ev
         |  WHERE event_type = 'signup' GROUP BY 1),
         |s2 AS (SELECT e.user_id, min(ts_us) AS t2 FROM ev e
         |  JOIN s1 USING (user_id)
         |  WHERE event_type = 'click' AND ts_us >= t1 GROUP BY 1),
         |s3 AS (SELECT e.user_id, min(ts_us) AS t3 FROM ev e
         |  JOIN s2 USING (user_id)
         |  WHERE event_type = 'purchase' AND ts_us >= t2 GROUP BY 1)
         |SELECT stage, n_users FROM (
         |  SELECT '1_signup' AS stage, count(*) AS n_users FROM s1
         |  UNION ALL SELECT '2_click', count(*) FROM s2
         |  UNION ALL SELECT '3_purchase', count(*) FROM s3)
         |ORDER BY stage""".stripMargin,

    "q_window_rank" ->
      """WITH r AS (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    rank() OVER w AS rnk,
        |    dense_rank() OVER w AS drnk,
        |    ntile(4) OVER w AS quartile,
        |    lag(o_totalprice, 1) OVER w AS prev_price,
        |    lead(o_totalprice, 1) OVER w AS next_price
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey ASC))
        |SELECT * FROM r WHERE rnk <= 3
        |ORDER BY o_custkey, rnk, o_orderkey""".stripMargin,

    "q_sessionize" ->
      s"""WITH $evCte,
         |o AS (SELECT user_id, ts_us, event_id,
         |  lag(ts_us) OVER (PARTITION BY user_id
         |    ORDER BY ts_us, event_id) AS prev
         |  FROM ev),
         |m AS (SELECT user_id, ts_us, event_id,
         |  CASE WHEN prev IS NULL OR ts_us - prev > 1800000000
         |    THEN 1 ELSE 0 END AS boundary FROM o),
         |sq AS (SELECT user_id, ts_us,
         |  CAST(sum(boundary) OVER (PARTITION BY user_id
         |    ORDER BY ts_us, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |    AS BIGINT) AS session_seq
         |  FROM m)
         |SELECT user_id, session_seq, count(*) AS n_events,
         |  min(ts_us) AS session_start, max(ts_us) AS session_end,
         |  max(ts_us) - min(ts_us) AS duration
         |FROM sq GROUP BY 1, 2
         |ORDER BY user_id, session_seq""".stripMargin,

    "q_pivot" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN l_linestatus = 'F'
        |    THEN CAST(l_quantity AS DECIMAL(28,4)) END) AS DOUBLE)
        |    AS "qty_F",
        |  CAST(SUM(CASE WHEN l_linestatus = 'O'
        |    THEN CAST(l_quantity AS DECIMAL(28,4)) END) AS DOUBLE)
        |    AS "qty_O"
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q_latest_per_key" ->
      """WITH r AS (
        |  SELECT o_custkey, epoch_us(o_orderdate) AS order_us,
        |    o_orderkey, o_totalprice, o_orderstatus,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY epoch_us(o_orderdate) DESC, o_orderkey DESC) AS rn
        |  FROM orders)
        |SELECT o_custkey, order_us, o_orderkey, o_totalprice,
        |  o_orderstatus
        |FROM r WHERE rn = 1 ORDER BY o_custkey""".stripMargin,

    "q_gapfill" ->
      s"""WITH $evCte,
         |c AS (SELECT event_type, ts_us // 86400000000 AS day,
         |    count(*) AS n_events,
         |    CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE)
         |      AS total_value
         |  FROM ev GROUP BY 1, 2),
         |b AS (SELECT min(ts_us // 86400000000) AS mn,
         |    max(ts_us // 86400000000) AS mx FROM ev),
         |days AS (SELECT unnest(generate_series(mn, mx)) AS day FROM b),
         |g AS (SELECT DISTINCT event_type FROM ev)
         |SELECT g.event_type, days.day,
         |  coalesce(c.n_events, 0) AS n_events,
         |  coalesce(c.total_value, 0.0) AS total_value
         |FROM days CROSS JOIN g
         |LEFT JOIN c ON c.event_type = g.event_type AND c.day = days.day
         |ORDER BY g.event_type, days.day""".stripMargin,

    "q_moving_avg" ->
      """SELECT o_custkey, epoch_us(o_orderdate) AS order_us, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) OVER w AS DOUBLE)
        |    AS mov_sum3,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) OVER w AS DOUBLE)
        |    / COUNT(*) OVER w AS mov_avg3
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY epoch_us(o_orderdate), o_orderkey
        |  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, order_us, o_orderkey""".stripMargin,

    "q_group_sample" -> {
      val h = OracleSql.tokenHash("'ksample:' || CAST(doc_id AS VARCHAR)")
      s"""WITH h AS (SELECT doc_id, lang, $h AS h FROM documents),
         |r AS (SELECT doc_id, lang,
         |  row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rn
         |  FROM h)
         |SELECT doc_id, lang FROM r WHERE rn <= 5
         |ORDER BY doc_id""".stripMargin
    },

    "q_pagerank" ->
      s"""WITH RECURSIVE
         |edges AS (
         |  SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst
         |    FROM lineitem
         |  UNION
         |  SELECT DISTINCT l_suppkey * 2 + 1 AS src, l_partkey * 2 AS dst
         |    FROM lineitem),
         |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
         |pr AS (
         |  SELECT 0 AS iter, src AS id,
         |    CAST(${PageRank.Scale} AS BIGINT) AS r FROM deg
         |  UNION ALL
         |  SELECT s.iter + 1, s.id,
         |    CAST(${PageRank.Base} + (17 * s.c) // 20 AS BIGINT) AS r
         |  FROM (SELECT pr.iter AS iter, e.dst AS id,
         |          CAST(sum(pr.r // d.outdeg) AS BIGINT) AS c
         |        FROM pr
         |        JOIN edges e ON pr.id = e.src
         |        JOIN deg d ON d.src = pr.id
         |        WHERE pr.iter < 5 GROUP BY 1, 2) s)
         |SELECT id, r AS rank_fp FROM pr WHERE iter = 5
         |ORDER BY id""".stripMargin,

    "q_histogram" ->
      s"""WITH ${OracleSql.toksCte},
         |v AS (SELECT len(w) AS v FROM toks)
         |SELECT least(v // 20, 19) AS bucket, count(*) AS n_rows,
         |  min(v) AS min_value, max(v) AS max_value
         |FROM v GROUP BY 1 ORDER BY bucket""".stripMargin,

    "q_profile" -> {
      val cols = Seq("c_custkey", "c_name", "c_nationkey", "c_mktsegment")
      val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
        Seq(s"count($c) AS nn$i", s"count(DISTINCT $c) AS nd$i",
          s"min(CAST($c AS VARCHAR)) AS mn$i",
          s"max(CAST($c AS VARCHAR)) AS mx$i")
      }.mkString(", ")
      val branches = cols.zipWithIndex.map { case (c, i) =>
        s"""SELECT '$c' AS col_name, n AS n_rows, n - nn$i AS n_nulls,
           |  nd$i AS n_distinct, mn$i AS min_str, mx$i AS max_str FROM s"""
          .stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH s AS (SELECT count(*) AS n, $aggs FROM customer)
         |$branches
         |ORDER BY col_name""".stripMargin
    },

    // exact integer z-score membership: HUGEINT products replay Spark's
    // DECIMAL(38,0) arithmetic exactly
    "q_outliers" ->
      """WITH e AS (SELECT event_id, event_type,
        |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |st AS (SELECT event_type,
        |    CAST(count(*) AS HUGEINT) AS n,
        |    CAST(sum(cents) AS HUGEINT) AS s,
        |    CAST(sum(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS ssq
        |  FROM e GROUP BY 1)
        |SELECT event_id, e.event_type, cents
        |FROM e JOIN st ON e.event_type = st.event_type
        |WHERE (n * cents - s) * (n * cents - s)
        |  > 4 * (n * ssq - s * s)
        |ORDER BY event_id""".stripMargin,

    "q_event_transitions" ->
      """WITH nx AS (SELECT event_type AS from_state,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS to_state
        |  FROM events),
        |c AS (SELECT from_state, to_state, count(*) AS n
        |  FROM nx WHERE to_state IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT from_state, CAST(sum(n) AS BIGINT) AS tot
        |  FROM c GROUP BY 1)
        |SELECT c.from_state, c.to_state, CAST(n AS BIGINT) AS n,
        |  CAST(n AS DOUBLE) / CAST(tot AS DOUBLE) AS p
        |FROM c JOIN t USING (from_state)
        |ORDER BY c.from_state, c.to_state""".stripMargin,

    // naive closed-wedge formulation — independent of the engine's
    // degree-oriented algorithm
    "q_triangles" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem),
        |e AS (SELECT DISTINCT a.pk AS a, b.pk AS b
        |  FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk),
        |tr AS (SELECT count(*) AS n_triangles
        |  FROM e ab JOIN e bc ON ab.b = bc.a
        |    JOIN e ac ON ac.a = ab.a AND ac.b = bc.b),
        |ne AS (SELECT count(*) AS n_edges FROM e)
        |SELECT CAST(n_edges AS BIGINT) AS n_edges,
        |  CAST(n_triangles AS BIGINT) AS n_triangles
        |FROM ne, tr""".stripMargin,

    "q_entity_pairs" ->
      """WITH c AS (SELECT c_custkey AS id, c_name AS name FROM customer),
        |k AS (SELECT id, unnest(list_distinct(list_prepend(name,
        |    list_transform(range(1, length(name) + 1),
        |      i -> substr(name, 1, i - 1)
        |        || substr(name, i + 1, length(name)))))) AS key
        |  FROM c),
        |cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
        |  FROM k a JOIN k b ON a.key = b.key AND a.id < b.id),
        |p AS (SELECT id_a, id_b,
        |    CAST(levenshtein(ca.name, cb.name) AS BIGINT) AS dist
        |  FROM cand JOIN c ca ON ca.id = cand.id_a
        |    JOIN c cb ON cb.id = cand.id_b)
        |SELECT id_a, id_b, dist FROM p WHERE dist <= 1
        |ORDER BY id_a, id_b""".stripMargin,

    "q_weighted_sample" -> {
      val h = OracleSql.tokenHash("'wsample:' || CAST(doc_id AS VARCHAR)")
      s"""WITH w AS (SELECT CAST(sum(n_chars) AS HUGEINT) AS tot
         |  FROM documents)
         |SELECT doc_id, n_chars FROM documents, w
         |WHERE CAST(($h) % 1048576 AS HUGEINT) * tot
         |  < CAST(100 AS HUGEINT) * n_chars * 1048576
         |ORDER BY doc_id""".stripMargin
    },

    "q_mix_sources" -> {
      val h = OracleSql.tokenHash("'tmix:' || CAST(d.doc_id AS VARCHAR)")
      s"""WITH src AS (SELECT source, COUNT(*) AS n,
         |    CAST(FLOOR(sqrt(COUNT(*)) * 1048576) AS BIGINT) AS ss
         |  FROM documents GROUP BY source),
         |tot AS (SELECT CAST(SUM(ss) AS HUGEINT) AS stot FROM src)
         |SELECT d.doc_id, d.source FROM documents d, src, tot
         |WHERE d.source = src.source
         |  AND CAST(($h) % 1048576 AS HUGEINT) * n * stot
         |    < CAST(200 AS HUGEINT) * ss * 1048576
         |ORDER BY doc_id""".stripMargin
    },

    // epoch mixing: the CASE epoch table, integer-exact fractional
    // threshold (h20·1000 < frac_millis·2^20), range-unnest replication
    "q_mix_epochs" -> {
      val h = OracleSql.tokenHash("'emix:' || CAST(doc_id AS VARCHAR)")
      val cases = EpochMillis.toSeq.sortBy(_._1)
        .map { case (k, v) => s"WHEN '$k' THEN $v" }.mkString(" ")
      s"""WITH e AS (SELECT doc_id, source,
         |  CASE source $cases ELSE 1000 END AS em,
         |  ($h) % 1048576 AS h20
         |  FROM documents),
         |c AS (SELECT doc_id, source,
         |  em // 1000 + (CASE WHEN h20 * 1000 < (em % 1000) * 1048576
         |    THEN 1 ELSE 0 END) AS copies
         |  FROM e)
         |SELECT doc_id, source,
         |  CAST(unnest(range(0, copies)) AS BIGINT) AS copy
         |FROM c ORDER BY doc_id, copy""".stripMargin
    })
}
