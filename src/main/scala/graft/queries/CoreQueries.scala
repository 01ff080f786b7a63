package graft.queries

import graft._
import graft.catalog.Layer
import graft.io.ParquetDatastore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared plumbing for the driver-facing query corpus. Every query gets a
  * GraftConf whose single source system points at the driver's parquet dir
  * for the requested scale factor (TESTDATA.md layout).
  */
object Q {
  val Src = "TESTDATA"

  /** Per-query `sub` dirs isolate warehouse-writing queries from each
    * other (a lifecycle query overwriting `dm_customer` must not race
    * another query's read of it).
    */
  def conf(sfDir: String, sub: String = ""): GraftConf = GraftConf(
    warehousePath =
      s"/root/repo/target/warehouse/${sfDir.replaceAll("[^A-Za-z0-9]", "_")}" +
        (if (sub.nonEmpty) s"/$sub" else ""),
    srcSystems = Map(Src -> ParquetDatastore(sfDir)))

  /** Extract a table and drop the (timestamped, nondeterministic) audit
    * columns so results are oracle-comparable.
    */
  def src(dfl: DataFlow, table: String): DataFrame = {
    dfl.getDataFromSrc(table, Src)
    dfl.dropColumns(table, dropAuditCols = true)
    dfl.get(table)
  }

  /** Exact decimal sum of a double expression, returned as double: makes
    * SUM order-insensitive and bit-identical across engines (IEEE doubles
    * summed in different orders are not; decimals are).
    */
  def dsum(c: org.apache.spark.sql.Column, scale: Int = 4)
      : org.apache.spark.sql.Column =
    sum(c.cast(DecimalType(28, scale))).cast("double")

  /** events.parquet's `ts` has shipped BOTH TIMESTAMP(NANOS) and
    * TIMESTAMP(MICROS) physical types across driver testdata
    * generations. Every reader takes it as raw INT64 (this schema +
    * the legacy nanosAsLong flag) and derives micros with integral
    * `div` by the footer-detected unit ([[eventsTsUs]]) — epoch-nano
    * magnitudes exceed 2^53, so a double detour would corrupt them.
    * One shared definition so streaming and analytics reads cannot
    * desync.
    */
  private[graft] val EventsSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("event_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("ts",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("user_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("event_type",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("value",
      org.apache.spark.sql.types.DoubleType),
    org.apache.spark.sql.types.StructField("props",
      org.apache.spark.sql.types.StringType)))

  /** Epoch-µs rendering of the raw events `ts` column, agnostic to the
    * file's physical timestamp unit. With nanosAsLong on, a NANOS file
    * infers `ts: bigint` (raw nanos → div 1000) while a MICROS file
    * infers a timestamp type (raw micros when read through
    * [[EventsSchema]]'s LongType → div 1). DuckDB's `epoch_us(ts)` is
    * unit-agnostic the same way, so both engines agree for either
    * generation of driver testdata. Unit cached per file path — it is
    * a property of the file, not the session.
    */
  private val tsDivCache =
    new scala.collection.concurrent.TrieMap[String, Long]()
  private[graft] def eventsTsUs(s: SparkSession, dir: String)
      : org.apache.spark.sql.Column = {
    val path = s"$dir/events.parquet"
    val div = tsDivCache.getOrElseUpdate(path, {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.read.parquet(path).schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => 1000L
        case _                                   => 1L
      }
    })
    expr(s"ts div $div")
  }
}

/** Queries exercising the reference's row/schema/data operators
  * (SURVEY.md §2.1-§2.5, §2.8) through the DataFlow surface, each with a
  * DuckDB oracle in [[CoreQueries.oracles]].
  */
object CoreQueries {
  import Q._

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.4 aggregation over the full operator chain — flagship (TPC-H Q1 shape)
    "q1_agg" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q1_agg")
      dfl.getDataFromSrc("lineitem", Src)
      dfl.filter("lineitem", Map(
        "l_shipdate" -> FilterSpec.Lt(to_timestamp(lit("1998-09-01 00:00:00")))))
      val li = dfl.get("lineitem")
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity"), 2).as("sum_qty"),
          dsum(col("l_extendedprice"), 2).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // §2.2 filter: Eq / Gt specs ANDed
    "q_filter" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_filter")
      src(dfl, "lineitem")
      dfl.filter("lineitem", Map(
        "l_returnflag" -> FilterSpec.Eq("A"),
        "l_quantity" -> FilterSpec.Gt(30.0)))
      dfl.getColumns("lineitem",
        Seq("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // §2.2 filter: Ne / NotIn specs
    "q_filter_notin" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_filter_notin")
      src(dfl, "orders")
      dfl.filter("orders", Map(
        "o_orderpriority" -> FilterSpec.NotIn(Seq("1-URGENT", "2-HIGH")),
        "o_orderstatus" -> FilterSpec.Ne("P")))
      dfl.getColumns("orders",
        Seq("o_orderkey", "o_orderstatus", "o_orderpriority"))
        .orderBy("o_orderkey")
    },

    // §2.2 filterWhereNotIn: composite-key LEFT ANTI join
    "q_filter_where_not_in" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_filter_where_not_in")
      src(dfl, "lineitem")
      src(dfl, "orders")
      dfl.filter("orders",
        Map("o_orderpriority" -> FilterSpec.Eq("1-URGENT")),
        targetDataset = Some("urgent"))
      dfl.renameColumns("urgent", Map("o_orderkey" -> "l_orderkey"))
      dfl.filterWhereNotIn("lineitem", Seq("l_orderkey"), "urgent")
      dfl.getColumns("lineitem", Seq("l_orderkey", "l_linenumber"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // §2.2 dedupe: distinct rows after projection
    "q_dedupe" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_dedupe")
      src(dfl, "orders")
      dfl.dropColumns("orders",
        colsToKeep = Seq("o_orderstatus", "o_orderpriority"),
        dropAuditCols = true)
      dfl.dedupe("orders")
      dfl.get("orders").orderBy("o_orderstatus", "o_orderpriority")
    },

    // §2.2 dropColumns(keep-list) + renameColumns
    "q_drop_rename" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_drop_rename")
      src(dfl, "customer")
      dfl.dropColumns("customer",
        colsToKeep = Seq("c_custkey", "c_name", "c_mktsegment"),
        dropAuditCols = true)
      dfl.renameColumns("customer",
        Map("c_name" -> "customer_name", "c_mktsegment" -> "segment"))
      dfl.get("customer").orderBy("c_custkey")
    },

    // §2.2 addColumns: literal + computed expression
    "q_add_columns" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_add_columns")
      src(dfl, "customer")
      dfl.addColumns("customer", Map(
        "load_source" -> lit("crm"),
        "bal_band" -> when(col("c_acctbal") < 0.0, "negative")
          .when(col("c_acctbal") < 5000.0, "low")
          .otherwise("high")))
      dfl.getColumns("customer",
        Seq("c_custkey", "c_acctbal", "load_source", "bal_band"))
        .orderBy("c_custkey")
    },

    // §2.2 setNulls: per-column null fill
    "q_set_nulls" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_set_nulls")
      src(dfl, "customer")
      // synthesize nulls (corpus has none), then exercise the operator
      dfl.addColumns("customer",
        Map("segment" -> nullif(col("c_mktsegment"), lit("BUILDING"))))
      dfl.setNulls("customer", Map("segment" -> "UNKNOWN"))
      dfl.getColumns("customer", Seq("c_custkey", "segment"))
        .orderBy("c_custkey")
    },

    // §2.2 replace: literal value replacement on chosen columns
    "q_replace" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_replace")
      src(dfl, "lineitem")
      dfl.replace("lineitem", "A", "ACCEPTED", columns = Seq("l_returnflag"))
      dfl.replace("lineitem", "^RA", "RETURN-",
        regex = true, columns = Seq("l_linestatus"))
      dfl.getColumns("lineitem",
        Seq("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // §2.2 toNumeric: strip non-numeric chars, cast, null→0
    "q_to_numeric" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_to_numeric")
      src(dfl, "part")
      dfl.addColumns("part", Map(
        "messy" -> concat(lit("id#"), col("p_partkey").cast("string"), lit("-v")),
        "blank" -> lit("n/a")))
      dfl.toNumeric("part", Seq("messy", "blank"), Seq("clean_key", "clean_blank"))
      dfl.getColumns("part", Seq("p_partkey", "clean_key", "clean_blank"))
        .orderBy("p_partkey")
    },

    // §2.3 join: inner equi-join + bespoke aggregation
    "q_join_inner" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_join_inner")
      src(dfl, "orders")
      src(dfl, "customer")
      dfl.renameColumns("orders", Map("o_custkey" -> "c_custkey"))
      dfl.join(("orders", "customer"), "oc",
        joinCols = Seq("c_custkey"), how = "inner")
      dfl.get("oc").groupBy("c_mktsegment")
        .agg(dsum(col("o_totalprice"), 2).as("total_price"),
          count(lit(1)).as("n_orders"))
        .orderBy("c_mktsegment")
    },

    // §2.3 salted skew-join: identical result to the plain inner join,
    // with the hot-key fanout spread across (key, salt) buckets — the
    // manual skew recipe for build sides too big to broadcast
    "q_join_salted" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_join_salted")
      src(dfl, "lineitem")
      src(dfl, "supplier")
      dfl.renameColumns("lineitem", Map("l_suppkey" -> "s_suppkey"))
      dfl.join(("lineitem", "supplier"), "ls",
        joinCols = Seq("s_suppkey"), how = "inner", saltFactor = 8)
      dfl.get("ls").groupBy("s_name")
        .agg(dsum(col("l_quantity"), 2).as("total_qty"),
          count(lit(1)).as("n_items"))
        .orderBy("s_name")
    },

    // §2.3 join: left outer with null-producing side
    "q_join_left" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_join_left")
      src(dfl, "customer")
      src(dfl, "orders")
      dfl.filter("orders",
        Map("o_orderpriority" -> FilterSpec.Eq("1-URGENT")))
      dfl.renameColumns("orders", Map("o_custkey" -> "c_custkey"))
      dfl.join(("customer", "orders"), "co",
        joinCols = Seq("c_custkey"), how = "left",
        keepCols = Seq("c_custkey", "o_orderkey", "o_totalprice"))
      dfl.get("co")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_urgent"),
          dsum(coalesce(col("o_totalprice"), lit(0.0)), 2).as("urgent_total"))
        .orderBy("c_custkey")
    },

    // §2.3 join: full outer (MDM-shaped: both/left_only/right_only marker)
    "q_join_outer" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_join_outer")
      src(dfl, "customer")
      src(dfl, "supplier")
      dfl.dedupe("customer") // no-op; keeps chain honest
      val cn = dfl.get("customer").groupBy(col("c_nationkey").as("nationkey"))
        .agg(count(lit(1)).as("n_cust"))
      val sn = dfl.get("supplier").groupBy(col("s_nationkey").as("nationkey"))
        .agg(count(lit(1)).as("n_supp"))
      dfl.createDataset("cn", cn)
      dfl.createDataset("sn", sn)
      dfl.join(("cn", "sn"), "both",
        joinCols = Seq("nationkey"), how = "outer")
      dfl.get("both")
        .withColumn("presence",
          when(col("n_cust").isNull, "right_only")
            .when(col("n_supp").isNull, "left_only")
            .otherwise("both"))
        .na.fill(0L, Seq("n_cust", "n_supp"))
        .orderBy("nationkey")
    },

    // §2.3 cartesianJoin → true cross join
    "q_join_cartesian" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_join_cartesian")
      src(dfl, "region")
      dfl.duplicateDataset("region", Seq("r1"))
      dfl.renameColumns("r1",
        Map("r_regionkey" -> "r2_regionkey", "r_name" -> "r2_name"))
      dfl.join(("region", "r1"), "pairs", cartesianJoin = true)
      dfl.get("pairs")
        .select("r_regionkey", "r_name", "r2_regionkey", "r2_name")
        .orderBy("r_regionkey", "r2_regionkey")
    },

    // §2.5 union: column-aligned concat of N datasets
    "q_union" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_union")
      src(dfl, "orders")
      dfl.filter("orders", Map("o_orderstatus" -> FilterSpec.Eq("F")),
        targetDataset = Some("f_orders"))
      dfl.filter("orders", Map("o_orderstatus" -> FilterSpec.Eq("O")),
        targetDataset = Some("o_orders"))
      dfl.union(Seq("f_orders", "o_orders"), "fo")
      dfl.getColumns("fo", Seq("o_orderkey", "o_orderstatus"))
        .orderBy("o_orderkey")
    },

    // §2.5 pivotColsToRows: wide→long unpivot
    "q_unpivot" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_unpivot")
      src(dfl, "part")
      dfl.dropColumns("part",
        colsToKeep = Seq("p_partkey", "p_brand", "p_type"),
        dropAuditCols = true)
      dfl.pivotColsToRows("part", Seq("p_partkey"),
        Seq("p_brand", "p_type"), "attribute", "value")
      dfl.get("part").orderBy("p_partkey", "attribute")
    },

    // §2.5 sort + limit (top-k): total order incl. tiebreak
    "q_sort_limit" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_sort_limit")
      src(dfl, "orders")
      dfl.get("orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .limit(10)
    },

    // §2.8 customSQL: full multi-table SQL over dataflow temp views
    "q_custom_sql" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_custom_sql")
      Seq("customer", "orders", "lineitem", "supplier", "nation", "region")
        .foreach(src(dfl, _))
      dfl.customSQL(
        """SELECT n_name,
          |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
          |      AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
          |  COUNT(*) AS n_items
          |FROM customer, orders, lineitem, supplier, nation, region
          |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          |  AND r_name = 'ASIA'
          |GROUP BY n_name
          |ORDER BY revenue DESC, n_name""".stripMargin,
        targetDataset = Some("q5"))
      dfl.get("q5")
    },

    // §2.8 applyFunctionToColumns: Column=>Column stays in codegen
    "q_apply_fn_columns" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_apply_fn_columns")
      src(dfl, "nation")
      dfl.applyFunctionToColumns("nation", Seq("n_name"),
        cc => initcap(lower(cc)), Seq("pretty_name"))
      dfl.getColumns("nation", Seq("n_nationkey", "n_name", "pretty_name"))
        .orderBy("n_nationkey")
    },

    // §2.1 write→read round trip through the EXT layer
    "q_read_write_roundtrip" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_read_write_roundtrip")
      src(dfl, "nation")
      dfl.write("nation", "nation_rt", Layer.EXT)
      dfl.read("nation_rt", Layer.EXT)
      dfl.get("nation_rt").orderBy("n_nationkey")
    },

    // §2.1 createDataset from literal data
    "q_create_dataset" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_create_dataset")
      dfl.createDataset("ops", Map(
        "op_code" -> Seq("BULK", "DELTA", "NO LOAD", "REFRESH"),
        "op_rank" -> Seq("1", "2", "3", "4")))
      dfl.get("ops").orderBy("op_rank")
    },

    // §2.8 applyFunctionToRows: distributed side-effecting foreach,
    // observed through an accumulator
    "q_apply_fn_rows" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_apply_fn_rows")
      src(dfl, "supplier")
      val seen = s.sparkContext.longAccumulator("rows_seen")
      dfl.applyFunctionToRows("supplier", _ => seen.add(1))
      import s.implicits._
      Seq(seen.value).toDF("n_rows")
    },

    // §2.8 row-function column: pandas apply(axis=1) equivalent
    "q_row_function" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_row_function")
      src(dfl, "nation")
      dfl.withRowFunction("nation", "tagged", r =>
        s"${r.getAs[String]("n_name")}:${r.getAs[Int]("n_regionkey")}")
      dfl.getColumns("nation", Seq("n_nationkey", "tagged"))
        .orderBy("n_nationkey")
    },

    // §2.5 extension: window functions (ranking + running frame) — the
    // reference has none; bespoke summarise code gets them free via Spark
    "q_window_agg" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_window_agg")
      src(dfl, "orders")
      import org.apache.spark.sql.expressions.Window
      val rankW = Window.partitionBy("o_orderpriority")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      val runW = Window.partitionBy("o_custkey").orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      dfl.get("orders")
        .select("o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice")
        .withColumn("price_rank",
          row_number().over(rankW).cast("bigint"))
        .withColumn("running_total",
          sum(col("o_totalprice").cast(DecimalType(28, 2))).over(runW)
            .cast("double"))
        .where(col("price_rank") <= 5)
        .orderBy("o_orderpriority", "price_rank")
    },

    // §2.5 extension: set operations (intersect / except)
    "q_set_ops" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_set_ops")
      src(dfl, "customer")
      src(dfl, "orders")
      val building = dfl.get("customer")
        .where(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val urgent = dfl.get("orders")
        .where(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("c_custkey"))
      building.intersect(urgent).withColumn("set_op", lit("both"))
        .unionByName(
          building.except(urgent).withColumn("set_op", lit("building_only")))
        .orderBy("set_op", "c_custkey")
    },

    // §2.6 NK collapse: concat_ws over composite natural key
    "q_nk_collapse" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_nk_collapse")
      src(dfl, "lineitem")
      dfl.dropColumns("lineitem",
        colsToKeep = Seq("l_orderkey", "l_linenumber", "l_quantity"),
        dropAuditCols = true)
      dfl.collapseNaturalKeys("lineitem",
        Seq("l_orderkey", "l_linenumber"), "nk_lineitem")
      dfl.get("lineitem").orderBy("nk_lineitem")
    })

  val oracles: Map[String, String] = Map(
    "q_apply_fn_rows" ->
      "SELECT COUNT(*) AS n_rows FROM supplier",
    "q_row_function" ->
      """SELECT n_nationkey,
        |  n_name || ':' || CAST(n_regionkey AS VARCHAR) AS tagged
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem WHERE l_returnflag = 'A' AND l_quantity > 30.0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_filter_notin" ->
      """SELECT o_orderkey, o_orderstatus, o_orderpriority
        |FROM orders
        |WHERE (o_orderpriority IS NULL
        |       OR o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
        |  AND (o_orderstatus IS NULL OR o_orderstatus <> 'P')
        |ORDER BY o_orderkey""".stripMargin,
    "q_filter_where_not_in" ->
      """SELECT l_orderkey, l_linenumber FROM lineitem
        |WHERE l_orderkey NOT IN
        |  (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_dedupe" ->
      """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,
    "q_drop_rename" ->
      """SELECT c_custkey, c_name AS customer_name, c_mktsegment AS segment
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_add_columns" ->
      """SELECT c_custkey, c_acctbal, 'crm' AS load_source,
        |  CASE WHEN c_acctbal < 0.0 THEN 'negative'
        |       WHEN c_acctbal < 5000.0 THEN 'low'
        |       ELSE 'high' END AS bal_band
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_set_nulls" ->
      """SELECT c_custkey,
        |  COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'UNKNOWN') AS segment
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_replace" ->
      """SELECT l_orderkey, l_linenumber,
        |  CASE WHEN l_returnflag = 'A' THEN 'ACCEPTED' ELSE l_returnflag END
        |    AS l_returnflag,
        |  regexp_replace(l_linestatus, '^RA', 'RETURN-', 'g') AS l_linestatus
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_to_numeric" ->
      """SELECT p_partkey,
        |  CAST(FLOOR(CAST(regexp_replace('id#' || CAST(p_partkey AS VARCHAR) || '-v',
        |    '[^0-9.]+', '', 'g') AS DOUBLE)) AS BIGINT) AS clean_key,
        |  CAST(0 AS BIGINT) AS clean_blank
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_join_inner" ->
      """SELECT c_mktsegment,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS total_price,
        |  COUNT(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    // ground truth is the PLAIN join: salting must not change the result
    "q_join_salted" ->
      """SELECT s_name,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS total_qty,
        |  COUNT(*) AS n_items
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_name ORDER BY s_name""".stripMargin,
    "q_join_left" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_urgent,
        |  CAST(SUM(CAST(COALESCE(o_totalprice, 0.0) AS DECIMAL(28,2))) AS DOUBLE)
        |    AS urgent_total
        |FROM customer LEFT JOIN
        |  (SELECT * FROM orders WHERE o_orderpriority = '1-URGENT') o
        |  ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q_join_outer" ->
      """SELECT COALESCE(cn.nationkey, sn.nationkey) AS nationkey,
        |  COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp,
        |  CASE WHEN cn.nationkey IS NULL THEN 'right_only'
        |       WHEN sn.nationkey IS NULL THEN 'left_only'
        |       ELSE 'both' END AS presence
        |FROM (SELECT c_nationkey AS nationkey, COUNT(*) AS n_cust
        |      FROM customer GROUP BY c_nationkey) cn
        |FULL OUTER JOIN
        |     (SELECT s_nationkey AS nationkey, COUNT(*) AS n_supp
        |      FROM supplier GROUP BY s_nationkey) sn
        |USING (nationkey)
        |ORDER BY nationkey""".stripMargin,
    "q_join_cartesian" ->
      """SELECT a.r_regionkey, a.r_name,
        |  b.r_regionkey AS r2_regionkey, b.r_name AS r2_name
        |FROM region a CROSS JOIN region b
        |ORDER BY a.r_regionkey, b.r_regionkey""".stripMargin,
    "q_union" ->
      """SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'F'
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_orderkey""".stripMargin,
    "q_unpivot" ->
      """SELECT p_partkey, 'p_brand' AS attribute, p_brand AS value FROM part
        |UNION ALL
        |SELECT p_partkey, 'p_type' AS attribute, p_type AS value FROM part
        |ORDER BY p_partkey, attribute""".stripMargin,
    "q_sort_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q_custom_sql" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
        |      AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "q_apply_fn_columns" ->
      """SELECT n_nationkey, n_name,
        |  -- initcap over lowercase
        |  list_aggregate(list_transform(string_split(lower(n_name), ' '),
        |    w -> upper(w[1]) || w[2:]), 'string_agg', ' ') AS pretty_name
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "q_read_write_roundtrip" ->
      """SELECT n_nationkey, n_name, n_regionkey FROM nation
        |ORDER BY n_nationkey""".stripMargin,
    "q_create_dataset" ->
      """SELECT * FROM (VALUES ('BULK','1'), ('DELTA','2'),
        |  ('NO LOAD','3'), ('REFRESH','4')) AS t(op_code, op_rank)
        |ORDER BY op_rank""".stripMargin,
    "q_window_agg" ->
      """SELECT o_orderkey, o_custkey, o_orderpriority, o_totalprice,
        |  price_rank, running_total
        |FROM (
        |  SELECT o_orderkey, o_custkey, o_orderpriority, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey) AS price_rank,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) OVER (
        |      PARTITION BY o_custkey ORDER BY o_orderkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |      AS running_total
        |  FROM orders)
        |WHERE price_rank <= 5
        |ORDER BY o_orderpriority, price_rank""".stripMargin,
    "q_set_ops" ->
      """SELECT * FROM (
        |  SELECT c_custkey, 'both' AS set_op FROM (
        |    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |    INTERSECT
        |    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |  UNION ALL
        |  SELECT c_custkey, 'building_only' AS set_op FROM (
        |    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |    EXCEPT
        |    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'))
        |ORDER BY set_op, c_custkey""".stripMargin,
    "q_nk_collapse" ->
      """SELECT l_quantity,
        |  CAST(l_orderkey AS VARCHAR) || '_' || CAST(l_linenumber AS VARCHAR)
        |    AS nk_lineitem
        |FROM lineitem ORDER BY nk_lineitem""".stripMargin)
}
