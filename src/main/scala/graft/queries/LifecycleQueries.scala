package graft.queries

import graft._
import graft.catalog.Layer
import graft.pipeline.{Pipeline, PipelineOp, Stage}
import graft.warehouse._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Queries exercising the warehouse-lifecycle operators (SURVEY.md §2.6,
  * §2.7): date/audit dimension generators, SK assignment, dimension/fact
  * bulk loads, MDM, truncate, and the full E/T/L/S pipeline.
  */
object LifecycleQueries {
  import Q._

  private def mdmMapping(dfl: DataFlow): Unit =
    dfl.createDataset("mapping", Map(
      "n_name" -> Seq("NATION_3", "NATION_7", "NATION_99"),
      "region_name" -> Seq("EU-OVERRIDE", "", "GHOST")))

  private def mdmData(dfl: DataFlow): Unit = {
    src(dfl, "nation")
    src(dfl, "region")
    dfl.renameColumns("region", Map("r_regionkey" -> "n_regionkey"))
    dfl.join(("nation", "region"), "nation_r",
      joinCols = Seq("n_regionkey"), how = "inner",
      keepCols = Seq("n_nationkey", "n_name", "r_name"),
      broadcastRight = true)
    dfl.renameColumns("nation_r", Map("r_name" -> "region_name"))
    mdmMapping(dfl)
    dfl.mapMasterData("nation_r", "mapping",
      joinCols = Seq("n_name"),
      masterDataCols = Seq("region_name"),
      autoPopMappingCols = Seq("region_name"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.7 transformDMDate: calendar dimension from the conf date range
    "q_dm_date" -> { (s, _) =>
      DmDate.build(s, "1995-01-01", "1996-12-31").orderBy("date_key")
    },

    // §2.7 transformDMAudit: load-ops × DQ-scores cartesian
    "q_dm_audit" -> { (s, _) =>
      DmAudit.build(s).orderBy("load_operation", "dq_score")
    },

    // §2.7 bulkLoadDimension: deterministic SKs + default rows + SK/NK map
    "q_bulk_load_dimension" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir, "q_bulk_load_dimension")
      val dfl = DataFlow(s, "q_bulk_load_dimension")
      src(dfl, "customer")
      dfl.dropColumns("customer",
        colsToKeep = Seq("c_custkey", "c_name", "c_mktsegment"),
        dropAuditCols = true)
      dfl.prepForLoad("customer", "dm_customer")
      StageLoad.bulkLoadDimension(s, c, DimensionSpec(
        "dm_customer", Seq("c_custkey"), Seq("c_name", "c_mktsegment")))
        .orderBy("sk_customer")
    },

    // §2.7 bulkLoadFact: NK→SK broadcast joins with -1 defaulting
    "q_bulk_load_fact" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir, "q_bulk_load_fact")
      val dfl = DataFlow(s, "q_bulk_load_fact")
      src(dfl, "supplier")
      dfl.filter("supplier", Map("s_acctbal" -> FilterSpec.Gt(0.0)))
      dfl.dropColumns("supplier", colsToKeep = Seq("s_suppkey", "s_name"),
        dropAuditCols = true)
      dfl.prepForLoad("supplier", "dm_supplier")
      src(dfl, "part")
      dfl.filter("part", Map("p_size" -> FilterSpec.Gt(10)))
      dfl.dropColumns("part", colsToKeep = Seq("p_partkey", "p_name"),
        dropAuditCols = true)
      dfl.prepForLoad("part", "dm_part")
      src(dfl, "lineitem")
      dfl.dropColumns("lineitem", colsToKeep =
        Seq("l_orderkey", "l_linenumber", "l_suppkey", "l_partkey",
          "l_quantity"), dropAuditCols = true)
      dfl.prepForLoad("lineitem", "ft_lineitem")
      StageLoad.bulkLoadDimension(s, c, DimensionSpec(
        "dm_supplier", Seq("s_suppkey"), Seq("s_name")))
      StageLoad.bulkLoadDimension(s, c, DimensionSpec(
        "dm_part", Seq("p_partkey"), Seq("p_name")))
      StageLoad.bulkLoadFact(s, c, FactSpec("ft_lineitem", Seq(
        FkMapping("l_suppkey", "dm_supplier", "s_suppkey"),
        FkMapping("l_partkey", "dm_part", "p_partkey"))))
        .select("l_orderkey", "l_linenumber", "sk_supplier", "sk_part",
          "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // §2.7 deltaLoadDimension (the reference's declared-but-raising
    // surface): SK-preserving delta application, run TWICE — the second,
    // identical delta must keep every SK and audit stamp (idempotence
    // proves SKs are preserved, not re-derived from scratch)
    "q_delta_load_dimension" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir, "q_delta_load_dimension")
      val dfl = DataFlow(s, "q_delta_load_dimension")
      val base = src(dfl, "customer")
        .select("c_custkey", "c_name", "c_acctbal")
      // bulk state: some rows absent (future INSERTs), some attributes
      // drifted (future UPDATEs)
      val previous = base.filter(col("c_custkey") % 11 =!= 3)
        .withColumn("c_acctbal",
          when(col("c_custkey") % 5 === 0, col("c_acctbal") * 2)
            .otherwise(col("c_acctbal")))
      // fresh extract: true attribute values; some rows gone (DELETEs)
      val current = base.filter(col("c_custkey") % 7 =!= 2)
      val spec = DimensionSpec(
        "dm_customer", Seq("c_custkey"), Seq("c_name", "c_acctbal"))
      dfl.createDataset("prev", previous)
      dfl.prepForLoad("prev", "dm_customer")
      StageLoad.bulkLoadDimension(s, c, spec)
      dfl.createDataset("cur", current)
      dfl.prepForLoad("cur", "dm_customer")
      StageLoad.deltaLoadDimension(s, c, spec, Some("2024-06-01 00:00:00"))
      val dim = StageLoad.deltaLoadDimension(
        s, c, spec, Some("2024-07-01 00:00:00"))
      dim.select(col("sk_customer"), col("c_custkey"), col("c_name"),
        col("c_acctbal"),
        date_format(col(StageLoad.AuditDeltaDate), "yyyy-MM-dd HH:mm:ss")
          .as("delta_date"),
        col(StageLoad.AuditLoadOp).as("load_op"))
        .orderBy("sk_customer")
    },

    // §2.7 deltaLoadFact: insert-only delta appended to BSE with the
    // same NK→SK resolution as the bulk path
    "q_delta_load_fact" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir, "q_delta_load_fact")
      val dfl = DataFlow(s, "q_delta_load_fact")
      src(dfl, "supplier")
      dfl.dropColumns("supplier", colsToKeep = Seq("s_suppkey", "s_name"),
        dropAuditCols = true)
      dfl.prepForLoad("supplier", "dm_supplier")
      StageLoad.bulkLoadDimension(s, c, DimensionSpec(
        "dm_supplier", Seq("s_suppkey"), Seq("s_name")))
      val li = src(dfl, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_suppkey", "l_quantity")
      dfl.createDataset("li_bulk", li.filter(col("l_orderkey") % 2 === 0))
      dfl.prepForLoad("li_bulk", "ft_lineitem")
      val spec = FactSpec("ft_lineitem",
        Seq(FkMapping("l_suppkey", "dm_supplier", "s_suppkey")))
      StageLoad.bulkLoadFact(s, c, spec)
      dfl.createDataset("li_delta", li.filter(col("l_orderkey") % 2 === 1))
      dfl.prepForLoad("li_delta", "ft_lineitem")
      StageLoad.deltaLoadFact(s, c, spec)
        .select("l_orderkey", "l_linenumber", "sk_supplier", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // §2.7 SCD2 (type-2) dimension: attribute changes close the current
    // version and open a new one with a fresh SK; vanished members
    // soft-close. Two snapshot applications — updates, inserts, deletes
    // and untouched history all present in the result
    "q_scd2_dimension" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir, "q_scd2_dimension")
      val dfl = DataFlow(s, "q_scd2_dimension")
      val base = src(dfl, "customer")
        .select("c_custkey", "c_name", "c_acctbal")
      // first snapshot: some members absent (future INSERTs), some
      // attributes drifted (future UPDATEs when the truth arrives)
      val snap1 = base.filter(col("c_custkey") % 11 =!= 3)
        .withColumn("c_acctbal",
          when(col("c_custkey") % 5 === 0, col("c_acctbal") * 2)
            .otherwise(col("c_acctbal")))
      // second snapshot: true values; some members gone (soft DELETEs)
      val snap2 = base.filter(col("c_custkey") % 7 =!= 2)
      val spec = DimensionSpec(
        "dm_customer", Seq("c_custkey"), Seq("c_name", "c_acctbal"))
      dfl.createDataset("s1", snap1)
      dfl.prepForLoad("s1", "dm_customer")
      Scd2Load.load(s, c, spec, "2024-06-01 00:00:00", initial = true)
      dfl.createDataset("s2", snap2)
      dfl.prepForLoad("s2", "dm_customer")
      val dim = Scd2Load.load(s, c, spec, "2024-07-01 00:00:00")
      dim.select(col("sk_customer"), col("c_custkey"), col("c_name"),
        col("c_acctbal"),
        date_format(col(Scd2Load.ValidFrom), "yyyy-MM-dd HH:mm:ss")
          .as("valid_from"),
        date_format(col(Scd2Load.ValidTo), "yyyy-MM-dd HH:mm:ss")
          .as("valid_to"),
        col(Scd2Load.IsCurrent).as("is_current"))
        .orderBy("c_custkey", "sk_customer")
    },

    // SCD2 × as-of composition: each fact row joins the dimension VERSION
    // that was valid at the fact's own time — the point of type-2
    // history. One as-of join on (member, valid_from) + a row-local
    // valid_to check (a member's versions partition its timeline, so the
    // latest valid_from <= t is the valid version unless t outlives it)
    "q_scd2_fact_asof" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir, "q_scd2_fact_asof")
      val dfl = DataFlow(s, "q_scd2_fact_asof")
      val base = src(dfl, "customer")
        .select("c_custkey", "c_name", "c_acctbal")
      val snap1 = base.filter(col("c_custkey") % 11 =!= 3)
        .withColumn("c_acctbal",
          when(col("c_custkey") % 5 === 0, col("c_acctbal") * 2)
            .otherwise(col("c_acctbal")))
      val snap2 = base.filter(col("c_custkey") % 7 =!= 2)
      val spec = DimensionSpec(
        "dm_customer", Seq("c_custkey"), Seq("c_name", "c_acctbal"))
      dfl.createDataset("s1", snap1)
      dfl.prepForLoad("s1", "dm_customer")
      Scd2Load.load(s, c, spec, "1996-01-01 00:00:00", initial = true)
      dfl.createDataset("s2", snap2)
      dfl.prepForLoad("s2", "dm_customer")
      val dim = Scd2Load.load(s, c, spec, "1997-01-01 00:00:00")
      val versions = dim.select(
        col("c_custkey").as("o_custkey"),
        unix_micros(col(Scd2Load.ValidFrom)).as("vf_us"),
        col("sk_customer").as("v_sk"),
        unix_micros(col(Scd2Load.ValidTo)).as("v_vt_us"))
      val facts = src(dfl, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          // parquet reads the date as TIMESTAMP_NTZ; the UTC session
          // makes the cast to TIMESTAMP an identity
          unix_micros(col("o_orderdate").cast("timestamp")).as("ts_us"))
      graft.operators.TemporalJoins.asofJoin(
        facts, versions, on = Seq("o_custkey"),
        leftTs = "ts_us", rightTs = "vf_us",
        rightCols = Seq("v_sk", "v_vt_us"))
        .withColumn("sk_customer",
          when(col("v_sk").isNull ||
            (col("v_vt_us").isNotNull && col("v_vt_us") <= col("ts_us")),
            -1L).otherwise(col("v_sk")))
        .select("o_orderkey", "o_custkey", "ts_us", "sk_customer")
        .orderBy("o_orderkey")
    },

    // §2.3 delta-extract classification (the reference's dormant design):
    // INSERT/UPDATE/DELETE/UNCHANGED via one null-safe full-outer NK join
    "q_delta_classify" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_delta_classify")
      val cust = src(dfl, "customer")
      // simulate a previous staged copy: some rows missing (→ INSERT),
      // some with drifted attributes (→ UPDATE); and a current extract
      // with some rows gone (→ DELETE)
      val previous = cust.filter(col("c_custkey") % 11 =!= 3)
        .withColumn("c_acctbal",
          when(col("c_custkey") % 5 === 0, col("c_acctbal") * 2)
            .otherwise(col("c_acctbal")))
      val current = cust.filter(col("c_custkey") % 13 =!= 1)
      DeltaLoad.classify(current, previous, Seq("c_custkey"))
        .select("c_custkey", "c_acctbal", DeltaLoad.OpCol)
        .orderBy("c_custkey")
    },

    // §2.1 delta extract (the reference's commented high-water-mark
    // design, stageExtract.py:95-228): bulk-extract nation into EXT,
    // mutate the source (drops, comment edits, new keys), run
    // StageExtract.deltaExtract, and emit BOTH the delta slices and the
    // resulting staged EXT state with their audit verdicts — bulk dates
    // surface as a presence flag (the timestamps are wall-clock)
    "q_delta_extract" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir, "q_delta_extract")
      val dfl = DataFlow(s, "q_delta_extract")
      val nat = src(dfl, "nation")
      val srcStore = graft.io.ParquetDatastore(s"${c.warehousePath}/mut_src")
      srcStore.write(s, nat, "nation")
      val c2 = c.copy(srcSystems = Map("MUT" -> srcStore))
      graft.warehouse.StageExtract.bulkExtract(s, c2, "MUT", "nation")
      // v2 of the source: keys %7==3 deleted, names edited on %5==1
      // survivors, +100 clones of %6==0 inserted
      val v2 = nat.where(col("n_nationkey") % 7 =!= 3)
        .withColumn("n_name",
          when(col("n_nationkey") % 5 === 1,
            concat(lit("v2 "), col("n_name")))
            .otherwise(col("n_name")))
        .unionByName(nat.where(col("n_nationkey") % 6 === 0)
          .select((col("n_nationkey") + 100).as("n_nationkey"),
            concat(col("n_name"), lit("_NEW")).as("n_name"),
            col("n_regionkey")))
      srcStore.write(s, v2, "nation")
      val slices = graft.warehouse.StageExtract.deltaExtract(
        s, c2, "MUT", "nation", Seq("n_nationkey"),
        deltaLoadDate = Some("2026-01-01 00:00:00"))
      val staged = s.read.parquet(c2.tablePath(Layer.EXT, "nation"))
      def shape(df: DataFrame, kind: String,
          opCol: org.apache.spark.sql.Column) = df.select(
        lit(kind).as("kind"), col("n_nationkey"), opCol.as("delta_op"),
        col("n_name"), col("n_regionkey"),
        col(Audit.BulkLoadDate).isNotNull.as("has_bulk_date"),
        col(Audit.LatestLoadOperation).as("audit_op"))
      shape(slices, "DELTA", col(DeltaLoad.OpCol))
        .unionByName(shape(staged, "STAGED", lit(null).cast("string")))
        .orderBy("kind", "n_nationkey")
    },

    // §2.7 mapMasterData: outer join + indicator + auto-populate
    "q_mdm" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_mdm")
      mdmData(dfl)
      dfl.get("nation_r")
        .select("n_nationkey", "n_name", "region_name")
        .orderBy("n_nationkey")
    },

    // §2.4 MDM write-back: group-by-all-columns occurrence counts
    "q_mdm_writeback" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_mdm_writeback")
      mdmData(dfl)
      dfl.get("nation_r_writeback").orderBy(desc("count"), asc("n_name"))
    },

    // §2.7 MDM alert path: rows with no mapping row (dfl_mdm.py:196-204)
    "q_mdm_unmapped" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_mdm_unmapped")
      mdmData(dfl)
      dfl.get("nation_r_unmapped")
        .select("n_nationkey", "n_name", "region_name")
        .orderBy("n_nationkey")
    },

    // §2.1 CSV source: stringly ingestion contract (dtype=str,
    // na_filter=False parity) through a real CsvDatastore round trip
    "q_csv_source" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir, "q_csv_source")
      val csv = graft.io.CsvDatastore(s"${c.warehousePath}/csv_src")
      val dfl = DataFlow(s, "q_csv_source")
      src(dfl, "nation")
      csv.write(s, dfl.get("nation"), "nation")
      val c2 = c.copy(srcSystems = Map("CSV" -> csv))
      val dfl2 = new DataFlow(s, "q_csv_source_read", c2)
      dfl2.getDataFromSrc("nation", "CSV")
      dfl2.dropColumns("nation", dropAuditCols = true)
      // every CSV column arrives as string; numeric cleanup is explicit
      dfl2.toNumeric("nation", Seq("n_nationkey"), Seq("key_num"))
      dfl2.getColumns("nation", Seq("key_num", "n_name", "n_regionkey"))
        .orderBy("key_num")
    },

    // §2.1 JSONL source: same stringly contract as CSV through a real
    // JsonDatastore round trip (extension — the modern interchange
    // sibling of the reference's CSV front door)
    "q_json_source" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir, "q_json_source")
      val js = graft.io.JsonDatastore(s"${c.warehousePath}/json_src")
      val dfl = DataFlow(s, "q_json_source")
      src(dfl, "nation")
      js.write(s, dfl.get("nation"), "nation")
      val c2 = c.copy(srcSystems = Map("JSONL" -> js))
      val dfl2 = new DataFlow(s, "q_json_source_read", c2)
      dfl2.getDataFromSrc("nation", "JSONL")
      dfl2.dropColumns("nation", dropAuditCols = true)
      dfl2.toNumeric("nation", Seq("n_nationkey"), Seq("key_num"))
      dfl2.getColumns("nation", Seq("key_num", "n_name", "n_regionkey"))
        .orderBy("key_num")
    },

    // §2.1 ORC source: typed columnar round trip through a real
    // OrcDatastore (extension — Hive-ecosystem interchange)
    "q_orc_source" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir, "q_orc_source")
      val orc = graft.io.OrcDatastore(s"${c.warehousePath}/orc_src")
      val dfl = DataFlow(s, "q_orc_source")
      src(dfl, "nation")
      dfl.dropColumns("nation", dropAuditCols = true)
      orc.write(s, dfl.get("nation"), "nation")
      val c2 = c.copy(srcSystems = Map("ORC" -> orc))
      val dfl2 = new DataFlow(s, "q_orc_source_read", c2)
      dfl2.getDataFromSrc("nation", "ORC")
      dfl2.dropColumns("nation", dropAuditCols = true)
      dfl2.getColumns("nation", Seq("n_nationkey", "n_name", "n_regionkey"))
        .orderBy("n_nationkey")
    },

    // §2.1 Avro source: typed interchange round trip through a real
    // AvroDatastore (extension — built on the bundled avro-core jars,
    // io/Avro.scala: distributed per-file decode, per-partition
    // container write; no spark-avro connector in this deployment)
    "q_avro_source" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir, "q_avro_source")
      val avro = graft.io.AvroDatastore(s"${c.warehousePath}/avro_src")
      val dfl = DataFlow(s, "q_avro_source")
      src(dfl, "nation")
      dfl.dropColumns("nation", dropAuditCols = true)
      avro.write(s, dfl.get("nation"), "nation")
      val c2 = c.copy(srcSystems = Map("AVRO" -> avro))
      val dfl2 = new DataFlow(s, "q_avro_source_read", c2)
      dfl2.getDataFromSrc("nation", "AVRO")
      dfl2.dropColumns("nation", dropAuditCols = true)
      dfl2.getColumns("nation", Seq("n_nationkey", "n_name", "n_regionkey"))
        .orderBy("n_nationkey")
    },

    // §2.1 JDBC source: the reference's Postgres/SQLite front door
    // (betl/io/DatastoreClass_postgres.py:8-85, dbIO.py:9-21) through
    // embedded Derby — write nation into the DB, then read it back
    // through a PARTITIONED JdbcDatastore read (min/max bounds probe +
    // 4-way split, the shape that parallelises a big source table
    // across executors instead of one connection)
    "q_jdbc_source" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir, "q_jdbc_source")
      new java.io.File(c.warehousePath).mkdirs()
      val jdbc = graft.io.JdbcDatastore(
        s"jdbc:derby:${c.warehousePath}/derby_src;create=true",
        partitionColumn = Some("n_nationkey"), numPartitions = 4)
      val dfl = DataFlow(s, "q_jdbc_source")
      src(dfl, "nation")
      jdbc.write(s, dfl.get("nation"), "nation")
      val c2 = c.copy(srcSystems = Map("JDBC" -> jdbc))
      val dfl2 = new DataFlow(s, "q_jdbc_source_read", c2)
      dfl2.getDataFromSrc("nation", "JDBC")
      dfl2.dropColumns("nation", dropAuditCols = true)
      dfl2.getColumns("nation", Seq("n_nationkey", "n_name", "n_regionkey"))
        .orderBy("n_nationkey")
    },

    // §2.7 + §2.1 composed: bulk dimension load with a JDBC TRG sink —
    // the reference's "BSE always lands in the target database"
    // contract (dfl_io.py:81-94) run for real against embedded Derby
    // (catalog DDL, identity SK column, index bracket), then the
    // dimension read back FROM THE DATABASE and oracle-checked. A
    // wrong DDL type map, lost index-bracket statement, or truncated
    // sync would all surface here as a hash mismatch.
    "q_jdbc_warehouse" -> { (s, dir) =>
      implicit val c0: GraftConf = conf(dir, "q_jdbc_warehouse")
      new java.io.File(c0.warehousePath).mkdirs()
      val jdbc = graft.io.JdbcDatastore(
        s"jdbc:derby:${c0.warehousePath}/derby_trg;create=true")
      implicit val c: GraftConf = c0.copy(trgSink = Some(jdbc))
      val dfl = new DataFlow(s, "q_jdbc_warehouse", c)
      src(dfl, "customer")
      dfl.dropColumns("customer",
        colsToKeep = Seq("c_custkey", "c_name", "c_mktsegment"),
        dropAuditCols = true)
      dfl.prepForLoad("customer", "dm_customer")
      StageLoad.dropTrgSinkIndexes(c)
      StageLoad.bulkLoadDimension(s, c, DimensionSpec(
        "dm_customer", Seq("c_custkey"), Seq("c_name", "c_mktsegment")))
      jdbc.read(s, "dm_customer")
        .select(col("sk_customer").cast("long").as("sk_customer"),
          col("c_custkey").cast("long").as("c_custkey"),
          col("c_name"), col("c_mktsegment"))
        .orderBy("sk_customer")
    },

    // small-files compaction: fragment a layer table into 16 files,
    // compact to 1, and prove the data is untouched (the maintenance
    // verb the streaming upsert sink needs; staging-swap rewrite)
    "q_compact" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir, "q_compact")
      val dfl = DataFlow(s, "q_compact")
      src(dfl, "nation")
      dfl.dropColumns("nation", dropAuditCols = true)
      dfl.get("nation").repartition(16).write.mode("overwrite")
        .parquet(c.tablePath(Layer.EXT, "nation_frag"))
      val (before, after) =
        Admin.compact(s, c, Layer.EXT, "nation_frag")
      require(before == 16L && after == 1L,
        s"compact: expected 16 -> 1 files, got $before -> $after")
      s.read.parquet(c.tablePath(Layer.EXT, "nation_frag"))
        .select("n_nationkey", "n_name", "n_regionkey")
        .orderBy("n_nationkey")
    },

    // Z-ORDER layout optimization: cluster a lineitem copy by
    // (l_partkey, l_suppkey) and prove BOTH halves of data skipping —
    // values identical to the layout-oblivious oracle, AND the 2-D
    // range predicate now touches a fraction of the files (parquet
    // footer min/max pruning; input_file_name only surfaces files
    // whose row groups survived pushdown). The layout is the operator;
    // the pruning is stock Spark+parquet.
    "q_zorder" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir, "q_zorder")
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
          "l_returnflag")
      val path = c.tablePath(Layer.BSE, "bse_lineitem_z")
      // round-robin 16 files = the worst layout: every file spans the
      // full key domain, so stats prune nothing before clustering
      li.repartition(16).write.mode("overwrite").parquet(path)
      Admin.optimizeLayout(s, c, Layer.BSE, "bse_lineitem_z",
        Seq("l_partkey", "l_suppkey"),
        targetBytes = math.max(1L,
          graft.io.ParquetUtil.dirSizeBytes(s, path) / 16))
      val b = li.agg(
        min("l_partkey"), max("l_partkey"),
        min("l_suppkey"), max("l_suppkey")).collect()(0)
      val pCut = b.getLong(0) + (b.getLong(1) - b.getLong(0)) / 8
      val sCut = b.getLong(2) + (b.getLong(3) - b.getLong(2)) / 4
      val clustered = s.read.parquet(path)
      val pred =
        col("l_partkey") <= pCut && col("l_suppkey") <= sCut
      val totalFiles = clustered
        .select(input_file_name()).distinct().count()
      val filesRead = clustered.where(pred)
        .select(input_file_name()).distinct().count()
      require(filesRead * 3 <= totalFiles,
        s"zorder skipping: predicate read $filesRead of $totalFiles files")
      clustered.where(pred)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_rows"),
          dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("l_returnflag")
    },

    // §2.5 dev-mode row cap applied at the source (limitdata)
    "q_limitdata" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir).copy(dataLimitRows = Some(50))
      val dfl = DataFlow(s, "q_limitdata")
      dfl.getDataFromSrc("orders", Src)
      dfl.get("orders").agg(count(lit(1)).as("n_rows"))
    },

    // §2.1 truncate: schema-preserving empty overwrite
    "q_truncate" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir, "q_truncate")
      val dfl = DataFlow(s, "q_truncate")
      src(dfl, "nation")
      dfl.write("nation", "nation_trunc", Layer.EXT)
      dfl.truncate("nation_trunc", Layer.EXT)
      dfl.read("nation_trunc", Layer.EXT, Some("after"))
      dfl.get("after").agg(count(lit(1)).as("n_rows"))
    },

    // §3.1 the full pipeline: E → T → L(dim→fact) → S over a real DAG
    "q_pipeline_e2e" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir, "q_pipeline_e2e")
      val ops = Seq(
        PipelineOp("extract_customer", Stage.Extract, (sp, cf) => {
          val dfl = new DataFlow(sp, "extract_customer", cf)
          dfl.getDataFromSrc("customer", Src)
          dfl.write("customer", "customer", Layer.EXT)
        }),
        PipelineOp("extract_orders", Stage.Extract, (sp, cf) => {
          val dfl = new DataFlow(sp, "extract_orders", cf)
          dfl.getDataFromSrc("orders", Src)
          dfl.write("orders", "orders", Layer.EXT)
        }),
        PipelineOp("transform_dm_customer", Stage.Transform, (sp, cf) => {
          val dfl = new DataFlow(sp, "transform_dm_customer", cf)
          dfl.read("customer", Layer.EXT)
          dfl.dropColumns("customer",
            colsToKeep = Seq("c_custkey", "c_name", "c_mktsegment"),
            dropAuditCols = true)
          dfl.prepForLoad("customer", "dm_customer")
        }),
        PipelineOp("transform_ft_orders", Stage.Transform, (sp, cf) => {
          val dfl = new DataFlow(sp, "transform_ft_orders", cf)
          dfl.read("orders", Layer.EXT)
          dfl.dropColumns("orders",
            colsToKeep = Seq("o_orderkey", "o_custkey", "o_totalprice"),
            dropAuditCols = true)
          dfl.prepForLoad("orders", "ft_orders")
        }),
        PipelineOp("load_dm_customer", Stage.LoadDim, (sp, cf) =>
          StageLoad.bulkLoadDimension(sp, cf, DimensionSpec(
            "dm_customer", Seq("c_custkey"), Seq("c_name", "c_mktsegment")))),
        PipelineOp("load_ft_orders", Stage.LoadFact, (sp, cf) =>
          StageLoad.bulkLoadFact(sp, cf, FactSpec("ft_orders",
            Seq(FkMapping("o_custkey", "dm_customer", "c_custkey"))))),
        PipelineOp("summarise_sales", Stage.Summarise, (sp, cf) => {
          val dfl = new DataFlow(sp, "summarise_sales", cf)
          dfl.read("ft_orders", Layer.BSE)
          dfl.read("dm_customer", Layer.BSE)
          dfl.join(("ft_orders", "dm_customer"), "sales",
            joinCols = Seq("sk_customer"), broadcastRight = true)
          val su = dfl.get("sales").groupBy(
            col("c_mktsegment").as("segment"))
            .agg(dsum(col("o_totalprice"), 2).as("total_sales"),
              count(lit(1)).as("n_orders"))
          dfl.createDataset("su_sales_by_segment", su)
          dfl.write("su_sales_by_segment", "su_sales_by_segment", Layer.SUM)
        }))
      new Pipeline(c, ops, parallelism = 2).run(s)
      s.read.parquet(c.tablePath(Layer.SUM, "su_sales_by_segment"))
        .orderBy("segment")
    },

    // §2.7/§3.1 the DEFAULT pipeline: per-table extract fan-out with zero
    // bespoke extract code, audit-NK collapse on the fact, dm_audit FK
    // resolution, and default summarise prep
    "q_pipeline_default" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir, "q_pipeline_default")
      // events.parquet carries TIMESTAMP(NANOS): read as raw nanos so the
      // default extract fan-out can copy every table
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val extracts = StageExtract.defaultExtractOps(s, c, Src)
      val ops = extracts ++ Seq(
        PipelineOp("transform_dm_customer", Stage.Transform, (sp, cf) => {
          val dfl = new DataFlow(sp, "transform_dm_customer", cf)
          dfl.read("customer", Layer.EXT)
          dfl.dropColumns("customer",
            colsToKeep = Seq("c_custkey", "c_name", "c_mktsegment"),
            dropAuditCols = true)
          dfl.prepForLoad("customer", "dm_customer")
        }),
        PipelineOp("transform_dm_audit", Stage.Transform,
          (sp, cf) => DmAudit.load(sp, cf)),
        PipelineOp("transform_ft_orders", Stage.Transform, (sp, cf) => {
          val dfl = new DataFlow(sp, "transform_ft_orders", cf)
          dfl.read("orders", Layer.EXT)
          dfl.dropColumns("orders",
            colsToKeep = Seq("o_orderkey", "o_custkey", "o_totalprice"))
          dfl.collapseAuditNK("orders")
          dfl.prepForLoad("orders", "ft_orders")
        }),
        PipelineOp("load_dm_customer", Stage.LoadDim, (sp, cf) =>
          StageLoad.bulkLoadDimension(sp, cf, DimensionSpec(
            "dm_customer", Seq("c_custkey"), Seq("c_name", "c_mktsegment")))),
        PipelineOp("load_ft_orders", Stage.LoadFact, (sp, cf) =>
          StageLoad.bulkLoadFact(sp, cf, FactSpec("ft_orders",
            Seq(FkMapping("o_custkey", "dm_customer", "c_custkey"),
              FkMapping("nk_audit", "dm_audit", "nk_audit"))))),
        // prep runs in the stage BEFORE the summaries: ops within a stage
        // are concurrent, and the truncate must precede the rewrite
        PipelineOp("summarise_prep", Stage.LoadFact, (sp, cf) =>
          StageSummarise.defaultSummarisePrep(sp, cf)),
        PipelineOp("summarise_sales", Stage.Summarise, (sp, cf) => {
          val dfl = new DataFlow(sp, "summarise_sales", cf)
          dfl.read("ft_orders", Layer.BSE)
          dfl.read("dm_customer", Layer.BSE)
          dfl.join(("ft_orders", "dm_customer"), "sales",
            joinCols = Seq("sk_customer"), broadcastRight = true)
          val su = dfl.get("sales").groupBy(
            col("c_mktsegment").as("segment"))
            .agg(dsum(col("o_totalprice"), 2).as("total_sales"),
              count(lit(1)).as("n_orders"),
              min(col("sk_audit")).as("sk_audit_min"),
              max(col("sk_audit")).as("sk_audit_max"))
          dfl.createDataset("su_sales_by_segment", su)
          dfl.write("su_sales_by_segment", "su_sales_by_segment", Layer.SUM)
        }))
      new Pipeline(c, ops, parallelism = 4).run(s)
      s.read.parquet(c.tablePath(Layer.SUM, "su_sales_by_segment"))
        .orderBy("segment")
    },

    // §3 declarative mode: catalog from a checked-in schema file, strict
    // write validation, file-driven default dimension rows, extract via
    // the default fan-out limited to the declared EXT tables
    "q_pipeline_declarative" -> { (s, dir) =>
      val base = GraftConfIO.fromFile("/root/repo/conf/declarative_pipeline.json")
      implicit val c: GraftConf = base.copy(
        warehousePath = conf(dir, "q_pipeline_declarative").warehousePath,
        srcSystems = Map(Src -> graft.io.ParquetDatastore(dir)))
      val extTables = c.catalog.tablesIn(Layer.EXT).map(_.name)
      val ops = extTables.map { t =>
        PipelineOp(s"extract_$t", Stage.Extract,
          (sp, cf) => StageExtract.bulkExtract(sp, cf, Src, t))
      } ++ Seq(
        PipelineOp("transform_dm_customer", Stage.Transform, (sp, cf) => {
          val dfl = new DataFlow(sp, "transform_dm_customer", cf)
          dfl.read("customer", Layer.EXT)
          dfl.dropColumns("customer",
            colsToKeep = Seq("c_custkey", "c_name", "c_mktsegment"),
            dropAuditCols = true)
          dfl.prepForLoad("customer", "dm_customer")
        }),
        PipelineOp("transform_ft_orders", Stage.Transform, (sp, cf) => {
          val dfl = new DataFlow(sp, "transform_ft_orders", cf)
          dfl.read("orders", Layer.EXT)
          dfl.dropColumns("orders",
            colsToKeep = Seq("o_orderkey", "o_custkey", "o_totalprice"),
            dropAuditCols = true)
          dfl.prepForLoad("orders", "ft_orders")
        }),
        PipelineOp("load_dm_customer", Stage.LoadDim, (sp, cf) =>
          StageLoad.bulkLoadDimension(sp, cf, DimensionSpec(
            "dm_customer", Seq("c_custkey"), Seq("c_name", "c_mktsegment"),
            defaultRows = DefaultRow.fromJsonFile(
              "/root/repo/conf/default_rows_dm_customer.json")))),
        PipelineOp("load_ft_orders", Stage.LoadFact, (sp, cf) =>
          StageLoad.bulkLoadFact(sp, cf, FactSpec("ft_orders",
            Seq(FkMapping("o_custkey", "dm_customer", "c_custkey"))))),
        PipelineOp("summarise_sales", Stage.Summarise, (sp, cf) => {
          val dfl = new DataFlow(sp, "summarise_sales", cf)
          dfl.read("ft_orders", Layer.BSE)
          dfl.read("dm_customer", Layer.BSE)
          dfl.join(("ft_orders", "dm_customer"), "sales",
            joinCols = Seq("sk_customer"), broadcastRight = true)
          val su = dfl.get("sales").groupBy(
            col("c_mktsegment").as("segment"))
            .agg(dsum(col("o_totalprice"), 2).as("total_sales"),
              count(lit(1)).as("n_orders"))
          dfl.createDataset("su_sales_by_segment", su)
          dfl.write("su_sales_by_segment", "su_sales_by_segment", Layer.SUM)
        }))
      new Pipeline(c, ops, parallelism = 2).run(s)
      // output the dimension: shows SK assignment + the file-driven
      // default rows (the summary write above already exercised strict
      // SUM validation)
      s.read.parquet(c.tablePath(Layer.BSE, "dm_customer"))
        .orderBy("sk_customer")
    })

  private val mdmMappingSql =
    "(VALUES ('NATION_3','EU-OVERRIDE'), ('NATION_7',''), " +
      "('NATION_99','GHOST')) m(n_name, region_name)"

  val oracles: Map[String, String] = Map(
    "q_dm_date" ->
      """SELECT CAST(year(d)*10000 + month(d)*100 + day(d) AS INT) AS date_key,
        |  strftime(d, '%Y-%m-%d') AS cal_date_str,
        |  CAST(year(d) AS INT) AS cal_year,
        |  CAST(month(d) AS INT) AS cal_month,
        |  CAST(day(d) AS INT) AS cal_day,
        |  monthname(d) AS month_name,
        |  CAST(isodow(d) AS INT) AS day_of_week_iso,
        |  CAST(dayofweek(d) + 1 AS INT) AS day_of_week_us,
        |  CAST(dayofyear(d) AS INT) AS day_of_year,
        |  CAST(week(d) AS INT) AS week_of_year_iso
        |FROM generate_series(DATE '1995-01-01', DATE '1996-12-31',
        |  INTERVAL 1 DAY) t(d)
        |ORDER BY date_key""".stripMargin,
    "q_dm_audit" ->
      """SELECT op || '_' || CAST(sc AS VARCHAR) AS nk_audit,
        |  op AS load_operation, CAST(sc AS INT) AS dq_score
        |FROM (VALUES ('BULK'),('DELTA'),('NO LOAD'),('REFRESH')) o(op)
        |CROSS JOIN generate_series(1, 10) t(sc)
        |ORDER BY load_operation, dq_score""".stripMargin,
    "q_bulk_load_dimension" ->
      """SELECT * FROM (
        |  SELECT CAST(row_number() OVER (ORDER BY c_custkey) AS BIGINT)
        |      AS sk_customer, c_custkey, c_name, c_mktsegment
        |  FROM customer
        |  UNION ALL SELECT -1, NULL, 'MISSING', 'MISSING'
        |  UNION ALL SELECT -2, NULL, 'UNRECOGNISED', 'UNRECOGNISED')
        |ORDER BY sk_customer""".stripMargin,
    "q_bulk_load_fact" ->
      """SELECT l_orderkey, l_linenumber,
        |  COALESCE(sm.sk_supplier, -1) AS sk_supplier,
        |  COALESCE(pm.sk_part, -1) AS sk_part, l_quantity
        |FROM lineitem
        |LEFT JOIN (SELECT CAST(row_number() OVER (ORDER BY s_suppkey) AS BIGINT)
        |    AS sk_supplier, s_suppkey FROM supplier WHERE s_acctbal > 0.0) sm
        |  ON l_suppkey = sm.s_suppkey
        |LEFT JOIN (SELECT CAST(row_number() OVER (ORDER BY p_partkey) AS BIGINT)
        |    AS sk_part, p_partkey FROM part WHERE p_size > 10) pm
        |  ON l_partkey = pm.p_partkey
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_delta_load_dimension" ->
      """WITH base AS (SELECT c_custkey, c_name, c_acctbal FROM customer),
        |prev AS (SELECT c_custkey, c_name,
        |    CASE WHEN c_custkey % 5 = 0 THEN c_acctbal * 2
        |         ELSE c_acctbal END AS c_acctbal
        |  FROM base WHERE c_custkey % 11 <> 3),
        |cur AS (SELECT * FROM base WHERE c_custkey % 7 <> 2),
        |bulk AS (SELECT
        |    CAST(row_number() OVER (ORDER BY c_custkey) AS BIGINT)
        |      AS sk_customer,
        |    c_custkey, c_name, c_acctbal FROM prev),
        |kept AS (
        |  SELECT b.sk_customer, b.c_custkey, c.c_name, c.c_acctbal,
        |    CASE WHEN b.c_name <> c.c_name OR b.c_acctbal <> c.c_acctbal
        |      THEN '2024-06-01 00:00:00' END AS delta_date,
        |    CASE WHEN b.c_name <> c.c_name OR b.c_acctbal <> c.c_acctbal
        |      THEN 'DELTA_UPDATE' END AS load_op
        |  FROM bulk b JOIN cur c ON b.c_custkey = c.c_custkey),
        |ins AS (
        |  SELECT (SELECT max(sk_customer) FROM bulk)
        |      + CAST(row_number() OVER (ORDER BY c_custkey) AS BIGINT)
        |      AS sk_customer,
        |    c_custkey, c_name, c_acctbal,
        |    '2024-06-01 00:00:00' AS delta_date,
        |    'DELTA_INSERT' AS load_op
        |  FROM cur WHERE c_custkey NOT IN (SELECT c_custkey FROM prev)),
        |defs AS (SELECT * FROM (VALUES
        |  (CAST(-1 AS BIGINT), CAST(NULL AS BIGINT), 'MISSING',
        |    CAST(NULL AS DOUBLE), CAST(NULL AS VARCHAR),
        |    CAST(NULL AS VARCHAR)),
        |  (CAST(-2 AS BIGINT), CAST(NULL AS BIGINT), 'UNRECOGNISED',
        |    CAST(NULL AS DOUBLE), CAST(NULL AS VARCHAR),
        |    CAST(NULL AS VARCHAR)))
        |  AS t(sk_customer, c_custkey, c_name, c_acctbal, delta_date,
        |       load_op))
        |SELECT * FROM kept
        |UNION ALL SELECT * FROM ins
        |UNION ALL SELECT * FROM defs
        |ORDER BY sk_customer""".stripMargin,
    "q_scd2_dimension" ->
      """WITH base AS (SELECT c_custkey, c_name, c_acctbal FROM customer),
        |s1 AS (SELECT c_custkey, c_name,
        |    CASE WHEN c_custkey % 5 = 0 THEN c_acctbal * 2
        |         ELSE c_acctbal END AS c_acctbal
        |  FROM base WHERE c_custkey % 11 <> 3),
        |s2 AS (SELECT * FROM base WHERE c_custkey % 7 <> 2),
        |v1 AS (SELECT
        |    CAST(row_number() OVER (ORDER BY c_custkey) AS BIGINT) AS sk,
        |    c_custkey, c_name, c_acctbal FROM s1),
        |m AS (SELECT v.sk, v.c_custkey, v.c_name AS p_name,
        |    v.c_acctbal AS p_bal, s.c_name, s.c_acctbal
        |  FROM v1 v JOIN s2 s USING (c_custkey)),
        |unch AS (SELECT sk, c_custkey, c_name, c_acctbal FROM m
        |  WHERE p_name = c_name AND p_bal = c_acctbal),
        |updv AS (SELECT c_custkey, c_name, c_acctbal FROM m
        |  WHERE p_name <> c_name OR p_bal <> c_acctbal),
        |closedupd AS (SELECT sk, c_custkey, p_name AS c_name,
        |    p_bal AS c_acctbal FROM m
        |  WHERE p_name <> c_name OR p_bal <> c_acctbal),
        |closeddel AS (SELECT sk, c_custkey, c_name, c_acctbal FROM v1
        |  WHERE c_custkey NOT IN (SELECT c_custkey FROM s2)),
        |ins AS (SELECT c_custkey, c_name, c_acctbal FROM s2
        |  WHERE c_custkey NOT IN (SELECT c_custkey FROM s1)),
        |newv AS (SELECT (SELECT max(sk) FROM v1)
        |    + CAST(row_number() OVER (ORDER BY c_custkey) AS BIGINT) AS sk,
        |    c_custkey, c_name, c_acctbal
        |  FROM (SELECT * FROM updv UNION ALL SELECT * FROM ins))
        |SELECT sk AS sk_customer, c_custkey, c_name, c_acctbal,
        |    '2024-06-01 00:00:00' AS valid_from,
        |    CAST(NULL AS VARCHAR) AS valid_to, TRUE AS is_current
        |  FROM unch
        |UNION ALL SELECT sk, c_custkey, c_name, c_acctbal,
        |  '2024-06-01 00:00:00', '2024-07-01 00:00:00', FALSE
        |  FROM closedupd
        |UNION ALL SELECT sk, c_custkey, c_name, c_acctbal,
        |  '2024-06-01 00:00:00', '2024-07-01 00:00:00', FALSE
        |  FROM closeddel
        |UNION ALL SELECT sk, c_custkey, c_name, c_acctbal,
        |  '2024-07-01 00:00:00', NULL, TRUE
        |  FROM newv
        |ORDER BY c_custkey, sk_customer""".stripMargin,
    "q_scd2_fact_asof" ->
      """WITH base AS (SELECT c_custkey, c_name, c_acctbal FROM customer),
        |s1 AS (SELECT c_custkey, c_name,
        |    CASE WHEN c_custkey % 5 = 0 THEN c_acctbal * 2
        |         ELSE c_acctbal END AS c_acctbal
        |  FROM base WHERE c_custkey % 11 <> 3),
        |s2 AS (SELECT * FROM base WHERE c_custkey % 7 <> 2),
        |v1 AS (SELECT
        |    CAST(row_number() OVER (ORDER BY c_custkey) AS BIGINT) AS sk,
        |    c_custkey, c_name, c_acctbal FROM s1),
        |m AS (SELECT v.sk, v.c_custkey, v.c_name AS p_name,
        |    v.c_acctbal AS p_bal, s.c_name, s.c_acctbal
        |  FROM v1 v JOIN s2 s USING (c_custkey)),
        |updv AS (SELECT c_custkey, c_name, c_acctbal FROM m
        |  WHERE p_name <> c_name OR p_bal <> c_acctbal),
        |ins AS (SELECT c_custkey, c_name, c_acctbal FROM s2
        |  WHERE c_custkey NOT IN (SELECT c_custkey FROM s1)),
        |newv AS (SELECT (SELECT max(sk) FROM v1)
        |    + CAST(row_number() OVER (ORDER BY c_custkey) AS BIGINT) AS sk,
        |    c_custkey FROM (SELECT * FROM updv UNION ALL SELECT * FROM ins)),
        |dim AS (
        |  SELECT sk, c_custkey,
        |      TIMESTAMP '1996-01-01 00:00:00' AS valid_from,
        |      CASE WHEN c_custkey IN (SELECT c_custkey FROM updv)
        |             OR c_custkey NOT IN (SELECT c_custkey FROM s2)
        |           THEN TIMESTAMP '1997-01-01 00:00:00' END AS valid_to
        |    FROM v1
        |  UNION ALL
        |  SELECT sk, c_custkey, TIMESTAMP '1997-01-01 00:00:00',
        |      CAST(NULL AS TIMESTAMP)
        |    FROM newv)
        |SELECT o.o_orderkey, o.o_custkey, epoch_us(o.o_orderdate) AS ts_us,
        |  coalesce(d.sk, -1) AS sk_customer
        |FROM orders o LEFT JOIN dim d ON o.o_custkey = d.c_custkey
        |  AND o.o_orderdate >= d.valid_from
        |  AND (d.valid_to IS NULL OR o.o_orderdate < d.valid_to)
        |ORDER BY o_orderkey""".stripMargin,
    "q_delta_load_fact" ->
      """SELECT l_orderkey, l_linenumber,
        |  COALESCE(sm.sk_supplier, -1) AS sk_supplier, l_quantity
        |FROM lineitem
        |LEFT JOIN (SELECT
        |    CAST(row_number() OVER (ORDER BY s_suppkey) AS BIGINT)
        |      AS sk_supplier, s_suppkey FROM supplier) sm
        |  ON l_suppkey = sm.s_suppkey
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_mdm" ->
      s"""SELECT n_nationkey, n.n_name AS n_name,
        |  CASE WHEN m.region_name IS NULL OR m.region_name = ''
        |       THEN r.r_name ELSE m.region_name END AS region_name
        |FROM nation n
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |LEFT JOIN $mdmMappingSql ON n.n_name = m.n_name
        |ORDER BY n_nationkey""".stripMargin,
    "q_mdm_writeback" ->
      s"""WITH d AS (SELECT n_name, r_name FROM nation
        |           JOIN region ON n_regionkey = r_regionkey)
        |SELECT COALESCE(d.n_name, m.n_name) AS n_name,
        |  COALESCE(CASE WHEN m.region_name IS NULL OR m.region_name = ''
        |    THEN d.r_name ELSE m.region_name END, '') AS region_name,
        |  COUNT(*) AS "count"
        |FROM d FULL OUTER JOIN $mdmMappingSql ON d.n_name = m.n_name
        |GROUP BY 1, 2
        |ORDER BY "count" DESC, n_name""".stripMargin,
    "q_truncate" -> "SELECT CAST(0 AS BIGINT) AS n_rows",
    "q_mdm_unmapped" ->
      """SELECT n_nationkey, n.n_name AS n_name, r.r_name AS region_name
        |FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE n.n_name NOT IN ('NATION_3', 'NATION_7', 'NATION_99')
        |ORDER BY n_nationkey""".stripMargin,
    "q_csv_source" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS key_num, n_name,
        |  CAST(n_regionkey AS VARCHAR) AS n_regionkey
        |FROM nation ORDER BY key_num""".stripMargin,
    "q_json_source" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS key_num, n_name,
        |  CAST(n_regionkey AS VARCHAR) AS n_regionkey
        |FROM nation ORDER BY key_num""".stripMargin,
    "q_compact" ->
      """SELECT n_nationkey, n_name, n_regionkey
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    // layout-oblivious ground truth: the clustered rewrite must not
    // change values, only physical order (// is integer division,
    // matching Spark's long/long)
    "q_zorder" ->
      """WITH b AS (SELECT
        |    min(l_partkey) + (max(l_partkey) - min(l_partkey)) // 8
        |      AS pcut,
        |    min(l_suppkey) + (max(l_suppkey) - min(l_suppkey)) // 4
        |      AS scut
        |  FROM lineitem)
        |SELECT l_returnflag, count(*) AS n_rows,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE)
        |    AS sum_qty
        |FROM lineitem, b
        |WHERE l_partkey <= b.pcut AND l_suppkey <= b.scut
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_orc_source" ->
      """SELECT n_nationkey, n_name, n_regionkey
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "q_avro_source" ->
      """SELECT n_nationkey, n_name, n_regionkey
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "q_jdbc_source" ->
      """SELECT n_nationkey, n_name, n_regionkey
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "q_jdbc_warehouse" ->
      """SELECT * FROM (
        |  SELECT CAST(row_number() OVER (ORDER BY c_custkey) AS BIGINT)
        |      AS sk_customer, CAST(c_custkey AS BIGINT) AS c_custkey,
        |    c_name, c_mktsegment
        |  FROM customer
        |  UNION ALL SELECT -1, NULL, 'MISSING', 'MISSING'
        |  UNION ALL SELECT -2, NULL, 'UNRECOGNISED', 'UNRECOGNISED')
        |ORDER BY sk_customer""".stripMargin,
    "q_limitdata" -> "SELECT CAST(50 AS BIGINT) AS n_rows",
    "q_delta_classify" ->
      """WITH prev AS (
        |  SELECT c_custkey, c_name, c_nationkey,
        |    CASE WHEN c_custkey % 5 = 0 THEN c_acctbal * 2
        |         ELSE c_acctbal END AS c_acctbal, c_mktsegment
        |  FROM customer WHERE c_custkey % 11 <> 3),
        |cur AS (SELECT c_custkey, c_name, c_nationkey, c_acctbal,
        |    c_mktsegment FROM customer WHERE c_custkey % 13 <> 1)
        |SELECT COALESCE(cur.c_custkey, prev.c_custkey) AS c_custkey,
        |  CASE WHEN cur.c_custkey IS NOT NULL THEN cur.c_acctbal
        |       ELSE prev.c_acctbal END AS c_acctbal,
        |  CASE WHEN prev.c_custkey IS NULL THEN 'INSERT'
        |       WHEN cur.c_custkey IS NULL THEN 'DELETE'
        |       WHEN cur.c_name IS DISTINCT FROM prev.c_name
        |         OR cur.c_nationkey IS DISTINCT FROM prev.c_nationkey
        |         OR cur.c_acctbal IS DISTINCT FROM prev.c_acctbal
        |         OR cur.c_mktsegment IS DISTINCT FROM prev.c_mktsegment
        |         THEN 'UPDATE'
        |       ELSE 'UNCHANGED' END AS delta_op
        |FROM cur FULL OUTER JOIN prev ON cur.c_custkey = prev.c_custkey
        |ORDER BY c_custkey""".stripMargin,
    "q_delta_extract" ->
      """WITH v2 AS (
        |  SELECT n_nationkey,
        |    CASE WHEN n_nationkey % 5 = 1 THEN 'v2 ' || n_name
        |         ELSE n_name END AS n_name, n_regionkey
        |  FROM nation WHERE n_nationkey % 7 <> 3
        |  UNION ALL
        |  SELECT n_nationkey + 100, n_name || '_NEW', n_regionkey
        |  FROM nation WHERE n_nationkey % 6 = 0),
        |ins AS (SELECT 'DELTA' AS kind, n_nationkey,
        |    'INSERT' AS delta_op, n_name, n_regionkey,
        |    false AS has_bulk_date, 'INSERT' AS audit_op
        |  FROM v2
        |  WHERE n_nationkey NOT IN (SELECT n_nationkey FROM nation)),
        |del AS (SELECT 'DELTA', n_nationkey, 'DELETE', n_name,
        |    n_regionkey, true, 'DELETE'
        |  FROM nation WHERE n_nationkey % 7 = 3),
        |upd AS (SELECT 'DELTA', v2.n_nationkey, 'UPDATE', v2.n_name,
        |    v2.n_regionkey, true, 'UPDATE'
        |  FROM v2 JOIN nation n ON v2.n_nationkey = n.n_nationkey
        |  WHERE v2.n_name IS DISTINCT FROM n.n_name
        |    OR v2.n_regionkey IS DISTINCT FROM n.n_regionkey),
        |staged AS (SELECT 'STAGED' AS kind, v2.n_nationkey,
        |    CAST(NULL AS VARCHAR) AS delta_op, v2.n_name, v2.n_regionkey,
        |    v2.n_nationkey IN (SELECT n_nationkey FROM nation)
        |      AS has_bulk_date,
        |    CASE WHEN v2.n_nationkey NOT IN
        |           (SELECT n_nationkey FROM nation) THEN 'INSERT'
        |         WHEN EXISTS (SELECT 1 FROM nation n
        |           WHERE n.n_nationkey = v2.n_nationkey
        |             AND (v2.n_name IS DISTINCT FROM n.n_name
        |               OR v2.n_regionkey IS DISTINCT FROM n.n_regionkey))
        |           THEN 'UPDATE'
        |         ELSE 'BULK' END AS audit_op
        |  FROM v2)
        |SELECT * FROM (
        |  SELECT * FROM ins UNION ALL SELECT * FROM del
        |  UNION ALL SELECT * FROM upd UNION ALL SELECT * FROM staged)
        |ORDER BY kind, n_nationkey""".stripMargin,
    "q_pipeline_default" ->
      """WITH audit AS (
        |  SELECT op || '_' || CAST(sc AS VARCHAR) AS nk_audit
        |  FROM (VALUES ('BULK'),('DELTA'),('NO LOAD'),('REFRESH')) o(op)
        |  CROSS JOIN generate_series(1, 10) t(sc)),
        |ska AS (SELECT nk_audit,
        |  row_number() OVER (ORDER BY nk_audit) AS sk FROM audit)
        |SELECT c_mktsegment AS segment,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE)
        |    AS total_sales,
        |  COUNT(*) AS n_orders,
        |  (SELECT sk FROM ska WHERE nk_audit = 'BULK_10') AS sk_audit_min,
        |  (SELECT sk FROM ska WHERE nk_audit = 'BULK_10') AS sk_audit_max
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment
        |ORDER BY segment""".stripMargin,
    "q_pipeline_declarative" ->
      """SELECT * FROM (
        |  SELECT CAST(row_number() OVER (ORDER BY c_custkey) AS BIGINT)
        |      AS sk_customer, c_custkey, c_name, c_mktsegment
        |  FROM customer
        |  UNION ALL SELECT -1, NULL, '(missing customer)', 'MISSING'
        |  UNION ALL SELECT -2, NULL, 'UNRECOGNISED', 'UNRECOGNISED'
        |  UNION ALL SELECT -3, NULL, 'NOT APPLICABLE', 'N/A')
        |ORDER BY sk_customer""".stripMargin,
    "q_pipeline_e2e" ->
      """SELECT c_mktsegment AS segment,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE)
        |    AS total_sales,
        |  COUNT(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment
        |ORDER BY segment""".stripMargin)
}
