package graft

import graft.catalog._
import graft.io.{CsvDatastore, ParquetDatastore}
import graft.warehouse.DefaultRow
import org.apache.spark.sql.functions._

/** Declarative config, admin introspection, and datastore sinks. */
class AdminConfigSpec extends SparkSpec {
  import spark.implicits._

  test("CatalogIO round-trips names, types, roles, and FK targets") {
    val cat = new Catalog
    cat.register(TableDef("dm_x", Layer.BSE, Seq(
      ColumnDef("sk_x", org.apache.spark.sql.types.LongType,
        ColumnRole.SurrogateKey),
      ColumnDef("nk_x", role = ColumnRole.NaturalKey),
      ColumnDef("sk_y", org.apache.spark.sql.types.LongType,
        ColumnRole.ForeignKey, fkDimension = Some("dm_y")),
      ColumnDef("amount", org.apache.spark.sql.types.DoubleType))))
    val rt = CatalogIO.fromJson(CatalogIO.toJson(cat))
    val t = rt(Layer.BSE, "dm_x")
    assert(t.columnNames == Seq("sk_x", "nk_x", "sk_y", "amount"))
    assert(t.surrogateKey.map(_.name).contains("sk_x"))
    assert(t.foreignKeys.head.fkDimension.contains("dm_y"))
    assert(t.columns.last.dataType ==
      org.apache.spark.sql.types.DoubleType)
  }

  test("GraftConfIO loads the checked-in declarative config") {
    val c = GraftConfIO.fromFile("/root/repo/conf/declarative_pipeline.json")
    assert(c.strictSchema)
    assert(c.catalog.lookup(Layer.LOD, "dm_customer").isDefined)
    assert(c.catalog(Layer.EXT, "orders").columnNames
      .contains(Audit.SourceSystem))
    assert(c.srcSystems.contains("TESTDATA"))
  }

  test("strictSchema rejects writes to undeclared tables") {
    implicit val c: GraftConf = tmpConf().copy(strictSchema = true)
    val dfl = flow("strict")
    dfl.createDataset("t", Map("a" -> Seq("1")))
    val e = intercept[IllegalArgumentException] {
      dfl.write("t", "undeclared", Layer.EXT)
    }
    assert(e.getMessage.contains("not declared"))
  }

  test("DefaultRow.fromJsonFile parses sk, label, and value overrides") {
    val rows = DefaultRow.fromJsonFile(
      "/root/repo/conf/default_rows_dm_customer.json")
    assert(rows.map(_.sk) == Seq(-1L, -2L, -3L))
    assert(rows.head.values("c_name") == "(missing customer)")
    assert(rows(1).values.isEmpty)
  }

  test("Admin.readSrc derives EXT defs with audit columns from parquet") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    implicit val c: GraftConf = tmpConf().copy(
      srcSystems = Map("SRC" -> ParquetDatastore("/root/testdata/sf0.001")))
    val defs = Admin.readSrc(spark, c, "SRC")
    assert(defs.map(_.name).contains("customer"))
    val cust = c.catalog(Layer.EXT, "customer")
    assert(cust.columnNames.take(2) == Seq("c_custkey", "c_name"))
    assert(Audit.all.forall(cust.columnNames.contains))
    // readsrc-to-file round-trips through CatalogIO
    val f = java.nio.file.Files.createTempFile("schema", ".json").toString
    Admin.readSrcToFile(spark, c, "SRC", f)
    assert(CatalogIO.fromJsonFile(f).lookup(Layer.EXT, "orders").isDefined)
  }

  test("cleanTableName normalises spreadsheet-style titles") {
    assert(Admin.cleanTableName("My Table (v2) - FINAL") == "my_table_v2__final")
    assert(Admin.cleanTableName("orders") == "orders")
  }

  test("cleanTableName collisions fail fast instead of silently merging") {
    Admin.requireNoCleanNameCollisions(Seq("orders", "customer"))
    val ex = intercept[IllegalArgumentException] {
      Admin.requireNoCleanNameCollisions(Seq("My Table", "my_table", "other"))
    }
    assert(ex.getMessage.contains("My Table")
      && ex.getMessage.contains("my_table"))
  }

  test("scaffold config stays valid JSON for quote/backslash paths") {
    val base = java.nio.file.Files.createTempDirectory("scaffoldq")
    val dir = base.resolve("""we"ird\path""").toString
    Admin.scaffold(dir, "TESTWH")
    val json = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/conf/appConfig.json"))
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    assert(node.get("warehousePath").asText == s"$dir/warehouse")
    assert(node.get("srcSystems").get("SRC").get("dir").asText
      == s"$dir/src_data")
  }

  test("scaffold creates layers, conf skeleton and gitignore; re-run safe") {
    val dir = java.nio.file.Files.createTempDirectory("scaffold").toString
    Admin.scaffold(dir, "TESTWH")
    Layer.all.foreach(l =>
      assert(new java.io.File(s"$dir/warehouse/${l.id}").isDirectory, l.id))
    val confFile = new java.io.File(s"$dir/conf/appConfig.json")
    assert(confFile.isFile)
    val json = new String(java.nio.file.Files.readAllBytes(confFile.toPath))
    assert(json.contains("\"testwh\"") && json.contains("srcSystems"))
    // re-run leaves existing files alone
    java.nio.file.Files.write(confFile.toPath, "CUSTOM".getBytes)
    Admin.scaffold(dir, "TESTWH")
    assert(new String(java.nio.file.Files.readAllBytes(confFile.toPath))
      == "CUSTOM")
  }

  test("MDM unmapped rows append an alert block to _alerts.txt") {
    implicit val c: GraftConf = tmpConf()
    val data = Seq(("NATION_1", "x"), ("NATION_2", "y"))
      .toDF("n_name", "other")
    val mdm = Seq(("NATION_1", "EU")).toDF("n_name", "region_name")
    val res = graft.mdm.MasterData.mapMasterData(
      data, mdm, Seq("n_name"), Seq("region_name"))
    val n = graft.mdm.MasterData.alertUnmapped(c, res, "nations")
    assert(n == 1)
    val alerts = new String(java.nio.file.Files.readAllBytes(Alerts.path(c)))
    assert(alerts.contains("1 unmapped") && alerts.contains("nations")
      && alerts.contains("NATION_2"))
    // no unmapped rows -> no new alert
    val clean = graft.mdm.MasterData.mapMasterData(
      data.limit(1), mdm, Seq("n_name"), Seq("region_name"))
    assert(graft.mdm.MasterData.alertUnmapped(c, clean, "nations") == 0L)
  }

  test("Admin.rebuild drops layer dirs; reset wipes the warehouse") {
    implicit val c: GraftConf = tmpConf()
    val dfl = flow("adm")
    dfl.createDataset("t", Map("a" -> Seq("1")))
    dfl.write("t", "t1", Layer.EXT)
    dfl.write("t", "t2", Layer.SUM)
    Admin.rebuild(spark, c, Seq(Layer.EXT))
    assert(!new java.io.File(s"${c.warehousePath}/EXT").exists())
    assert(new java.io.File(s"${c.warehousePath}/SUM").exists())
    Admin.reset(spark, c)
    assert(!new java.io.File(c.warehousePath).exists())
  }

  test("Admin.compact collapses small files and preserves the data") {
    implicit val c: GraftConf = tmpConf()
    val dfl = flow("adm")
    val rows = (1 to 500).map(_.toString)
    dfl.createDataset("t", Map("a" -> rows))
    // fragment: many tiny files (one per partition)
    dfl.get("t").repartition(16).write.mode("overwrite")
      .parquet(c.tablePath(Layer.EXT, "frag"))
    val (before, after) = Admin.compact(spark, c, Layer.EXT, "frag")
    assert(before == 16L)
    assert(after == 1L) // tiny table → one target-sized file
    val back = spark.read.parquet(c.tablePath(Layer.EXT, "frag"))
    assert(back.count() == 500)
    assert(back.select("a").as[String].collect().sorted.toSeq ==
      rows.sorted)
  }

  test("JsonDatastore round-trips with the stringly contract") {
    val dir = java.nio.file.Files.createTempDirectory("ds-json").toString
    val df = Seq(("1", "x"), ("2", "")).toDF("id", "v")
    val js = graft.io.JsonDatastore(dir)
    js.write(spark, df, "t")
    val back = js.read(spark, "t").orderBy("id").collect()
    // empty strings survive the write as ""; missing keys / JSON nulls
    // normalise to '' on read
    assert(back.map(_.getString(0)).toSeq == Seq("1", "2"))
    assert(back.map(_.getString(1)).toSeq == Seq("x", ""))
  }

  test("ParquetDatastore and CsvDatastore write/read round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("ds").toString
    val df = Seq(("1", "x"), ("2", "")).toDF("id", "v")
    val pq = ParquetDatastore(dir)
    pq.write(spark, df, "t")
    assert(pq.read(spark, "t").count() == 2)
    val csv = CsvDatastore(dir)
    csv.write(spark, df, "t")
    val back = csv.read(spark, "t").orderBy("id").collect()
    assert(back.map(_.getString(1)).toSeq == Seq("x", "")) // '' stays ''
  }

  test("BSE/SUM writes additionally land in the configured TRG sink") {
    val sinkDir = java.nio.file.Files.createTempDirectory("trg").toString
    implicit val c: GraftConf = tmpConf().copy(
      trgSink = Some(ParquetDatastore(sinkDir)))
    val dfl = flow("sink")
    dfl.createDataset("t", Map("a" -> Seq("1", "2")))
    dfl.write("t", "ext_only", Layer.EXT)
    dfl.write("t", "su_pushed", Layer.SUM)
    assert(!new java.io.File(s"$sinkDir/ext_only.parquet").exists())
    assert(ParquetDatastore(sinkDir).read(spark, "su_pushed").count() == 2)
  }

  test("step history round-trips escape-heavy keys and judges them") {
    import StepHistory.StepTiming
    val path = java.nio.file.Files
      .createTempDirectory("steps-esc").toString + "/steps.jsonl"
    // a desc carrying quotes, backslashes, newlines AND the literal
    // field-boundary sequence — any of these mis-parsing would shift
    // fields or produce a key that never matches its prior runs
    val evil = "q\"u\\ot\ne" + "\",\"key\":\""
    def t(s: Double) = StepTiming(evil, "join", 1, s)
    Seq("r1", "r2", "r3").zip(Seq(1.0, 1.0, 1.0)).foreach {
      case (id, s) => StepHistory.append(path, id, Seq(t(s)))
    }
    val loaded = StepHistory.load(path)
    assert(loaded.size == 3 && loaded.forall(_._2 == t(1.0).key),
      s"escaped key must round-trip identically: $loaded")
    // and the prior lookup HITS: an outlier on the evil key is judged
    assert(StepHistory.varianceReport(path, Seq(t(9.0)))
      .map(_.key) == Seq(t(9.0).key))
  }

  test("json datastore reads a legitimately-empty extract as empty") {
    import graft.io.JsonDatastore
    val dir = java.nio.file.Files.createTempDirectory("json-empty").toString
    val ds = JsonDatastore(dir)
    import spark.implicits._
    ds.write(spark, Seq((1L, "x")).toDF("id", "v").limit(0), "t")
    val back = ds.read(spark, "t")
    assert(back.count() == 0)
  }

  test("step-variance report flags outliers against synthetic history") {
    import StepHistory.StepTiming
    val path = java.nio.file.Files
      .createTempDirectory("steps").toString + "/steps.jsonl"
    def t(op: String, s: Double) = StepTiming("fl", op, 1, s)
    // three prior runs: 'read' ~1.0s tight, 'join' noisy 2/4/6s
    Seq("r1" -> Seq(t("read", 1.00), t("join", 2.0)),
      "r2" -> Seq(t("read", 1.02), t("join", 4.0)),
      "r3" -> Seq(t("read", 0.98), t("join", 6.0)))
      .foreach { case (id, ts) => StepHistory.append(path, id, ts) }
    assert(StepHistory.load(path).size == 6)
    // read at 2.0s is >> 2 sigma (sd floor 5% of mean); join at 5.0s is
    // inside its wide prior spread; a first-seen step is never judged
    val flagged = StepHistory.varianceReport(path,
      Seq(t("read", 2.0), t("join", 5.0), t("newstep", 9.9)), limit = 2.0)
    assert(flagged.map(_.key) == Seq("fl/1/read"))
    val v = flagged.head
    assert(v.priorRuns == 3 && math.abs(v.priorMean - 1.0) < 1e-9)
    assert(v.sigmas > 2.0)
    // within-noise current run flags nothing
    assert(StepHistory.varianceReport(path,
      Seq(t("read", 1.01), t("join", 4.5))).isEmpty)
    // reportAndRecord appends: 'newstep' becomes judgeable after 3 runs
    StepHistory.reportAndRecord(path, "r4", Seq(t("newstep", 1.0)))
    StepHistory.reportAndRecord(path, "r5", Seq(t("newstep", 1.0)))
    StepHistory.reportAndRecord(path, "r6", Seq(t("newstep", 1.0)))
    assert(StepHistory.varianceReport(path, Seq(t("newstep", 2.0)))
      .map(_.key) == Seq("fl/1/newstep"))
    // and the real StepLogger feeds timings with the right keys
    implicit val c: GraftConf = tmpConf()
    val dfl = flow("var_fl")
    dfl.createDataset("x", Map("v" -> Seq("1", "2")))
    dfl.dedupe("x")
    val keys = dfl.stepTimings.map(_.key)
    assert(keys == Seq("var_fl/1/createDataset", "var_fl/2/dedupe"))
    assert(dfl.stepTimings.forall(_.seconds >= 0.0))
  }
}
