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
}
