package graft

import graft.catalog._
import graft.io.{JdbcDatastore, JdbcDdl}
import graft.warehouse._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}

/** JdbcDatastore + JdbcDdl against embedded Derby (ships in
  * /opt/spark/jars) — the offline stand-in for the reference's
  * Postgres/SQLite TRG connectors (betl/io/DatastoreClass_postgres.py,
  * _sqlite.py, dbIO.py).
  */
class JdbcSpec extends SparkSpec {

  // quiet Derby's derby.log into the build dir (must be set before the
  // engine boots, i.e. before the first connection in this JVM)
  System.setProperty("derby.stream.error.file", "target/derby.log")

  private def derbyUrl(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-derby").toString
    s"jdbc:derby:$dir/db;create=true"
  }

  test("jdbc round trip: typed write + read, overwrite and append modes") {
    import spark.implicits._
    val ds = JdbcDatastore(derbyUrl())
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "name", "x")
    ds.write(spark, df, "t1") // overwrite = create
    assert(ds.read(spark, "t1").count() == 2)
    ds.write(spark, df, "t1", "append")
    assert(ds.read(spark, "t1").count() == 4)
    ds.write(spark, df, "t1", "overwrite") // drop + recreate
    val back = ds.read(spark, "t1").orderBy("id").collect()
    assert(back.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(back.map(_.getString(1)).toSeq == Seq("a", "b"))
    assert(back.map(_.getDouble(2)).toSeq == Seq(1.5, 2.5))
  }

  test("jdbc partitioned read executes the bounds query and splits the scan") {
    import spark.implicits._
    val url = derbyUrl()
    JdbcDatastore(url).write(
      spark, (1L to 100L).map(i => (i, s"row_$i")).toDF("k", "v"), "parts")
    val part = JdbcDatastore(url,
      partitionColumn = Some("k"), numPartitions = 4)
    val got = part.read(spark, "parts")
    // the min/max bounds probe ran and produced 4 real JDBC partitions
    assert(got.rdd.getNumPartitions == 4)
    assert(got.count() == 100)
    assert(got.agg(sum("k")).head().getLong(0) == 5050L)
  }

  test("jdbc partitioned read over an empty table falls back to plain read") {
    import spark.implicits._
    val url = derbyUrl()
    JdbcDatastore(url).write(
      spark, Seq((1L, "x")).toDF("k", "v").limit(0), "empty_t")
    val part = JdbcDatastore(url,
      partitionColumn = Some("k"), numPartitions = 4)
    assert(part.read(spark, "empty_t").count() == 0)
  }

  test("jdbc tableNames enumerates user tables so readsrc introspects them") {
    import spark.implicits._
    val url = derbyUrl()
    val ds = JdbcDatastore(url)
    ds.write(spark, Seq((1L, "a")).toDF("id", "v"), "orders_src")
    ds.write(spark, Seq((2L, "b")).toDF("id", "v"), "parts_src")
    // metadata-VERBATIM names (Derby's bare DDL up-fold included),
    // system tables excluded; every enumerated name must resolve on read
    assert(ds.tableNames(spark) == Seq("ORDERS_SRC", "PARTS_SRC"))
    ds.tableNames(spark).foreach(t => assert(ds.read(spark, t).count() == 1))
    // a table that can only exist QUOTED (mixed case) enumerates under
    // its true name and round-trips through the dialect-quoted read —
    // the lowercasing regression: it would enumerate as mytable_src and
    // fail to resolve
    ds.executeDdl(Seq("""CREATE TABLE "MyTable_src" (id INT)"""))
    ds.executeDdl(Seq("""INSERT INTO "MyTable_src" VALUES (7)"""))
    assert(ds.tableNames(spark).contains("MyTable_src"))
    assert(ds.read(spark, "MyTable_src").head().getInt(0) == 7)
    // the reference readsrc flow: introspect every table into EXT defs
    // under the cleanTableName-LOWERCASED derived name
    implicit val c: GraftConf = tmpConf().copy(
      srcSystems = Map("DB" -> ds))
    val defs = Admin.readSrc(spark, c, "DB")
    assert(defs.map(_.name).sorted ==
      Seq("mytable_src", "orders_src", "parts_src"))
    assert(c.catalog.lookup(graft.catalog.Layer.EXT, "orders_src")
      .exists(_.columnNames.take(2) == Seq("id", "v")))
  }

  test("jdbc write maps '' to NULL (reference dbIO emptyStringToNaN parity)") {
    import spark.implicits._
    val url = derbyUrl()
    val ds = JdbcDatastore(url)
    ds.write(spark, Seq((1L, "x"), (2L, "")).toDF("k", "v"), "nulls_t")
    val back = ds.read(spark, "nulls_t").orderBy("k").collect()
    assert(back(0).getString(1) == "x")
    assert(back(1).isNullAt(1))
    // the boundary is a switch, not hard-wired
    val raw = JdbcDatastore(url, emptyStringToNull = false)
    raw.write(spark, Seq((1L, "")).toDF("k", "v"), "raw_t")
    assert(raw.read(spark, "raw_t").head().getString(1) == "")
  }

  private val dimDef = TableDef("dm_customer", Layer.BSE, Seq(
    ColumnDef("sk_customer", LongType, ColumnRole.SurrogateKey),
    ColumnDef("c_custkey", LongType, ColumnRole.NaturalKey),
    ColumnDef("c_name", StringType)))
  private val factDef = TableDef("ft_orders", Layer.BSE, Seq(
    ColumnDef("sk_customer", LongType, ColumnRole.ForeignKey,
      fkDimension = Some("dm_customer")),
    ColumnDef("amount", DoubleType)))

  test("ddl: catalog-generated CREATE TABLE + indexes round-trip through Derby") {
    import spark.implicits._
    val url = derbyUrl()
    val ds = JdbcDatastore(url)
    val executed = ds.executeDdl(Seq(
      JdbcDdl.createTableSql(dimDef), JdbcDdl.createTableSql(factDef)))
    assert(executed.size == 2)
    assert(ds.tableExists("dm_customer") && ds.tableExists("ft_orders"))
    // explicit SKs insert through the GENERATED BY DEFAULT identity
    ds.write(spark,
      Seq((-1L, null.asInstanceOf[java.lang.Long], "MISSING"),
        (1L, java.lang.Long.valueOf(10L), "alice"))
        .toDF("sk_customer", "c_custkey", "c_name"),
      "dm_customer", "append")
    assert(ds.read(spark, "dm_customer").count() == 2)
    // index battery creates: dim unique index, fact index + FK constraint
    assert(ds.executeDdl(JdbcDdl.createIndexSqls(dimDef)).size == 1)
    assert(ds.executeDdl(JdbcDdl.createIndexSqls(factDef)).size == 2)
    // the SK unique index rejects duplicates
    intercept[Exception] {
      ds.write(spark,
        Seq((1L, java.lang.Long.valueOf(11L), "dup"))
          .toDF("sk_customer", "c_custkey", "c_name"),
        "dm_customer", "append")
    }
  }

  test("ddl: FK constraint enforces dim membership; drop sequence removes it") {
    import spark.implicits._
    val url = derbyUrl()
    val ds = JdbcDatastore(url)
    ds.executeDdl(Seq(
      JdbcDdl.createTableSql(dimDef), JdbcDdl.createTableSql(factDef)))
    ds.write(spark, Seq((1L, 10L, "alice")).toDF(
      "sk_customer", "c_custkey", "c_name"), "dm_customer", "append")
    ds.executeDdl(JdbcDdl.createIndexSqls(dimDef))
    ds.executeDdl(JdbcDdl.createIndexSqls(factDef))
    // a fact row pointing at a missing dim member violates the constraint
    intercept[Exception] {
      ds.write(spark, Seq((99L, 5.0)).toDF("sk_customer", "amount"),
        "ft_orders", "append")
    }
    // the pre-bulk-load teardown (facts first) lifts the constraint
    val dropped = ds.executeDdl(
      JdbcDdl.dropLoadIndexSqls(Seq(dimDef, factDef)), ignoreMissing = true)
    assert(dropped.exists(_.contains("DROP CONSTRAINT ft_orders_sk_customer_fk")))
    ds.write(spark, Seq((99L, 5.0)).toDF("sk_customer", "amount"),
      "ft_orders", "append")
    assert(ds.read(spark, "ft_orders").count() == 1)
    // idempotent re-drop: everything already gone, nothing re-executed
    assert(ds.executeDdl(
      JdbcDdl.dropLoadIndexSqls(Seq(dimDef, factDef)), ignoreMissing = true)
      .count(_.startsWith("DROP INDEX")) == 0)
  }

  test("bulk loads against a JDBC TRG sink run the reference DB sequence") {
    import spark.implicits._
    val url = derbyUrl()
    val jdbc = JdbcDatastore(url)
    implicit val c: GraftConf = tmpConf().copy(trgSink = Some(jdbc))
    Seq((1L, "alice"), (2L, "bob"), (3L, "carol"))
      .toDF("c_custkey", "c_name").write
      .parquet(c.tablePath(Layer.LOD, "dm_customer"))
    val spec = DimensionSpec("dm_customer", Seq("c_custkey"), Seq("c_name"))
    val dimCount = StageLoad.bulkLoadDimension(spark, c, spec).count()
    // table materialised in Derby through catalog DDL with identity SK
    assert(jdbc.tableExists("dm_customer"))
    assert(jdbc.read(spark, "dm_customer").count() == dimCount)
    // fact load resolves FKs, defaults to -1, and lands with constraint
    Seq((1L, 10.0), (9L, 5.0)).toDF("c_custkey", "amount").write
      .parquet(c.tablePath(Layer.LOD, "ft_orders"))
    val factCount = StageLoad.bulkLoadFact(spark, c, FactSpec("ft_orders",
      Seq(FkMapping("c_custkey", "dm_customer", "c_custkey")))).count()
    assert(jdbc.read(spark, "ft_orders").count() == factCount)
    val skUnknown = jdbc.read(spark, "ft_orders")
      .filter(col("amount") === 5.0).select("sk_customer").head().getLong(0)
    assert(skUnknown == -1L) // -1 default row exists in dim → FK satisfied
    // RE-load: the load-stage teardown + truncate keep counts stable
    // (no duplicate append, no truncate-blocked-by-FK failure)
    StageLoad.dropTrgSinkIndexes(c)
    StageLoad.bulkLoadDimension(spark, c, spec)
    StageLoad.bulkLoadFact(spark, c, FactSpec("ft_orders",
      Seq(FkMapping("c_custkey", "dm_customer", "c_custkey"))))
    assert(jdbc.read(spark, "dm_customer").count() == dimCount)
    assert(jdbc.read(spark, "ft_orders").count() == factCount)
    // the SK index is really there afterwards: dropping it executes
    assert(StageLoad.dropTrgSinkIndexes(c).nonEmpty ||
      jdbc.executeDdl(JdbcDdl.dropIndexSqls(dimDef), ignoreMissing = true)
        .contains("DROP INDEX dm_customer_sk_customer_key"))
  }
}
