package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, explode, json_object_keys}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** A connectable source/sink system — the Spark equivalent of the
  * reference's Datastore hierarchy (betl/io/DatastoreClass.py:1-11 with
  * Postgres/SQLite/CSV/GSheet/Excel subclasses): files (CSV), columnar
  * (Parquet), a generic JDBC connector covering the Postgres/SQLite
  * cases, and a workbook connector ([[ExcelDatastore]]) covering the
  * Excel half of the spreadsheet plumbing. GSheet remains de-scoped
  * (external service; its mapping/schema semantics ride the same
  * stringly contract as Excel/CSV).
  */
trait Datastore extends Serializable {
  /** Read one table from this datastore. */
  def read(spark: SparkSession, table: String): DataFrame
  /** List of table names, when enumerable (for default-extract DAG fan-out). */
  def tableNames(spark: SparkSession): Seq[String] = Seq.empty
  /** Read a table whose name came from [[tableNames]] — metadata names
    * are the exact stored identifiers, so engines with name resolution
    * rules (JDBC case folding) must resolve them verbatim rather than
    * applying caller-supplied-name heuristics. Default: same as [[read]].
    */
  def readEnumerated(spark: SparkSession, table: String): DataFrame =
    read(spark, table)
  /** Write a table to this datastore (`mode` ∈ overwrite/append) — the
    * sink half of the reference's Datastore contract (its BSE/SUM layers
    * always land in the TRG database, betl/io/dbIO.py:24-44).
    */
  def write(spark: SparkSession, df: DataFrame, table: String,
      mode: String = "overwrite"): Unit =
    throw new UnsupportedOperationException(
      s"${getClass.getSimpleName} is read-only")
}

/** Directory of Parquet files: `<dir>/<table>.parquet`. Matches the driver
  * test corpus layout (TESTDATA.md).
  */
case class ParquetDatastore(dir: String) extends Datastore {
  def read(spark: SparkSession, table: String): DataFrame =
    spark.read.parquet(s"$dir/$table.parquet")

  override def write(spark: SparkSession, df: DataFrame, table: String,
      mode: String = "overwrite"): Unit =
    df.write.mode(mode).parquet(s"$dir/$table.parquet")

  override def tableNames(spark: SparkSession): Seq[String] = {
    val d = new java.io.File(dir)
    Option(d.list()).getOrElse(Array.empty[String]).toSeq
      .filter(_.endsWith(".parquet")).map(_.stripSuffix(".parquet")).sorted
  }
}

/** Directory of CSV files: `<dir>/<table>.csv`.
  *
  * Faithful to the reference's ingestion contract: every column is read as
  * STRING and empty cells stay empty strings, not nulls
  * (betl/io/fileIO.py:26-36 — `dtype=str`, `na_filter=False`). Schema
  * inference is therefore OFF; the header row names the columns.
  *
  * `singleFile=true` (default) coalesces writes to one part file — the
  * reference's one-csv-per-table fixture shape. Set false for bulk
  * sinks: partitions then write in parallel, one part file each.
  */
case class CsvDatastore(dir: String, delimiter: String = ",",
    singleFile: Boolean = true)
    extends Datastore {

  def read(spark: SparkSession, table: String): DataFrame = {
    val path = s"$dir/$table.csv"
    // Two-pass: sniff the header to build an all-string schema, then read
    // with that schema. Keeps inferSchema off and types faithful.
    val header = spark.read.option("header", "true").option("sep", delimiter)
      .csv(path).schema.fieldNames
    val schema = StructType(header.map(StructField(_, StringType)))
    // no nullValue option: emptyValue="" + the na.fill below already give
    // na_filter=False parity (a null option value is undefined behavior)
    val df = spark.read
      .option("header", "true")
      .option("sep", delimiter)
      .option("emptyValue", "")
      .schema(schema)
      .csv(path)
    // na_filter=False parity: nulls from missing trailing fields → ''
    df.na.fill("")
  }

  override def tableNames(spark: SparkSession): Seq[String] = {
    val d = new java.io.File(dir)
    Option(d.list()).getOrElse(Array.empty[String]).toSeq
      .filter(_.endsWith(".csv")).map(_.stripSuffix(".csv")).sorted
  }

  override def write(spark: SparkSession, df: DataFrame, table: String,
      mode: String = "overwrite"): Unit =
    (if (singleFile) df.coalesce(1) else df).write.mode(mode)
      .option("header", "true").option("sep", delimiter)
      .csv(s"$dir/$table.csv")
}

/** Directory of ORC files: `<dir>/<table>.orc` — the second columnar
  * interchange format (typed, like [[ParquetDatastore]]; Hive-ecosystem
  * sources commonly hand data over as ORC).
  */
case class OrcDatastore(dir: String) extends Datastore {
  def read(spark: SparkSession, table: String): DataFrame =
    spark.read.orc(s"$dir/$table.orc")

  override def write(spark: SparkSession, df: DataFrame, table: String,
      mode: String = "overwrite"): Unit =
    df.write.mode(mode).orc(s"$dir/$table.orc")

  override def tableNames(spark: SparkSession): Seq[String] = {
    val d = new java.io.File(dir)
    Option(d.list()).getOrElse(Array.empty[String]).toSeq
      .filter(_.endsWith(".orc")).map(_.stripSuffix(".orc")).sorted
  }
}

/** Directory of JSON-lines files: `<dir>/<table>.json` — the modern
  * interchange sibling of [[CsvDatastore]], same stringly ingestion
  * contract: a name-discovery pass, then every field read as STRING
  * (JSON scalars coerce to their literal text) with missing keys / JSON
  * nulls normalised to `''`. Typing stays an explicit downstream step
  * (`toNumeric`), exactly like the CSV path.
  */
case class JsonDatastore(dir: String, singleFile: Boolean = true)
    extends Datastore {

  def read(spark: SparkSession, table: String): DataFrame = {
    val path = s"$dir/$table.json"
    // two-pass like CsvDatastore: discover field names, then re-read
    // with an all-string schema (inference off, types faithful). The
    // discovery pass unions json_object_keys over raw text lines — one
    // scan with no type-merge machinery, and unlike a sampled
    // inference it cannot drop a key that first appears late in the
    // file (the stringly contract promises missing keys become '')
    val names = spark.read.text(path)
      .select(explode(json_object_keys(col("value"))).as("k"))
      .distinct().collect().map(_.getString(0)).sorted
    // a legitimately-empty extract (zero lines, or only '{}' rows) reads
    // back as an empty zero-column frame — the round trip of writing an
    // empty frame, and parity with table-enumerating callers that expect
    // empty tables to read, not throw
    if (names.isEmpty) spark.emptyDataFrame
    else {
      val schema = StructType(names.map(StructField(_, StringType)))
      spark.read.schema(schema).json(path).na.fill("")
    }
  }

  override def tableNames(spark: SparkSession): Seq[String] = {
    val d = new java.io.File(dir)
    Option(d.list()).getOrElse(Array.empty[String]).toSeq
      .filter(_.endsWith(".json")).map(_.stripSuffix(".json")).sorted
  }

  override def write(spark: SparkSession, df: DataFrame, table: String,
      mode: String = "overwrite"): Unit =
    (if (singleFile) df.coalesce(1) else df).write.mode(mode)
      .json(s"$dir/$table.json")
}

/** Workbook-backed datastore: one xlsx file, worksheets as tables — the
  * reference's Excel connector (betl/io/_excel.py:5-44,
  * excelIO.py:4-35). Same stringly contract as [[CsvDatastore]]: the
  * first row names the columns, every cell reads as a string, empty
  * cells are `''`. Control-plane sized by design (the reference keeps
  * MDM mappings and schema descriptions in workbooks): reads and writes
  * materialise driver-side through the dependency-free [[Xlsx]] codec.
  */
/** Row cap guarding the sheet connectors' driver-side materialisation:
  * reads and writes go through `df.collect()` by protocol (the reference
  * round-trips whole worksheets, betl/io/excelIO.py:4-35,
  * gsheetIO.py:4-12), which is fine for the control-plane tables they
  * exist for — and a silent driver OOM for a fact table pointed at them
  * by mistake. The cap turns that into an immediate, explicit error.
  */
private[io] object SheetGuard {
  val DefaultMaxRows = 100000

  def check(df: org.apache.spark.sql.DataFrame, maxRows: Int,
      target: String): Unit = {
    // limit(max+1) so the guard job scans only enough to prove overflow,
    // never the whole table
    val n = df.limit(maxRows + 1).count()
    require(n <= maxRows,
      s"$target: refusing to collect > $maxRows rows into a sheet sink " +
        "(sheet connectors are for control-plane tables; raise maxRows " +
        "explicitly if this is intentional)")
  }
}

case class ExcelDatastore(path: String,
    maxRows: Int = SheetGuard.DefaultMaxRows) extends Datastore {
  import org.apache.spark.sql.Row

  def read(spark: SparkSession, table: String): DataFrame = {
    val rows = Xlsx.readSheets(path).getOrElse(table,
      throw new IllegalArgumentException(
        s"$path: no worksheet named '$table'"))
    require(rows.nonEmpty, s"$path!$table: missing header row")
    val header = rows.head
    val schema = StructType(header.map(StructField(_, StringType)))
    val data = rows.tail.map(r =>
      Row.fromSeq(header.indices.map(i => r.lift(i).getOrElse(""))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(data.toSeq, 1), schema)
  }

  override def tableNames(spark: SparkSession): Seq[String] =
    if (new java.io.File(path).exists()) Xlsx.readSheets(path).keys.toSeq
    else Seq.empty

  override def write(spark: SparkSession, df: DataFrame, table: String,
      mode: String = "overwrite"): Unit = {
    SheetGuard.check(df, maxRows, s"$path!$table")
    val header = df.columns.toSeq
    val rows = df.collect().toSeq.map(_.toSeq.map(v =>
      Option(v).map(_.toString).getOrElse("")))
    val existing =
      if (new java.io.File(path).exists()) Xlsx.readSheets(path)
      else scala.collection.immutable.ListMap.empty[String, Seq[Seq[String]]]
    val sheet =
      if (mode.equalsIgnoreCase("append") && existing.contains(table)) {
        // appended rows are positional: the frame's columns must match
        // the sheet's header or values would land under the wrong names
        val sheetHeader = existing(table).headOption.getOrElse(Seq.empty)
        require(sheetHeader == header,
          s"$path!$table append: frame columns ${header.mkString("[", ",", "]")} " +
            s"do not match sheet header ${sheetHeader.mkString("[", ",", "]")}")
        existing(table) ++ rows
      } else header +: rows
    Xlsx.writeSheets(path, existing.updated(table, sheet))
  }
}

/** Transport abstraction for sheet-service connectors: the reference's
  * GSheet connector (betl/io/_gsheet.py:9-69, gsheetIO.py:4-12) is a thin
  * wrapper over `worksheet.get_all_values()` / `append_row()` — i.e. a
  * fetch-all / replace-all protocol over named sheets. Everything above
  * that protocol (stringly contract, header row, MDM mapping semantics)
  * is engine logic and is implemented + tested here; the HTTP/OAuth
  * transport is the ONLY piece that needs a network, so it is this trait.
  */
trait SheetTransport extends Serializable {
  /** All cell values of a sheet, row-major; empty seq if absent. */
  def fetch(sheet: String): Seq[Seq[String]]
  /** Replace a sheet's full contents. */
  def replace(sheet: String, rows: Seq[Seq[String]]): Unit
  def sheetNames: Seq[String]
}

/** Offline [[SheetTransport]]: sheets as TSV files in a directory. The
  * deterministic stand-in for the Sheets API in an egress-free
  * environment — swap in an HTTP transport to talk to the real service;
  * no other line of the connector changes.
  */
case class LocalSheetTransport(dir: String) extends SheetTransport {
  private def file(sheet: String) = new java.io.File(dir, s"$sheet.tsv")
  def fetch(sheet: String): Seq[Seq[String]] = {
    val f = file(sheet)
    if (!f.exists()) Seq.empty
    else scala.util.Using.resource(scala.io.Source.fromFile(f, "UTF-8"))(
      _.getLines().map(_.split("\t", -1).toSeq).toSeq)
  }
  def replace(sheet: String, rows: Seq[Seq[String]]): Unit = {
    new java.io.File(dir).mkdirs()
    require(rows.forall(_.forall(v => !v.contains('\t') && !v.contains('\n'))),
      s"$sheet: cell values must not contain tabs/newlines in TSV transport")
    java.nio.file.Files.writeString(file(sheet).toPath,
      rows.map(_.mkString("\t")).mkString("", "\n", "\n"))
  }
  def sheetNames: Seq[String] =
    Option(new java.io.File(dir).list()).getOrElse(Array.empty)
      .filter(_.endsWith(".tsv")).map(_.stripSuffix(".tsv")).toSeq.sorted
}

/** Sheet-service datastore: worksheets as tables over a pluggable
  * [[SheetTransport]] — the reference's GSheet connector re-expressed
  * with the network boundary isolated. Same stringly contract as
  * [[ExcelDatastore]]: first row names columns, every cell is a string,
  * empty cells are `''`. Control-plane sized (MDM mappings, schema
  * descriptions) — reads and writes materialise driver-side like the
  * reference's `get_all_values()` round-trip.
  */
case class GSheetDatastore(transport: SheetTransport,
    maxRows: Int = SheetGuard.DefaultMaxRows) extends Datastore {
  import org.apache.spark.sql.Row

  def read(spark: SparkSession, table: String): DataFrame = {
    val rows = transport.fetch(table)
    require(rows.nonEmpty, s"sheet '$table': missing or empty")
    val header = rows.head
    val schema = StructType(header.map(StructField(_, StringType)))
    val data = rows.tail.map(r =>
      Row.fromSeq(header.indices.map(i => r.lift(i).getOrElse(""))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(data.toSeq, 1), schema)
  }

  override def tableNames(spark: SparkSession): Seq[String] =
    transport.sheetNames

  override def write(spark: SparkSession, df: DataFrame, table: String,
      mode: String = "overwrite"): Unit = {
    SheetGuard.check(df, maxRows, s"sheet '$table'")
    val header = df.columns.toSeq
    val rows = df.collect().toSeq.map(_.toSeq.map(v =>
      Option(v).map(_.toString).getOrElse("")))
    // fetch once: with a real HTTP transport a second fetch is another
    // full-sheet download and a TOCTOU window between check and validate
    val existing = if (mode.equalsIgnoreCase("append")) transport.fetch(table)
                   else Seq.empty
    val sheet =
      if (existing.nonEmpty) {
        require(existing.head == header,
          s"sheet '$table' append: frame columns " +
            s"${header.mkString("[", ",", "]")} do not match sheet header " +
            s"${existing.head.mkString("[", ",", "]")}")
        existing ++ rows
      } else header +: rows
    transport.replace(table, sheet)
  }
}

/** Generic JDBC datastore covering the reference's Postgres/SQLite
  * connectors (betl/io/_postgres.py, _sqlite.py). Reads partition by a
  * numeric column when provided so large tables parallelise across
  * executors instead of funnelling through one connection.
  *
  * @param emptyStringToNull write-side `''` → NULL normalisation — the
  *   reference's DB sink always maps empty strings to NaN before COPY so
  *   they land as SQL NULL (betl/io/dbIO.py:26-29, emptyStringToNaN)
  */
case class JdbcDatastore(
    url: String,
    properties: Map[String, String] = Map.empty,
    partitionColumn: Option[String] = None,
    numPartitions: Int = 8,
    emptyStringToNull: Boolean = true) extends Datastore {

  private def props: java.util.Properties = {
    val p = new java.util.Properties()
    properties.foreach { case (k, v) => p.setProperty(k, v) }
    p
  }

  /** Resolve a CALLER-SUPPLIED table reference for SQL embedding:
    * uniformly-cased bare identifiers pass through (the engine's
    * case-fold makes them land — and hand-written lowercase names keep
    * working against Derby's up-fold), while mixed-case or exotic names
    * (i.e. tables that can only have been created QUOTED, like Postgres
    * `"MyTable"`) are dialect-quoted verbatim.
    *
    * This heuristic is ONLY for hand-written names: a quoted-created
    * table whose uniform case opposes the dialect's fold (Postgres
    * `"MYTABLE"`, Derby `"orders"`) would pass through bare here and be
    * folded away by the engine — names enumerated from [[tableNames]]
    * metadata (exact stored case) must go through [[readEnumerated]],
    * which quotes unconditionally and therefore always resolves.
    */
  private def quotedIfNeeded(table: String): String = {
    val bare = table.matches("[A-Za-z_][A-Za-z0-9_]*") &&
      (table == table.toUpperCase || table == table.toLowerCase)
    if (bare) table
    else org.apache.spark.sql.jdbc.JdbcDialects.get(url)
      .quoteIdentifier(table)
  }

  /** Metadata-sourced read: the name is the exact stored identifier
    * (from [[tableNames]]), so quote it verbatim — quoting an exact
    * stored name always resolves, in every dialect, regardless of fold
    * direction.
    */
  override def readEnumerated(spark: SparkSession, table: String): DataFrame =
    readResolved(spark, org.apache.spark.sql.jdbc.JdbcDialects.get(url)
      .quoteIdentifier(table))

  def read(spark: SparkSession, table0: String): DataFrame =
    readResolved(spark, quotedIfNeeded(table0))

  private def readResolved(spark: SparkSession, table: String): DataFrame = {
    partitionColumn match {
      case Some(pc) =>
        // quote the partition column per dialect: Spark's JDBC writer
        // creates columns quoted-verbatim, so case-folding engines
        // (Derby/Postgres) would miss an unquoted lowercase name here
        val qpc = org.apache.spark.sql.jdbc.JdbcDialects.get(url)
          .quoteIdentifier(pc)
        val bounds = spark.read.jdbc(url,
          s"(SELECT min($qpc) lo, max($qpc) hi FROM $table) b", props).head()
        // min/max of INT/DECIMAL columns come back as non-Long Numbers, and
        // an empty table yields NULLs — fall back to the unpartitioned read
        (Option(bounds.getAs[Number](0)), Option(bounds.getAs[Number](1))) match {
          case (Some(lo), Some(hi)) =>
            spark.read.jdbc(url, table, pc,
              lo.longValue, hi.longValue, numPartitions, props)
          case _ => spark.read.jdbc(url, table, props)
        }
      case None => spark.read.jdbc(url, table, props)
    }
  }

  /** Batched JDBC insert — the Spark rendering of the reference's
    * Postgres `COPY FROM STDIN` bulk path (betl/io/dbIO.py:24-44);
    * executors write partitions in parallel connections.
    */
  override def write(spark: SparkSession, df: DataFrame, table: String,
      mode: String = "overwrite"): Unit = {
    val out =
      if (!emptyStringToNull) df
      else df.schema.fields.foldLeft(df) {
        case (d, f) if f.dataType == StringType =>
          d.withColumn(f.name,
            org.apache.spark.sql.functions.when(
              org.apache.spark.sql.functions.col(f.name) === "", null)
              .otherwise(org.apache.spark.sql.functions.col(f.name)))
        case (d, _) => d
      }
    out.write.mode(mode).jdbc(url, table, props)
  }

  /** User-table names via JDBC metadata — the engine's rendering of the
    * reference's source-schema introspection front door
    * (readSrcSystemSchemas reads information_schema.columns /
    * sqlite_master, betl/admin.py:147-357): `Admin.readSrc` over a JDBC
    * source enumerates these and types each by reading its schema.
    * Names come back VERBATIM as the metadata reports them: lowercasing
    * here would make a quoted mixed-case source table (Postgres
    * `"MyTable"`) enumerate as `mytable` but fail to resolve on read,
    * and would silently collide two tables differing only in case. The
    * engine's case-fold stays out of EXT names because
    * [[graft.Admin.cleanTableName]] lowercases the DERIVED name at
    * registration; [[read]] quotes non-uniformly-cased names so every
    * enumerated name round-trips.
    */
  override def tableNames(spark: SparkSession): Seq[String] =
    withConnection { conn =>
      val rs = conn.getMetaData.getTables(null, null, "%",
        Array("TABLE"))
      try Iterator.continually(rs).takeWhile(_.next())
        .map(_.getString("TABLE_NAME")).toSeq.sorted
      finally rs.close()
    }

  /** Whether a table exists, via driver-side JDBC metadata (identifiers
    * are matched case-insensitively — Derby/Postgres case-fold bare DDL
    * names in opposite directions).
    */
  def tableExists(table: String): Boolean = withConnection { conn =>
    val rs = conn.getMetaData.getTables(null, null, "%", null)
    try {
      Iterator.continually(rs)
        .takeWhile(_.next())
        .exists(_.getString("TABLE_NAME").equalsIgnoreCase(table))
    } finally rs.close()
  }

  /** Execute DDL statements driver-side on a fresh connection — the
    * engine's rendering of the reference's `customSQL(sql, 'TRG')` index
    * maintenance calls (betl/defaultdataflows/stageLoad.py:118-131,:216).
    * With `ignoreMissing`, drop statements against absent objects succeed
    * silently (the portable stand-in for Postgres `IF EXISTS`, which
    * Derby lacks). Returns the statements actually executed.
    */
  def executeDdl(
      sqls: Seq[String], ignoreMissing: Boolean = false): Seq[String] =
    withConnection { conn =>
      val st = conn.createStatement()
      try sqls.flatMap { sql =>
        try { st.executeUpdate(sql); Some(sql) }
        catch {
          case e: java.sql.SQLException if ignoreMissing &&
              isMissingObject(e) => None
        }
      } finally st.close()
    }

  private def isMissingObject(e: java.sql.SQLException): Boolean = {
    // Enumerated SQLSTATEs ONLY (add states per supported dialect) — a
    // message-substring fallback would also swallow unrelated errors
    // that happen to phrase as "does not exist" (missing schema from a
    // misconfigured URL, dialect errors about other objects) and skip
    // DDL that should have failed loudly.
    // Derby: 42X65 index, 42X86 constraint, 42Y55/42Y07 table/schema,
    // X0X05 table (drop), 42X05 view/table not found;
    // Postgres: 42704 undefined object, 42P01 undefined table;
    // SQLite (JDBC drivers map sparsely): none — SQLite DDL uses its
    // native IF EXISTS instead of this path.
    val states = Set("42X65", "42X86", "42Y55", "42Y07", "X0X05", "42X05",
      "42704", "42P01")
    states.contains(e.getSQLState)
  }

  private def withConnection[A](f: java.sql.Connection => A): A = {
    properties.get("driver").foreach(Class.forName)
    val user = properties.get("user").orNull
    val pass = properties.get("password").orNull
    val conn =
      if (user != null) java.sql.DriverManager.getConnection(url, user, pass)
      else java.sql.DriverManager.getConnection(url)
    try f(conn) finally conn.close()
  }
}
