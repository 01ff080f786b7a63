package graft

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.catalog.CatalogIO
import graft.io.{CsvDatastore, Datastore, JdbcDatastore, ParquetDatastore}

import scala.jdk.CollectionConverters._

/** Config-file loading — the appConfig.ini equivalent
  * (betl/ConfClass.py:64-249), JSON-shaped:
  * {{{
  * { "warehousePath": "/path/wh",
  *   "schemaFile": "conf/warehouse_schema.json",   // optional
  *   "strictSchema": true,                          // optional
  *   "dataLimitRows": 100,                          // optional (limitdata)
  *   "earliestDateInData": "1992-01-01",
  *   "latestDateInData": "2000-12-31",
  *   "srcSystems": {
  *     "TESTDATA": {"type": "parquet", "dir": "/root/testdata/sf0.01"},
  *     "CRM":      {"type": "csv", "dir": "/data/crm", "delimiter": ";"},
  *     "ERP":      {"type": "jdbc", "url": "jdbc:postgresql://…",
  *                  "partitionColumn": "id"} },
  *   "trgSink": {"type": "parquet", "dir": "/path/trg"} }   // optional
  * }}}
  * Relative paths (schemaFile) resolve against the config file's dir.
  */
object GraftConfIO {

  private val mapper = new ObjectMapper()

  private def datastore(n: JsonNode, resolve: String => String): Datastore =
    n.get("type").asText() match {
      case "parquet" => ParquetDatastore(resolve(n.get("dir").asText()))
      case "csv" => CsvDatastore(resolve(n.get("dir").asText()),
        Option(n.get("delimiter")).map(_.asText()).getOrElse(","))
      case "jdbc" => JdbcDatastore(
        n.get("url").asText(),
        Option(n.get("properties")).map(_.properties().asScala
          .map(e => e.getKey -> e.getValue.asText()).toMap)
          .getOrElse(Map.empty),
        Option(n.get("partitionColumn")).map(_.asText()),
        numPartitions =
          Option(n.get("numPartitions")).map(_.asInt()).getOrElse(8),
        emptyStringToNull =
          Option(n.get("emptyStringToNull")).forall(_.asBoolean()))
      case "excel" => graft.io.ExcelDatastore(resolve(n.get("path").asText()))
      case t => throw new IllegalArgumentException(
        s"Unknown datastore type '$t'")
    }

  def fromFile(path: String): GraftConf = {
    val p = java.nio.file.Paths.get(path)
    val root = mapper.readTree(
      new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))
    val dir = Option(p.getParent).getOrElse(java.nio.file.Paths.get("."))
    def resolve(f: String): String = {
      val fp = java.nio.file.Paths.get(f)
      if (fp.isAbsolute) f else dir.resolve(fp).toString
    }
    val catalog = Option(root.get("schemaFile"))
      .map(f => CatalogIO.fromJsonFile(resolve(f.asText())))
      .getOrElse(new graft.catalog.Catalog)
    // every filesystem path in the config resolves against the config
    // file's own directory (appConfig.ini convention: TMP_DATA_PATH /
    // LOG_PATH are app-relative) — absolute paths pass through untouched
    GraftConf(
      warehousePath = resolve(root.get("warehousePath").asText()),
      srcSystems = Option(root.get("srcSystems"))
        .map(_.properties().asScala
          .map(e => e.getKey -> datastore(e.getValue, resolve)).toMap)
        .getOrElse(Map.empty),
      dataLimitRows = Option(root.get("dataLimitRows")).map(_.asInt()),
      debugCounts = Option(root.get("debugCounts")).exists(_.asBoolean()),
      earliestDateInData = Option(root.get("earliestDateInData"))
        .map(_.asText()).getOrElse("1992-01-01"),
      latestDateInData = Option(root.get("latestDateInData"))
        .map(_.asText()).getOrElse("2000-12-31"),
      catalog = catalog,
      trgSink = Option(root.get("trgSink")).map(datastore(_, resolve)),
      strictSchema = Option(root.get("strictSchema")).exists(_.asBoolean()),
      reportsPath = Option(root.get("reportsPath")).map(_.asText()),
      // LOG_PATH equivalent (appConfig.ini [ctrl]): numbered
      // NNNN_jobLog.log files land here, one per engine run
      logsPath = Option(root.get("logsPath")).map(f => resolve(f.asText())))
  }
}
