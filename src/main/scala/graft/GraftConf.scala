package graft

import graft.catalog.Catalog
import graft.io.Datastore

/** Audit-column constants stamped onto every extracted dataset
  * (reference: betl/ConfClass.py:33-46, betl/dataflow/dfl_audit.py:4-16).
  */
object Audit {
  val SourceSystem = "audit_source_system"
  val BulkLoadDate = "audit_bulk_load_date"
  val LatestDeltaLoadDate = "audit_latest_delta_load_date"
  val LatestLoadOperation = "audit_latest_load_operation"
  val all: Seq[String] =
    Seq(SourceSystem, BulkLoadDate, LatestDeltaLoadDate, LatestLoadOperation)
}

/** Engine configuration — the Spark-side equivalent of the reference's
  * appConfig.ini-driven Conf object (betl/ConfClass.py:64-249). Only the
  * data-semantic knobs are kept; scheduler/GSheet plumbing is out of scope.
  *
  * @param warehousePath  root dir; tables live at `<root>/<LAYER>/<table>`
  * @param srcSystems     source-system id → datastore (extract inputs)
  * @param dataLimitRows  dev-mode row cap applied at extract
  *                       (reference `limitdata`, betl/ConfClass.py:186-190)
  * @param debugCounts    eager per-step row counting for step logs — the
  *                       reference is always-eager; we only pay for counts
  *                       when this flag is on
  * @param trgSink        optional TRG datastore: BSE/SUM writes are pushed
  *                       here in addition to the Parquet layer (reference
  *                       always DB-writes BSE/SUM, dfl_io.py:81-94)
  * @param strictSchema   when true, writes to tables absent from the
  *                       catalog fail instead of auto-registering —
  *                       declarative-schema mode
  * @param reportsPath    where report/alert files land (reference
  *                       REPORTS_PATH, ConfClass.py:147). Defaults to a
  *                       `reports` SIBLING of the warehouse so
  *                       `Admin.reset` (which wipes the warehouse) never
  *                       deletes the append-only alert history
  * @param bulkOrDelta    run-control load mode the reference carries as
  *                       conf.BULK_OR_DELTA (ConfClass.py:150, set by the
  *                       `bulk`/`delta` CLI verbs) — dataflow ops read it
  *                       to choose audit stamping and extract/load routes
  */
case class GraftConf(
    warehousePath: String,
    srcSystems: Map[String, Datastore] = Map.empty,
    dataLimitRows: Option[Int] = None,
    debugCounts: Boolean = false,
    earliestDateInData: String = "1992-01-01",
    latestDateInData: String = "2000-12-31",
    catalog: Catalog = new Catalog,
    trgSink: Option[Datastore] = None,
    strictSchema: Boolean = false,
    reportsPath: Option[String] = None,
    bulkOrDelta: String = "BULK",
    logsPath: Option[String] = None) {

  def tablePath(layer: graft.catalog.Layer, table: String): String =
    s"$warehousePath/${layer.id}/$table"

  def resolvedReportsPath: String =
    reportsPath.getOrElse(
      new java.io.File(warehousePath).getParent match {
        case null   => s"$warehousePath-reports"
        case parent => s"$parent/reports"
      })

  def srcSystem(id: String): Datastore =
    srcSystems.getOrElse(id, throw new IllegalArgumentException(
      s"Source system '$id' not configured (have: ${srcSystems.keys.mkString(", ")})"))
}
