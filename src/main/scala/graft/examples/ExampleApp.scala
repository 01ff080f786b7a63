package graft.examples

import graft._
import graft.catalog.Layer
import graft.pipeline.{PipelineOp, Stage}
import org.apache.spark.sql.SparkSession

/** Port of the reference's committed example application
  * (`betl/betl-test/test_app`): `main.py`'s scheduleConfig drives the
  * default extract plus ONE bespoke dataflow, `dfl_example.py`'s
  * read → dedupe → write, against the sources declared in
  * `appConfig.ini`. The graft rendering keeps all three pieces —
  *
  *  - `examples/test_app/appConfig.json` ↔ appConfig.ini (warehouse,
  *    logs, source-system declarations);
  *  - [[exampleDataflow]] ↔ dfl_example.py:1-16, same op sequence and
  *    table names;
  *  - [[ops]] ↔ main.py:4-27's scheduleConfig (DEFAULT_EXTRACT=True +
  *    EXTRACT_DATAFLOWS=[exampleDataflow]) — rendered as the default
  *    extract fan-out plus the bespoke op;
  *
  * and is driven by the real CLI (`bulk run`, main.py:29-33's
  * `pl.run()`), so the run writes the same numbered jobLog files the
  * reference's committed logs came from.
  */
object ExampleApp {

  /** dfl_example.py's exampleDataflow: read the extracted table, make
    * it unique, land it in the transform layer under its target name.
    */
  def exampleDataflow(spark: SparkSession, conf: GraftConf): Unit = {
    val dfl = new DataFlow(spark, "Example dataflow", conf)
    dfl.read("example_table_name", Layer.EXT)
    dfl.dedupe("example_table_name")
    dfl.write("example_table_name", "trg_dm_example", Layer.TRN,
      keepDataflowOpen = false)
  }

  /** Master-data mapping leg (the reference's dfl_mdm.py surface over
    * its GSheet worksheet, rendered as the `mdm_segment` CSV source):
    * each row's `segment` resolves to its master segment via
    * `mapMasterData`; the mapped table, the write-back (distinct combos
    * + occurrence counts — what the reference writes back to the
    * mapping sheet), and the unmapped rows all land in TRN.
    */
  def mdmDataflow(spark: SparkSession, conf: GraftConf): Unit = {
    val dfl = new DataFlow(spark, "MDM dataflow", conf)
    dfl.read("example_table_name", Layer.EXT)
    dfl.read("mdm_segment", Layer.EXT)
    // the mapping rides in through the default extract, so it carries
    // audit columns that would collide with the data's in the MDM join
    dfl.dropColumns("mdm_segment", dropAuditCols = true,
      colsToKeep = Seq("segment", "master_segment"))
    dfl.mapMasterData("example_table_name", "mdm_segment",
      joinCols = Seq("segment"), masterDataCols = Seq("master_segment"))
    dfl.write("example_table_name", "trg_dm_example_mapped", Layer.TRN)
    dfl.write("example_table_name_writeback", "mdm_segment_writeback",
      Layer.TRN, keepDataflowOpen = false)
  }

  /** The source system id the committed appConfig declares. */
  val SrcSys = "FILESYSTEM_EXAMPLE"

  /** The app's op set: default extract fan-out over every configured
    * source system + the bespoke dataflows. main.py schedules
    * exampleDataflow under EXTRACT_DATAFLOWS, but it READS the extracted
    * table — the reference runs bespoke extract dataflows after the
    * defaults sequentially, while this engine runs same-stage ops
    * concurrently, so the read-EXT dependency belongs behind the stage
    * barrier: Transform (which is what the op does — EXT in, TRN out).
    *
    * `example_delta_table` (unique natural key `id`) gets a DISPATCHING
    * extract in place of its default op: `bulk run` stages it with the
    * plain bulk extract, `delta run` classifies the fresh source read
    * against the staged copy (INSERT/UPDATE/DELETE slices to
    * `EXT/example_delta_table_delta`, staged state swapped in place) —
    * the reference's delta-extract design driven through the real CLI
    * verb surface.
    */
  def ops(spark: SparkSession, conf: GraftConf): Seq[PipelineOp] =
    Cli.defaultOps(spark, conf)
      .filterNot(_.name == "extract_example_delta_table") ++ Seq(
      PipelineOp("extract_example_delta_table", Stage.Extract,
        (sp, cf) =>
          if (cf.bulkOrDelta == "DELTA")
            graft.warehouse.StageExtract.deltaExtract(
              sp, cf, SrcSys, "example_delta_table", nkCols = Seq("id"))
          else
            graft.warehouse.StageExtract.bulkExtract(
              sp, cf, SrcSys, "example_delta_table", cf.bulkOrDelta,
              enumeratedName = true)),
      PipelineOp("dfl_example", Stage.Transform,
        (sp, cf) => exampleDataflow(sp, cf)),
      PipelineOp("dfl_mdm", Stage.Transform,
        (sp, cf) => mdmDataflow(sp, cf)))

  /** `python main.py bulk run` equivalent:
    * `runMain graft.examples.ExampleApp <appConfig.json> bulk run`.
    */
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ExampleApp <appConfig.json> [verbs...]")
    val plan = Cli.parse(args.tail.toSeq)
    val conf = GraftConfIO.fromFile(args.head)
    val spark = SparkSession.builder()
      .appName("graft-example-app")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try Cli.execute(spark, conf, plan, ops = ops(spark, conf))
    finally spark.stop()
  }
}
