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

  /** The app's op set: default extract fan-out over every configured
    * source system + the bespoke dataflow. main.py schedules
    * exampleDataflow under EXTRACT_DATAFLOWS, but it READS the extracted
    * table — the reference runs bespoke extract dataflows after the
    * defaults sequentially, while this engine runs same-stage ops
    * concurrently, so the read-EXT dependency belongs behind the stage
    * barrier: Transform (which is what the op does — EXT in, TRN out).
    */
  def ops(spark: SparkSession, conf: GraftConf): Seq[PipelineOp] =
    Cli.defaultOps(spark, conf) :+
      PipelineOp("dfl_example", Stage.Transform,
        (sp, cf) => exampleDataflow(sp, cf))

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
