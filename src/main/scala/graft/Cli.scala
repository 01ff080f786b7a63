package graft

import graft.catalog.Layer
import graft.pipeline.{Pipeline, PipelineOp, Stage}
import org.apache.spark.sql.SparkSession

/** Parsed run-control verbs — the reference's CLI argument set
  * (betl/logger/cliText.py:55-115) as a value the engine API consumes:
  * `bulk|delta` → [[GraftConf.bulkOrDelta]], the `no<stage>` family →
  * [[Pipeline]] skipStages, `limitdata` → [[GraftConf.dataLimitRows]],
  * `rebuild*`/`reset`/`readsrc` → [[Admin]] verbs, `run` → execute.
  */
case class CliPlan(
    bulkOrDelta: String = "BULK",
    run: Boolean = false,
    runOp: Option[String] = None,
    skipStages: Set[Stage] = Set.empty,
    limitData: Option[Int] = None,
    rebuildLayers: Seq[Layer] = Seq.empty,
    readSrc: Boolean = false,
    reset: Boolean = false,
    help: Boolean = false,
    dbWrite: Boolean = true,
    clearTmpData: Boolean = false,
    runTests: Boolean = true,
    logLevel: Option[String] = None)

/** CLI verb parsing + execution binding. The reference processes these
  * args into conf ctrl flags at startup (cliText.py HELP block); here
  * [[Cli.parse]] is a pure function so every verb combination is
  * spec-testable without a session, and [[Cli.execute]] applies the
  * admin-verbs-then-run order.
  *
  * Deliberately absent from the reference verb set: `faillast` (marks
  * the previous execution FAILED in the reference's exec-state DB,
  * cliText.py:103-104) — this engine keeps no execution-state table to
  * mark (step history is append-only timings), so the verb is rejected
  * rather than silently accepted.
  */
object Cli {

  /** The `limitdata` row cap (reference cliText.py:53). */
  val DataLimitRows = 100

  val helpText: String =
    """graft run-control verbs (reference betl CLI parity):
      |  reset                   wipe the warehouse (all data lost)
      |  readsrc                 introspect source-system schemas into the
      |                          catalog (and schema file when configured)
      |  rebuildall | rebuildext | rebuildtrn | rebuildlod | rebuildbse |
      |  rebuildsum              drop a layer's physical tables
      |  bulk | delta            load mode (default bulk)
      |  run                     execute the pipeline
      |  runop <opId>            execute exactly ONE pipeline op — the
      |                          per-task entry an external scheduler
      |                          (e.g. the generated Airflow DAG) invokes
      |                          in its own process; ordering is the
      |                          scheduler's job, no stage barriers apply
      |  noextract | notransform | noload | nosummarise
      |                          skip a whole stage
      |  nodmload | noftload     skip just the dimension / fact loads
      |  limitdata               cap every source read at 100 rows
      |  nodbwrite               do not push BSE/SUM to the TRG sink
      |  cleartmpdata            drop the ETL-side layers (EXT/TRN/LOD)
      |                          before executing
      |  notests                 advisory: skip app-level data tests
      |  loginfo|logdebug|logerror|nowarnings
      |                          console log level
      |  help                    this text
      |usage: graft.Main <appConfig.json> [verbs...]""".stripMargin

  def parse(args: Seq[String]): CliPlan = {
    // `runop` consumes the NEXT token as its op id (case preserved —
    // op names are app identifiers, not verbs); everything else is a
    // single case-insensitive verb
    val (runOpId, rest) = {
      val i = args.indexWhere(_.toLowerCase == "runop")
      if (i < 0) (None, args)
      else if (i == args.length - 1) throw new IllegalArgumentException(
        s"runop needs an op id\n$helpText")
      else (Some(args(i + 1)),
        args.patch(i, Seq.empty, 2))
    }
    rest.foldLeft(CliPlan(runOp = runOpId)) { (p, raw) =>
      raw.toLowerCase match {
        case "bulk"        => p.copy(bulkOrDelta = "BULK")
        case "delta"       => p.copy(bulkOrDelta = "DELTA")
        case "run"         => p.copy(run = true)
        case "noextract"   => p.copy(skipStages = p.skipStages + Stage.Extract)
        case "notransform" => p.copy(skipStages = p.skipStages + Stage.Transform)
        case "noload" =>
          p.copy(skipStages = p.skipStages + Stage.LoadDim + Stage.LoadFact)
        case "nodmload"    => p.copy(skipStages = p.skipStages + Stage.LoadDim)
        case "noftload"    => p.copy(skipStages = p.skipStages + Stage.LoadFact)
        case "nosummarise" => p.copy(skipStages = p.skipStages + Stage.Summarise)
        case "limitdata"   => p.copy(limitData = Some(DataLimitRows))
        case "rebuildall"  => p.copy(rebuildLayers = Layer.all)
        case "rebuildext" =>
          p.copy(rebuildLayers = (p.rebuildLayers :+ Layer.EXT).distinct)
        case "rebuildtrn" =>
          p.copy(rebuildLayers = (p.rebuildLayers :+ Layer.TRN).distinct)
        case "rebuildlod" =>
          p.copy(rebuildLayers = (p.rebuildLayers :+ Layer.LOD).distinct)
        case "rebuildbse" =>
          p.copy(rebuildLayers = (p.rebuildLayers :+ Layer.BSE).distinct)
        case "rebuildsum" =>
          p.copy(rebuildLayers = (p.rebuildLayers :+ Layer.SUM).distinct)
        case "readsrc"     => p.copy(readSrc = true)
        case "reset"       => p.copy(reset = true)
        case "help"        => p.copy(help = true)
        // reference ctrl extras (cliText.py:81-104): nodbwrite drops the
        // TRG sink push; cleartmpdata clears the ETL-side layers (the
        // reference's tmp-data dir holds exactly those — BSE/SUM live
        // in the TRG DB); notests is advisory (app code reads the flag;
        // the engine schedules no tests itself); log verbs set the
        // session log level
        case "nodbwrite"    => p.copy(dbWrite = false)
        case "cleartmpdata" => p.copy(clearTmpData = true)
        case "notests"      => p.copy(runTests = false)
        case "loginfo"      => p.copy(logLevel = Some("INFO"))
        case "logdebug"     => p.copy(logLevel = Some("DEBUG"))
        case "logerror"     => p.copy(logLevel = Some("ERROR"))
        case "nowarnings"   => p.copy(logLevel = Some("ERROR"))
        case other => throw new IllegalArgumentException(
          s"unknown verb '$other'\n$helpText")
      }
    }
  }

  /** Fold the run-control flags into the conf: `limitdata` beats the
    * config-file cap; `bulk|delta` sets the load mode ops read.
    */
  def applyToConf(conf: GraftConf, plan: CliPlan): GraftConf = conf.copy(
    dataLimitRows = plan.limitData.orElse(conf.dataLimitRows),
    bulkOrDelta = plan.bulkOrDelta,
    trgSink = if (plan.dbWrite) conf.trgSink else None)

  /** Execute the plan: admin verbs first in the destructive-to-
    * constructive order reset → rebuild → readsrc, then the pipeline when
    * `run` was given. Returns the effective conf (with run-control flags
    * applied) so callers compose further steps against it.
    */
  def execute(
      spark: SparkSession, conf0: GraftConf, plan: CliPlan,
      ops: Seq[PipelineOp] = Seq.empty,
      schemaFile: Option[String] = None,
      parallelism: Int = 1): GraftConf = {
    val conf = applyToConf(conf0, plan)
    plan.logLevel.foreach(l => spark.sparkContext.setLogLevel(l))
    if (plan.reset) Admin.reset(spark, conf)
    if (plan.clearTmpData)
      Admin.rebuild(spark, conf, Seq(Layer.EXT, Layer.TRN, Layer.LOD))
    if (plan.rebuildLayers.nonEmpty)
      Admin.rebuild(spark, conf, plan.rebuildLayers)
    if (plan.readSrc) conf.srcSystems.keys.toSeq.sorted.foreach { src =>
      schemaFile match {
        case Some(f) => Admin.readSrcToFile(spark, conf, src, f)
        case None    => Admin.readSrc(spark, conf, src)
      }
    }
    // runop: exactly one op in THIS process — the scheduler-task entry
    // (ordering is the caller's job, so no stage barriers and no
    // sibling ops execute)
    plan.runOp.foreach(
      new Pipeline(conf, ops, parallelism, plan.skipStages).runOp(spark, _))
    if (plan.run)
      new Pipeline(conf, ops, parallelism, plan.skipStages).run(spark)
    conf
  }

  /** The default op set a bare `graft.Main <conf> run` executes: one
    * extract per enumerable table of every configured source system (the
    * reference's default-extract fan-out, betl/defaultdataflows/
    * stageExtract semantics). Transform/load ops are app code — apps
    * embed [[Cli]] with their own ops for those stages.
    */
  def defaultOps(spark: SparkSession, conf: GraftConf): Seq[PipelineOp] =
    conf.srcSystems.keys.toSeq.sorted.flatMap { src =>
      graft.warehouse.StageExtract.defaultExtractOps(spark, conf, src)
    }
}

/** `spark-submit --class graft.Main` entry point: config file + verbs. */
object Main {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { System.err.println(Cli.helpText); sys.exit(2) }
    // parse errors are a usage problem, not a crash: message + exit 2,
    // never a stack trace
    val plan =
      try Cli.parse(args.tail.toSeq)
      catch { case e: IllegalArgumentException =>
        System.err.println(e.getMessage); sys.exit(2); return
      }
    if (plan.help) { println(Cli.helpText); return }
    val conf = GraftConfIO.fromFile(args.head)
    val spark = SparkSession.builder()
      .appName("graft")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try {
      // readsrc writes next to the config file, mirroring the reference's
      // schema-desc refresh target (admin.py:364-474)
      val schemaFile = Option(java.nio.file.Paths.get(args.head).getParent)
        .getOrElse(java.nio.file.Paths.get("."))
        .resolve("warehouse_schema.json").toString
      // defaultOps enumerates every source system's tables (opening JDBC
      // connections for DB sources) — build it only when an op will
      // actually execute, so admin-only verbs (reset, rebuild*, readsrc)
      // never block on a slow or unreachable source
      val ops = if (plan.run || plan.runOp.nonEmpty)
        Cli.defaultOps(spark, conf) else Seq.empty[PipelineOp]
      // an unknown runop id is a usage error like an unknown verb:
      // message + exit 2, never a stack trace — validated here, before
      // execute, because the op set itself needs the session to enumerate
      plan.runOp.filterNot(id => ops.exists(_.name == id)).foreach { id =>
        System.err.println(s"runop: unknown op '$id' (known: " +
          s"${ops.map(_.name).sorted.mkString(", ")})")
        spark.stop(); sys.exit(2)
      }
      Cli.execute(spark, conf, plan,
        ops = ops,
        schemaFile = Some(schemaFile),
        parallelism = 4)
    } finally spark.stop()
  }
}
