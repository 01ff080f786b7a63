package graft

import graft.catalog.Layer
import graft.io.ParquetDatastore
import graft.pipeline.{PipelineOp, Stage}

/** The CLI verb surface (reference betl/logger/cliText.py:55-115) bound
  * onto GraftConf / Pipeline.skipStages / Admin.
  */
class CliSpec extends SparkSpec {

  test("cli parse maps every reference verb combination") {
    assert(Cli.parse(Seq("bulk", "run")) == CliPlan(run = true))
    assert(Cli.parse(Seq("delta", "run")) ==
      CliPlan(bulkOrDelta = "DELTA", run = true))
    // stage skips, including the compound noload
    assert(Cli.parse(Seq("run", "noextract", "nosummarise")).skipStages ==
      Set[Stage](Stage.Extract, Stage.Summarise))
    assert(Cli.parse(Seq("run", "noload")).skipStages ==
      Set[Stage](Stage.LoadDim, Stage.LoadFact))
    assert(Cli.parse(Seq("run", "nodmload")).skipStages ==
      Set[Stage](Stage.LoadDim))
    assert(Cli.parse(Seq("run", "noftload")).skipStages ==
      Set[Stage](Stage.LoadFact))
    // limitdata carries the reference's 100-row cap
    assert(Cli.parse(Seq("run", "limitdata")).limitData.contains(100))
    // rebuild verbs accumulate layers; rebuildall is everything
    assert(Cli.parse(Seq("rebuildall")).rebuildLayers == Layer.all)
    assert(Cli.parse(Seq("rebuildbse", "rebuildsum")).rebuildLayers ==
      Seq[Layer](Layer.BSE, Layer.SUM))
    assert(Cli.parse(Seq("reset")) == CliPlan(reset = true))
    assert(Cli.parse(Seq("readsrc")) == CliPlan(readSrc = true))
    assert(Cli.parse(Seq("help")).help)
    // verbs are case-insensitive like the reference's arg handling
    assert(Cli.parse(Seq("BULK", "RUN")).run)
    // ctrl extras: nodbwrite / cleartmpdata / notests / log levels
    assert(!Cli.parse(Seq("run", "nodbwrite")).dbWrite)
    assert(Cli.parse(Seq("run", "cleartmpdata")).clearTmpData)
    assert(!Cli.parse(Seq("run", "notests")).runTests)
    assert(Cli.parse(Seq("logdebug")).logLevel.contains("DEBUG"))
    assert(Cli.parse(Seq("nowarnings")).logLevel.contains("ERROR"))
    intercept[IllegalArgumentException](Cli.parse(Seq("frobnicate")))
  }

  test("cli applyToConf: limitdata and bulk/delta reach the conf ops read") {
    val base = tmpConf()
    val c1 = Cli.applyToConf(base, Cli.parse(Seq("delta", "run", "limitdata")))
    assert(c1.bulkOrDelta == "DELTA" && c1.dataLimitRows.contains(100))
    // config-file cap survives when limitdata absent
    val c2 = Cli.applyToConf(base.copy(dataLimitRows = Some(7)),
      Cli.parse(Seq("bulk", "run")))
    assert(c2.dataLimitRows.contains(7))
    // nodbwrite strips the configured TRG sink; default keeps it
    val sink = base.copy(trgSink = Some(ParquetDatastore("/tmp/x")))
    assert(Cli.applyToConf(sink,
      Cli.parse(Seq("run", "nodbwrite"))).trgSink.isEmpty)
    assert(Cli.applyToConf(sink, Cli.parse(Seq("run"))).trgSink.nonEmpty)
  }

  test("cli execute: stage skips drive the pipeline, admin verbs fire in order") {
    implicit val c: GraftConf = tmpConf()
    val ran = scala.collection.mutable.ArrayBuffer.empty[String]
    def op(name: String, st: Stage) =
      PipelineOp(name, st, (_, _) => ran.synchronized { ran += name; () })
    val ops = Seq(op("e", Stage.Extract), op("t", Stage.Transform),
      op("ld", Stage.LoadDim), op("lf", Stage.LoadFact),
      op("s", Stage.Summarise))

    Cli.execute(spark, c, Cli.parse(Seq("bulk", "run", "noextract", "noload")),
      ops)
    assert(ran.toSeq == Seq("t", "s"))

    ran.clear()
    Cli.execute(spark, c, Cli.parse(Seq("run", "nosummarise", "nodmload")), ops)
    assert(ran.toSeq == Seq("e", "t", "lf"))

    // no run verb → nothing executes
    ran.clear()
    Cli.execute(spark, c, Cli.parse(Seq("bulk")), ops)
    assert(ran.isEmpty)

    // reset wipes the warehouse; rebuildbse drops just that layer
    val f = new java.io.File(s"${c.warehousePath}/BSE/marker")
    f.getParentFile.mkdirs(); f.createNewFile()
    Cli.execute(spark, c, Cli.parse(Seq("rebuildbse")), ops)
    assert(!f.getParentFile.exists())
    // cleartmpdata clears ETL-side layers, leaves TRG-side alone
    val ext = new java.io.File(s"${c.warehousePath}/EXT/m")
    val bse = new java.io.File(s"${c.warehousePath}/BSE/m")
    ext.getParentFile.mkdirs(); ext.createNewFile()
    bse.getParentFile.mkdirs(); bse.createNewFile()
    Cli.execute(spark, c, Cli.parse(Seq("cleartmpdata")), ops)
    assert(!ext.getParentFile.exists() && bse.exists())
    f.getParentFile.mkdirs(); f.createNewFile()
    Cli.execute(spark, c, Cli.parse(Seq("reset")), ops)
    assert(!new java.io.File(c.warehousePath).exists())
  }

  test("cli readsrc introspects sources into the catalog and schema file") {
    val dir = java.nio.file.Files.createTempDirectory("cli-src").toString
    import spark.implicits._
    Seq((1L, "x")).toDF("id", "v").write.parquet(s"$dir/things.parquet")
    implicit val c: GraftConf = tmpConf().copy(
      srcSystems = Map("SRC" -> ParquetDatastore(dir)))
    val schemaFile = s"$dir/warehouse_schema.json"
    val eff = Cli.execute(spark, c, Cli.parse(Seq("readsrc")),
      schemaFile = Some(schemaFile))
    assert(eff.catalog.lookup(Layer.EXT, "things").exists(
      _.columnNames.containsSlice(Seq("id", "v"))))
    assert(new java.io.File(schemaFile).exists())
  }

  test("cli run path executes the default-extract pipeline end to end") {
    val dir = java.nio.file.Files.createTempDirectory("cli-run").toString
    import spark.implicits._
    (1L to 500L).map(i => (i, s"n$i")).toDF("id", "name")
      .write.parquet(s"$dir/people.parquet")
    implicit val c: GraftConf = tmpConf().copy(
      srcSystems = Map("SRC" -> ParquetDatastore(dir)))
    // bulk run limitdata: the extract lands in EXT, capped at 100 rows,
    // stamped BULK — the q_pipeline_default front half driven purely by
    // CLI verbs
    val eff = Cli.execute(spark, c, Cli.parse(Seq("bulk", "run", "limitdata")),
      ops = Cli.defaultOps(spark, c))
    val ext = spark.read.parquet(eff.tablePath(Layer.EXT, "people"))
    assert(ext.count() == 100)
    assert(ext.columns.contains(Audit.LatestLoadOperation))
    // delta verb routes the load-mode stamp the ops read from the conf
    val eff2 = Cli.execute(spark, c, Cli.parse(Seq("delta", "run")),
      ops = Cli.defaultOps(spark, c))
    assert(eff2.bulkOrDelta == "DELTA")
  }
}
