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

  test("cli parse: runop consumes its op id, case-preserved") {
    assert(Cli.parse(Seq("bulk", "runop", "extract_People")).runOp
      .contains("extract_People"))
    assert(Cli.parse(Seq("RUNOP", "x", "limitdata")) ==
      CliPlan(runOp = Some("x"), limitData = Some(100)))
    intercept[IllegalArgumentException](Cli.parse(Seq("runop")))
  }

  test("cli execute: runop runs exactly the named op, no siblings") {
    implicit val c: GraftConf = tmpConf()
    val ran = scala.collection.mutable.ArrayBuffer.empty[String]
    def op(name: String, st: Stage) =
      PipelineOp(name, st, (_, _) => ran.synchronized { ran += name; () })
    val ops = Seq(op("e", Stage.Extract), op("t", Stage.Transform))
    Cli.execute(spark, c, Cli.parse(Seq("runop", "t")), ops)
    assert(ran.toSeq == Seq("t"))
    intercept[IllegalArgumentException](
      Cli.execute(spark, c, Cli.parse(Seq("runop", "nope")), ops))
  }

  private def javaBin: String = java.nio.file.Paths
    .get(sys.props("java.home"), "bin", "java").toString

  private def runChild(args: Seq[String]): (Int, String) = {
    val pb = new ProcessBuilder(args: _*)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    (p.waitFor(), out)
  }

  test("generated DAG tasks execute process-per-task via runop") {
    import graft.pipeline.AirflowDagGen
    // the closest sandbox analogue to Airflow's contract
    // (betl/PipelineClass.py:493-514): the emitted DAG file's OWN edges
    // drive the ordering, and every task is one `runop <opId>` in its
    // own JVM process rebinding the app op set (ChildOpMain)
    val markerDir = java.nio.file.Files
      .createTempDirectory("cli-proc").toString
    val ops = ChildOpMain.ops(markerDir)
    val pipe = new graft.pipeline.Pipeline(tmpConf(), ops)
    val (stages, edges) =
      AirflowDagGen.parse(AirflowDagGen.generate(pipe.dagJson, "proc"))
    // Kahn topological order over the parsed file's edge list
    val order = scala.collection.mutable.ArrayBuffer.empty[String]
    val remaining = scala.collection.mutable.Set(stages.keys.toSeq: _*)
    while (remaining.nonEmpty) {
      val free = remaining.filter(n =>
        !edges.exists { case (u, d) => d == n && remaining.contains(u) })
      assert(free.nonEmpty, "cycle in generated DAG")
      free.toSeq.sorted.foreach { n => order += n; remaining -= n }
    }
    val cp = sys.props("java.class.path")
    order.foreach { name =>
      val (code, out) = runChild(Seq(
        javaBin, "-cp", cp, "graft.ChildOpMain", markerDir, name))
      assert(code == 0, s"child task $name failed:\n$out")
    }
    // every op ran exactly once, each in its own (distinct, non-parent)
    // process
    val pids = ops.map { o =>
      val lines = java.nio.file.Files
        .readAllLines(java.nio.file.Paths.get(markerDir, o.name))
      assert(lines.size == 1, s"${o.name} ran ${lines.size} times")
      lines.get(0).toLong
    }
    assert(pids.distinct.size == ops.size)
    assert(!pids.contains(ProcessHandle.current().pid()))
  }

  test("graft.Main runop drives one real extract in a child JVM; usage errors exit 2") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cli-main").toString
    Seq((1L, "x"), (2L, "y")).toDF("id", "v")
      .write.parquet(s"$dir/people.parquet")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/appConfig.json"),
      s"""{"warehousePath": "$dir/wh",
         |"srcSystems": {"SRC": {"type": "parquet", "dir": "$dir"}}}"""
        .stripMargin)
    val cp = sys.props("java.class.path")
    def mainArgs(verbs: String*): Seq[String] = Seq(javaBin, "-cp", cp,
      "-Dspark.master=local[2]", "-Dspark.ui.enabled=false",
      s"-Dderby.stream.error.file=$dir/derby.log",
      "graft.Main", s"$dir/appConfig.json") ++ verbs
    val (code, out) = runChild(mainArgs("bulk", "runop", "extract_people"))
    assert(code == 0, s"graft.Main runop failed:\n$out")
    assert(spark.read.parquet(s"$dir/wh/EXT/people").count() == 2)
    // unknown verb: help text + exit 2, no stack trace (and no Spark
    // startup cost — the parse rejects before the session builds)
    val (code2, out2) = runChild(mainArgs("frobnicate"))
    assert(code2 == 2, s"expected exit 2, got $code2:\n$out2")
    assert(out2.contains("unknown verb 'frobnicate'"))
    assert(!out2.contains("Exception"))
  }
}
