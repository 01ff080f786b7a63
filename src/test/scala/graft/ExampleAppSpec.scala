package graft

import graft.examples.ExampleApp

/** The reference's committed example application, end-to-end: the
  * `examples/test_app` fixture (appConfig.json + src_data, mirroring
  * betl-test/test_app's appConfig.ini + main.py + dfl_example.py) driven
  * through the REAL CLI surface (`bulk run`), producing numbered jobLog
  * files that structurally diff against BOTH committed reference logs
  * (0001 — step blocks; 0002 — the banner-only run).
  */
class ExampleAppSpec extends SparkSpec {

  /** Golden log `n`: live reference checkout if present, else the
    * vendored copy under src/test/resources/golden — the parity diffs
    * run on clean checkouts too (VERDICT r9 task 7).
    */
  private def goldenLog(n: String): Option[String] =
    JobLogSpec.referenceDir
      .map(_ + s"/betl/betl-test/test_app/logs/${n}_jobLog.log")
      .filter(p => java.nio.file.Files.isReadable(
        java.nio.file.Paths.get(p)))
      .map(p => new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(p)), "UTF-8"))
      .orElse {
        Option(getClass.getResourceAsStream(s"/golden/${n}_jobLog.log"))
          .map { in =>
            try scala.io.Source.fromInputStream(in, "UTF-8").mkString
            finally in.close()
          }
      }

  test("example app: CLI 'bulk run' extracts, dedupes, lands TRN, and " +
      "writes a reference-shaped numbered jobLog") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-example").toString
    // the committed config uses repo-relative paths; point the volatile
    // dirs (warehouse, logs) at the sandbox and keep the committed
    // source data
    val srcDir = new java.io.File(
      "examples/test_app/src_data").getAbsolutePath
    val cfg =
      s"""{
         |  "warehousePath": "$tmp/tmp_data",
         |  "logsPath": "$tmp/logs",
         |  "srcSystems": {
         |    "FILESYSTEM_EXAMPLE": {
         |      "type": "csv", "dir": "$srcDir", "delimiter": ","
         |    }
         |  }
         |}""".stripMargin
    val cfgPath = s"$tmp/appConfig.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(cfgPath),
      cfg.getBytes("UTF-8"))

    // main.py: pl = betl.pipeline(appConfigFile, scheduleConfig,
    // sys.argv); pl.run() — same surface, same verbs
    val conf = GraftConfIO.fromFile(cfgPath)
    val plan = Cli.parse(Seq("bulk", "run"))
    Cli.execute(spark, conf, plan, ops = ExampleApp.ops(spark, conf))

    // the extract landed every source row; the dataflow deduped them
    val ext = spark.read.parquet(s"$tmp/tmp_data/EXT/example_table_name")
    assert(ext.count() == 6)
    val trn = spark.read.parquet(s"$tmp/tmp_data/TRN/trg_dm_example")
    assert(trn.count() == 4, "dedupe must collapse the duplicate rows")

    // exactly one numbered run log, reference convention
    val logFile = java.nio.file.Paths.get(s"$tmp/logs/0001_jobLog.log")
    assert(java.nio.file.Files.isReadable(logFile),
      "run must write 0001_jobLog.log")
    val text = new String(
      java.nio.file.Files.readAllBytes(logFile), "UTF-8")

    // --- vs 0002: the banner-only golden is a byte-identical prefix
    goldenLog("0002").foreach { g2 =>
      assert(text.startsWith(g2),
        "run log must begin with the exact 0002 banner bytes")
    }

    // --- structure: the app's op sequence with full step brackets.
    // getDataFromSrc + write from the extract op; read + dedupe + write
    // from dfl_example (dataflows close in pipeline order)
    val steps = JobLog.parseSteps(text)
    assert(steps.map(_.op)
      .containsSlice(Seq("read", "dedupe", "write")),
      s"expected the dfl_example sequence, got ${steps.map(_.op)}")
    assert(steps.exists(_.op == "getDataFromSrc"))
    steps.foreach { s =>
      assert(s.started && s.seconds.exists(_ >= 0),
        s"incomplete step bracket: $s")
    }

    // --- vs 0001: our read and write blocks carry the same structural
    // bracket as the golden's read/write blocks (op line, Desc line,
    // Started, parseable Completed)
    goldenLog("0001").foreach { g1 =>
      val gold = JobLog.parseSteps(g1)
      for (op <- Seq("read", "write")) {
        val g = gold.find(_.op == op).get
        val o = steps.find(_.op == op).get
        assert(o.started == g.started && o.seconds.isDefined ==
          g.seconds.isDefined && o.hasDesc == g.hasDesc,
          s"$op block structure diverged from golden 0001")
      }
    }
    JobLog.endRun(s"$tmp/logs")
  }

  test("golden 0001's final execution section replays through the " +
      "engine op-for-op (createDataset → write → read → getColumnList)") {
    val g1 = goldenLog("0001")
    assume(g1.isDefined, "reference golden log not available")
    // the last BETL-run section of 0001: createDataset(2x2) → write
    // LOD.dm_test_dimension → read it back → getColumnList
    val sections = g1.get.split("""BETL Started""")
    val lastSteps = JobLog.parseSteps(sections.last)
    assert(lastSteps.map(_.op).endsWith(
      Seq("createDataset", "write", "read", "getColumnList")))

    implicit val c: GraftConf = tmpConf().copy(debugCounts = true)
    val dfl = DataFlow(spark, "test dataflow")
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row("1", "a"),
        org.apache.spark.sql.Row("2", "b")),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("col1",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("col2",
          org.apache.spark.sql.types.StringType))))
    dfl.createDataset("dm_test_dimension", df)
    dfl.write("dm_test_dimension", "dm_test_dimension",
      graft.catalog.Layer.LOD)
    dfl.read("dm_test_dimension", graft.catalog.Layer.LOD)
    dfl.getColumnList("dm_test_dimension")

    val ours = JobLog.parseSteps(dfl.jobLogText)
    val gold = lastSteps.takeRight(4)
    assert(ours.map(_.op) == gold.map(_.op))
    ours.zip(gold).foreach { case (o, g) =>
      assert(o.started == g.started, s"${o.op}: Started bracket diverged")
      assert(o.seconds.isDefined == g.seconds.isDefined,
        s"${o.op}: Completed bracket diverged")
      assert(o.shape == g.shape,
        s"${o.op}: output shape diverged (ours ${o.shape}, gold ${g.shape})")
    }
  }

  test("example app: MDM leg maps segments on 'bulk run', and a second " +
      "'delta run' classifies source changes through the CLI") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-example-delta").toString
    // copy the committed source data so the delta leg can mutate it
    val committed = new java.io.File(
      "examples/test_app/src_data").getAbsolutePath
    val srcDir = s"$tmp/src_data"
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(srcDir))
    for (f <- new java.io.File(committed).listFiles())
      java.nio.file.Files.copy(f.toPath,
        java.nio.file.Paths.get(srcDir, f.getName))
    val cfg =
      s"""{
         |  "warehousePath": "$tmp/tmp_data",
         |  "logsPath": "$tmp/logs",
         |  "srcSystems": {
         |    "FILESYSTEM_EXAMPLE": {
         |      "type": "csv", "dir": "$srcDir", "delimiter": ","
         |    }
         |  }
         |}""".stripMargin
    val cfgPath = s"$tmp/appConfig.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(cfgPath),
      cfg.getBytes("UTF-8"))
    val conf = GraftConfIO.fromFile(cfgPath)

    // ---- first invocation: bulk run (stages everything, runs MDM)
    Cli.execute(spark, conf, Cli.parse(Seq("bulk", "run")),
      ops = ExampleApp.ops(spark, conf))

    val mapped = spark.read.parquet(
      s"$tmp/tmp_data/TRN/trg_dm_example_mapped")
    val bySeg = mapped.select("segment", "master_segment").distinct()
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(bySeg("retail") == "Retail" && bySeg("wholesale") == "Wholesale")
    // 'direct' has no mapping row: master blanks to '' (GSheet parity)
    assert(bySeg("direct") == "")
    // write-back carries the distinct combos with occurrence counts —
    // including the unmapped 'direct' combo the user would fill in
    val wb = spark.read.parquet(s"$tmp/tmp_data/TRN/mdm_segment_writeback")
    assert(wb.columns.toSeq ==
      Seq("segment", "master_segment", "count"))
    assert(wb.where(org.apache.spark.sql.functions.col("segment")
      === "direct").count() == 1)

    // one CLI invocation = one execution = one numbered log; in-JVM the
    // boundary is explicit (a real app's JVM exits here)
    JobLog.endRun(s"$tmp/logs")

    // ---- mutate the delta source: id 2 changes, id 4 appears
    java.nio.file.Files.write(
      java.nio.file.Paths.get(srcDir, "example_delta_table.csv"),
      "id,code\n1,AA\n2,B2\n3,CC\n4,DD\n".getBytes("UTF-8"))

    // ---- second invocation: delta run through the same CLI surface
    Cli.execute(spark, conf, Cli.parse(Seq("delta", "run")),
      ops = ExampleApp.ops(spark, conf))

    import org.apache.spark.sql.functions.col
    val ext = spark.read.parquet(s"$tmp/tmp_data/EXT/example_delta_table")
    assert(ext.count() == 4, "staged state must carry the inserted row")
    assert(ext.where(col("id") === 2).select("code").collect()
      .head.getString(0) == "B2", "staged state must take the update")
    val delta = spark.read.parquet(
      s"$tmp/tmp_data/EXT/example_delta_table_delta")
    val opsById = delta.select("id", "delta_op").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(opsById == Map("2" -> "UPDATE", "4" -> "INSERT"),
      s"delta slices diverged: $opsById")
    // the second run appended its own numbered log
    assert(java.nio.file.Files.isReadable(
      java.nio.file.Paths.get(s"$tmp/logs/0002_jobLog.log")),
      "delta run must write 0002_jobLog.log")
  }
}
