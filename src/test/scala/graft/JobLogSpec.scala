package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Reference jobLog format parity: the engine's rendered job log must
  * carry the same STRUCTURE as the reference's committed golden log
  * (betl-test/test_app/logs/0001_jobLog.log) — operation sequence,
  * Started/Completed bracket, parseable elapsed seconds, and Output
  * shapes. Sample values / timestamps / box cosmetics are per-run.
  */
object JobLogSpec {
  /** Reference checkout root: system property beats env var beats the
    * sandbox default (kept only when it actually exists on disk).
    */
  val referenceDir: Option[String] =
    sys.props.get("graft.reference.dir")
      .orElse(sys.env.get("GRAFT_REFERENCE_DIR"))
      .orElse(Some("/root/reference")
        .filter(p => new java.io.File(p).isDirectory))
}

class JobLogSpec extends SparkSpec {

  // resolved from GRAFT_REFERENCE_DIR (env or system property) so the
  // spec cancels cleanly on machines without the reference checkout
  // instead of hard-failing on a hardcoded absolute path
  private val goldenPath = JobLogSpec.referenceDir
    .map(_ + "/betl/betl-test/test_app/logs/0001_jobLog.log")

  /** The golden log: a live reference checkout wins (GRAFT_REFERENCE_DIR
    * / graft.reference.dir), else the VENDORED copy under
    * src/test/resources/golden — so the parity gate runs on clean
    * checkouts instead of silently cancelling (VERDICT r9 task 7).
    */
  private def golden: String = {
    val fromRef = goldenPath.filter(p =>
      java.nio.file.Files.isReadable(java.nio.file.Paths.get(p)))
    fromRef match {
      case Some(p) =>
        new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(p)), "UTF-8")
      case None =>
        val in = getClass.getResourceAsStream("/golden/0001_jobLog.log")
        assert(in != null,
          "vendored golden log missing from test resources")
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
    }
  }

  test("golden log parses into the expected step structure") {
    // first execution section of the golden file: createDataset (2x2),
    // renameColumns (2x2), getColumnList (no output) — repeated per
    // pytest run; parse the whole file and take the first three
    val steps = JobLog.parseSteps(golden).take(3)
    assert(steps.map(_.op) ==
      Seq("createDataset", "renameColumns", "getColumnList"))
    steps.foreach { s =>
      assert(s.started && s.seconds.exists(_ >= 0), s"bad bracket in $s")
    }
    assert(steps(0).shape.contains((2L, 2L)))
    assert(steps(1).shape.contains((2L, 2L)))
    assert(steps(2).shape.isEmpty)
  }

  test("engine jobLog structurally matches the golden run") {
    // replay the golden's dataflow: a 2-row 2-col dataset, a rename, a
    // column-list read — with debugCounts on so shapes render
    implicit val c: GraftConf = tmpConf().copy(debugCounts = true)
    val dfl = DataFlow(spark, "test dataflow")
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row("1", "a"), Row("2", "b")),
      StructType(Seq(StructField("col1", StringType),
        StructField("col2", StringType))))
    dfl.createDataset("testDataset", df)
    dfl.renameColumns("testDataset", Map("col1" -> "renamedCol1"))
    dfl.getColumnList("testDataset")
    val ours = JobLog.parseSteps(dfl.jobLogText)
    val gold = JobLog.parseSteps(golden).take(3)
    // same ops, same bracket, same output shapes
    assert(ours.map(_.op) == gold.map(_.op))
    (ours zip gold).foreach { case (o, g) =>
      assert(o.started == g.started)
      assert(o.seconds.isDefined == g.seconds.isDefined)
      assert(o.shape == g.shape, s"shape diverged on ${o.op}")
    }
    // the rendered text carries the reference box shapes: 65-char
    // header frame and the 55-dash step rule
    val lines = dfl.jobLogText.linesIterator.toSeq
    assert(lines.count(_ == "*" * 65) == 2)
    assert(lines.count(_.trim == "-" * 55) == 6)
    // Desc lines are quoted like the reference's
    assert(lines.exists(_.matches("""\s*\| Desc: "testDataset"""")))
  }

  test("numbered jobLog files follow the reference NNNN convention") {
    val dir = java.nio.file.Files.createTempDirectory("joblog").toString
    val p1 = JobLog.writeNumbered(dir, "one")
    val p2 = JobLog.writeNumbered(dir, "two")
    assert(p1.endsWith("0001_jobLog.log") && p2.endsWith("0002_jobLog.log"))
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(p2)), "UTF-8") == "two")
  }


  test("writeNumbered never reuses a number across a gap") {
    val dir = java.nio.file.Files.createTempDirectory("joblog").toString
    JobLog.writeNumbered(dir, "one")   // 0001
    JobLog.writeNumbered(dir, "two")   // 0002
    JobLog.writeNumbered(dir, "three") // 0003
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(dir, "0002_jobLog.log"))
    // count-based numbering would resolve to 0003 and clobber it;
    // max+1 must land on 0004
    val p = JobLog.writeNumbered(dir, "four")
    assert(p.endsWith("0004_jobLog.log"))
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "0003_jobLog.log")), "UTF-8") == "three")
  }

  test("describe counts audit cols separately and samples first row") {
    import spark.implicits._
    implicit val c: GraftConf = tmpConf()
    val df = Seq(("x", 1L), ("y", 2L)).toDF("name", "n")
      .withColumn(Audit.SourceSystem,
        org.apache.spark.sql.functions.lit("SRC"))
    val d = JobLog.describe(df, Some("t"))
    assert(d.rows == 2 && d.nAuditCols == 1)
    assert(d.cols.map(_._1) == Seq("name", "n"))
    assert(d.cols.head._2.contains("x"))
    val txt = JobLog.stepBlock("write", Some("d"), "12:00:00", 0.025,
      report = None, output = Some(d))
    assert(txt.contains("| Output: 2 rows, 2 cols (& 1 audit cols) [t]"))
    // python str(round()) rendering: 0.025 -> "0.02" (banker's) and a
    // trailing space before the newline, as the reference emits
    assert(txt.contains("| [Completed in: 0.02 seconds] \n"))
  }
}
