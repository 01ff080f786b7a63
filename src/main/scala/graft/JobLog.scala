package graft

import org.apache.spark.sql.DataFrame

/** Reference jobLog text rendering — the byte shapes of
  * `betl/logger/LoggerClass.py` (logBETLStart:40-48, logDFStart:484-509,
  * logStepStart:522-537, logStepEnd:539-554, describeDataFrame:567-625)
  * over this engine's [[StepLogger]] timings, so a graft run's job log
  * diffs structurally against the reference's committed golden logs
  * (`betl-test/test_app/logs/0001_jobLog.log`).
  *
  * Frame descriptions (row/col counts, first-row samples) are rendered
  * only when `debugCounts` is enabled — the reference is eager pandas
  * and gets shapes for free; this engine stays lazy and refuses to run
  * hidden count jobs in production.
  */
object JobLog {

  /** logBETLStart banner (LoggerClass.py:40-48) — byte-identical to the
    * reference's committed 0002_jobLog.log (a run that started and
    * logged nothing else).
    */
  val betlStartBanner: String =
    """
      |                  *****************************
      |                  *                           *
      |                  *       BETL Started        *
      |                  *                           *
      |                  *****************************
      |
      |""".stripMargin

  /** logDFStart header box (LoggerClass.py:484-509): 65-char starred
    * box, `stage | caller | HH:MM:SS` then the dataflow desc.
    */
  def dataflowHeader(
      stage: String, caller: String, startHHMMSS: String,
      desc: String): String = {
    val callstack = s"$stage | $caller | $startHHMMSS"
    val spacer = " " * math.max(0, 62 - callstack.length)
    val spacer2 = " " * math.max(0, 59 - desc.length)
    "\n" +
      ("*" * 65) + "\n" +
      "*" + (" " * 63) + "*\n" +
      s"* $callstack$spacer*\n" +
      s"*    $desc$spacer2*\n" +
      "*" + (" " * 63) + "*\n" +
      ("*" * 65) + "\n"
  }

  /** A described output frame: shape + per-column first-row samples
    * (audit columns counted separately and excluded from the listing,
    * describeDataFrame:567-605).
    */
  final case class FrameDesc(
      datasetName: Option[String], rows: Long,
      cols: Seq[(String, Option[String])], nAuditCols: Int)

  /** Collect a [[FrameDesc]] from a frame — two rows only (the sample
    * row plus the "is there more" probe); the count is the only full
    * job, and the caller gates this behind debugCounts.
    */
  def describe(df: DataFrame, datasetName: Option[String]): FrameDesc = {
    val audit = Audit.all.toSet
    val rows = df.count()
    val head = df.limit(1).collect().headOption
    val cols = df.columns.toSeq.filterNot(audit.contains).map { c =>
      c -> head.map(r => Option(r.get(r.fieldIndex(c)))
        .map(_.toString).getOrElse("None"))
    }
    FrameDesc(datasetName, rows, cols,
      df.columns.count(audit.contains))
  }

  private def renderDesc(d: FrameDesc): String = {
    val sb = new StringBuilder
    sb.append(s"   | Output: ${d.rows} rows, ${d.cols.size} cols")
    if (d.nAuditCols > 0) sb.append(s" (& ${d.nAuditCols} audit cols)")
    d.datasetName.foreach(n => sb.append(s" [$n]"))
    sb.append('\n')
    sb.append("   | Columns:\n")
    d.cols.foreach { case (name, sample) =>
      val shown =
        if (name.length > 30) name.take(30) + "--" else name
      sb.append(s"   |    $shown: ")
      sample.foreach(v => sb.append(v + ", "))
      if (d.rows > 1) sb.append("...")
      sb.append('\n')
    }
    sb.toString
  }

  /** Python `str(round(x, 2))` — "0.03", "3.0", "12.25". */
  private def py2(d: Double): String = {
    val r = BigDecimal(d)
      .setScale(2, scala.math.BigDecimal.RoundingMode.HALF_EVEN)
    val s = r.underlying.stripTrailingZeros.toPlainString
    if (s.contains('.')) s else s + ".0"
  }

  /** One full step block: logStepStart + logStepEnd
    * (LoggerClass.py:522-554).
    */
  def stepBlock(
      op: String, desc: Option[String], startHHMMSS: String,
      seconds: Double, report: Option[String],
      output: Option[FrameDesc]): String = {
    val sb = new StringBuilder
    sb.append('\n')
    sb.append("   -------------------------------------------------------\n")
    sb.append(s"   | Operation: $op\n")
    desc.filter(_.nonEmpty).foreach(d => sb.append(s"""   | Desc: "$d"\n"""))
    sb.append(s"   | [Started step: $startHHMMSS]\n")
    sb.append(s"   | [Completed in: ${py2(seconds)} seconds] \n")
    report.filter(_.nonEmpty).foreach(r => sb.append(s"   | Report: $r\n"))
    output.foreach(o => sb.append(renderDesc(o)))
    sb.append("   -------------------------------------------------------\n")
    sb.toString
  }

  /** Structural view of one step block — the golden-diff unit: the
    * operation name, whether a Desc line is present, the Output shape
    * when one was logged, and the elapsed seconds (which must parse).
    */
  final case class StepShape(
      op: String, hasDesc: Boolean, started: Boolean,
      seconds: Option[Double], shape: Option[(Long, Long)])

  private val OpRe = """\s*\| Operation: (\S+)\s*""".r
  private val DescRe = """\s*\| Desc: ".*"\s*""".r
  private val StartRe = """\s*\| \[Started step: \d\d:\d\d:\d\d\]\s*""".r
  private val DoneRe =
    """\s*\| \[Completed in: ([0-9.]+) seconds\]\s*""".r
  private val OutRe =
    """\s*\| Output: (\d+) rows, (\d+) cols(?: \(& \d+ audit cols\))?(?: \[.*\])?\s*""".r

  /** Parse jobLog text (this engine's or the reference golden's) into
    * step shapes. Sample values, dataset names and box drawing are
    * cosmetic; operation sequence, Started/Completed presence, elapsed
    * parseability and Output shapes are the structure under test.
    */
  def parseSteps(text: String): Seq[StepShape] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[StepShape]
    var cur: Option[StepShape] = None
    text.linesIterator.foreach {
      case OpRe(op) =>
        cur.foreach(out += _)
        cur = Some(StepShape(op, hasDesc = false, started = false,
          seconds = None, shape = None))
      case DescRe() => cur = cur.map(_.copy(hasDesc = true))
      case StartRe() => cur = cur.map(_.copy(started = true))
      case DoneRe(s) => cur = cur.map(_.copy(seconds = Some(s.toDouble)))
      case OutRe(r, c) =>
        cur = cur.map(_.copy(shape = Some((r.toLong, c.toLong))))
      case _ => ()
    }
    cur.foreach(out += _)
    out.toSeq
  }

  /** Per-JVM run logs: logsDir → the numbered file this run appends to.
    * The file is created with just the BETL-start banner (exactly the
    * reference's committed 0002_jobLog.log — a run that started and
    * logged nothing else), and every closing dataflow appends its
    * header + step blocks, mirroring the reference's one-file-per-
    * execution rotation (logger/__init__.py).
    */
  private val runFiles =
    new scala.collection.concurrent.TrieMap[String, String]()

  /** Append a dataflow's rendered job log to this run's numbered file
    * under `logsDir`, creating it (banner-first) on first use. Returns
    * the file path. Thread-safe: pipeline ops close in parallel.
    */
  def appendToRunLog(logsDir: String, text: String): String =
    synchronized {
      val f = runFiles.getOrElseUpdate(logsDir,
        writeNumbered(logsDir, betlStartBanner))
      java.nio.file.Files.write(java.nio.file.Paths.get(f),
        text.getBytes("UTF-8"), java.nio.file.StandardOpenOption.APPEND)
      f
    }

  /** Drop the run-file binding for `logsDir` so the NEXT append starts a
    * fresh numbered file — the "new execution" boundary (specs and
    * long-lived sessions driving several logical runs).
    */
  def endRun(logsDir: String): Unit = runFiles.remove(logsDir)

  /** Write a job log under the reference's numbered-file convention
    * (`NNNN_jobLog.log`, logger/__init__ file rotation). Returns the
    * path written.
    */
  def writeNumbered(logsDir: String, text: String): String = {
    val dir = java.nio.file.Paths.get(logsDir)
    java.nio.file.Files.createDirectories(dir)
    val NumRe = """(\d{4})_jobLog\.log""".r
    // max+1 (not count+1): a gap in the sequence must never resolve to
    // an existing file; CREATE_NEW + retry covers concurrent writers.
    var next = 1 + Option(dir.toFile.list()).map(_.collect {
      case NumRe(n) => n.toInt
    }.foldLeft(0)(math.max)).getOrElse(0)
    while (true) {
      val p = dir.resolve(f"$next%04d_jobLog.log")
      try {
        java.nio.file.Files.write(p, text.getBytes("UTF-8"),
          java.nio.file.StandardOpenOption.CREATE_NEW)
        return p.toString
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => next += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
