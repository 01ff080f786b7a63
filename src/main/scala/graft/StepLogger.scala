package graft

import org.apache.spark.sql.DataFrame

/** Per-step logging with elapsed time, mirroring the reference's
  * stepStart/stepEnd bracket around every dataflow operation
  * (betl/dataflow/DataFlowClass.py:68-103, betl/logger/LoggerClass.py:523-556).
  *
  * The reference is eager pandas so it can report row counts for free; we
  * stay lazy and only count when `debugCounts` is enabled — identical
  * observability, zero extra jobs in production.
  */
class StepLogger(dataflowDesc: String, debugCounts: Boolean) extends Serializable {
  @transient private lazy val log =
    org.slf4j.LoggerFactory.getLogger("graft.dataflow")
  private var stepSeq = 0
  private val recorded =
    scala.collection.mutable.ArrayBuffer.empty[StepHistory.StepTiming]

  private def hhmmss(): String = java.time.LocalTime.now()
    .format(java.time.format.DateTimeFormatter.ofPattern("HH:mm:ss"))

  // reference-format job log, accumulated alongside the slf4j lines
  // (LoggerClass.py logDFStart/logStepStart/logStepEnd shapes); frame
  // descriptions ride the same debugCounts gate as the shape suffix
  private val jobLog = new StringBuilder(JobLog.dataflowHeader(
    "STAGE NOT SET", "graft.DataFlow", hhmmss(), dataflowDesc))

  def step[T](op: String, detail: String = "")(body: => T)(
      result: T => Option[DataFrame] = (_: T) => None): T = {
    stepSeq += 1
    val t0 = System.nanoTime()
    val started = hhmmss()
    log.info(s"[$dataflowDesc] step $stepSeq START $op $detail")
    val out = body
    val elapsed = (System.nanoTime() - t0) / 1e9
    recorded +=
      StepHistory.StepTiming(dataflowDesc, op, stepSeq, elapsed)
    val described =
      if (debugCounts) result(out).map(df => JobLog.describe(df, None))
      else None
    val shape = described
      .map(d => s" rows=${d.rows} cols=${d.cols.size + d.nAuditCols}")
      .getOrElse("")
    jobLog.append(JobLog.stepBlock(op,
      Some(detail).filter(_.nonEmpty), started, elapsed,
      report = None, output = described))
    log.info(f"[$dataflowDesc] step $stepSeq END   $op ($elapsed%.3fs)$shape")
    out
  }

  /** Durations recorded so far — feed [[StepHistory.reportAndRecord]]
    * at dataflow close to get the variance report over prior runs.
    */
  def timings: Seq[StepHistory.StepTiming] = recorded.toSeq

  /** The reference-format job log for this dataflow so far
    * ([[JobLog]] shapes): header box + one step block per op. Persist
    * with [[JobLog.writeNumbered]] for the reference's `NNNN_jobLog.log`
    * file convention.
    */
  def jobLogText: String = jobLog.toString
}
