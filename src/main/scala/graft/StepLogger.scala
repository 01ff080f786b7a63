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

  def step[T](op: String, detail: String = "")(body: => T)(
      result: T => Option[DataFrame] = (_: T) => None): T = {
    stepSeq += 1
    val t0 = System.nanoTime()
    log.info(s"[$dataflowDesc] step $stepSeq START $op $detail")
    val out = body
    val elapsed = (System.nanoTime() - t0) / 1e9
    recorded +=
      StepHistory.StepTiming(dataflowDesc, op, stepSeq, elapsed)
    val shape =
      if (debugCounts)
        result(out).map(df => s" rows=${df.count()} cols=${df.columns.length}")
          .getOrElse("")
      else ""
    log.info(f"[$dataflowDesc] step $stepSeq END   $op ($elapsed%.3fs)$shape")
    out
  }

  /** Durations recorded so far — feed [[StepHistory.reportAndRecord]]
    * at dataflow close to get the variance report over prior runs.
    */
  def timings: Seq[StepHistory.StepTiming] = recorded.toSeq
}
