package graft

/** Persisted per-step durations and the step-variance report — the last
  * reference logging artifact (betl/logger/LoggerClass.py:627-650
  * declares logVariancesReport / logNoVariancesReported /
  * logSomeVariancesReported but never computes the variances; the
  * computation here is that dormant design made real).
  *
  * History is a JSONL file (one line per step per execution). A report
  * compares the current run's step durations against the PRIOR runs'
  * per-step mean and flags steps more than `limit` standard deviations
  * out. The deviation floor (5% of the mean, min 1ms) keeps zero-variance
  * histories from flagging microsecond jitter as infinite sigmas.
  */
object StepHistory {

  /** One step execution: identity is (dataflow, seq, op). */
  final case class StepTiming(
      dataflow: String, op: String, seq: Int, seconds: Double) {
    def key: String = s"$dataflow/$seq/$op"
  }

  final case class StepVariance(
      key: String, seconds: Double, priorRuns: Int, priorMean: Double,
      priorStd: Double, sigmas: Double)

  /** Minimum prior runs before a step can be judged. */
  val MinPriorRuns = 3

  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** Append one execution's step durations to the history file. */
  def append(path: String, execId: String, steps: Seq[StepTiming]): Unit = {
    val p = java.nio.file.Paths.get(path)
    Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
    val lines = steps.map(t =>
      s"""{"exec":"${esc(execId)}","key":"${esc(t.key)}",""" +
        s""""seconds":${t.seconds}}""").mkString("", "\n", "\n")
    java.nio.file.Files.write(p, lines.getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
  }

  /** Inverse of [[esc]]: keys containing quotes/backslashes/control
    * chars must round-trip to the SAME string or varianceReport's
    * prior-run lookup silently never matches them.
    */
  private def unesc(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\\' && i + 1 < s.length) s.charAt(i + 1) match {
        case '"'  => sb += '"'; i += 2
        case '\\' => sb += '\\'; i += 2
        case 'n'  => sb += '\n'; i += 2
        case 'u' if i + 5 < s.length =>
          sb += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar
          i += 6
        case c => sb += '\\'; sb += c; i += 2
      } else { sb += s.charAt(i); i += 1 }
    }
    sb.result()
  }

  /** (execId, stepKey, seconds) triples from the history file. Fields
    * match lazily and exclude unescaped quotes (an escaped quote is the
    * two-char sequence `\"`, which the char class admits), so values
    * containing `","key":"` cannot shift the field boundaries.
    */
  def load(path: String): Seq[(String, String, Double)] = {
    val p = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(p)) return Nil
    val field = """(?:[^"\\]|\\.)*"""
    val line =
      ("""\{"exec":"(""" + field + """)","key":"(""" + field +
        """)","seconds":([-0-9.eE]+)\}""").r
    scala.io.Source.fromFile(path, "UTF-8").getLines().toSeq.collect {
      case line(e, k, s) => (unesc(e), unesc(k), s.toDouble)
    }
  }

  /** Steps of `current` whose duration sits more than `limit` standard
    * deviations from their prior-run mean. Steps with fewer than
    * [[MinPriorRuns]] prior observations are not judged.
    */
  def varianceReport(path: String, current: Seq[StepTiming],
      limit: Double = 2.0): Seq[StepVariance] = {
    val prior = load(path).groupBy(_._2)
      .view.mapValues(_.map(_._3)).toMap
    current.flatMap { t =>
      prior.get(t.key).filter(_.size >= MinPriorRuns).flatMap { xs =>
        val n = xs.size
        val mean = xs.sum / n
        val variance = xs.map(x => (x - mean) * (x - mean)).sum / n
        val sd = math.max(math.sqrt(variance),
          math.max(0.05 * math.abs(mean), 0.001))
        val sigmas = math.abs(t.seconds - mean) / sd
        if (sigmas > limit)
          Some(StepVariance(t.key, t.seconds, n, mean, math.sqrt(variance),
            sigmas))
        else None
      }
    }
  }

  /** Report-then-record in one call: flag the current run against prior
    * history, then append it — the bracket an application runs at
    * pipeline end. Returns the flagged variances (also logged, mirroring
    * the reference's logSome/logNoVariancesReported messages).
    */
  def reportAndRecord(path: String, execId: String,
      steps: Seq[StepTiming], limit: Double = 2.0): Seq[StepVariance] = {
    val log = org.slf4j.LoggerFactory.getLogger("graft.steps")
    val flagged = varianceReport(path, steps, limit)
    if (flagged.isEmpty)
      log.info(s"All step variances within $limit standard deviations " +
        "of the prior average")
    else flagged.foreach { v =>
      log.warn(f"[variance] ${v.key}: ${v.seconds}%.3fs vs prior mean " +
        f"${v.priorMean}%.3fs (${v.sigmas}%.1f sigmas over " +
        f"${v.priorRuns} runs)")
    }
    append(path, execId, steps)
    flagged
  }
}
