package graft

import graft.pipeline.{PipelineOp, Stage}

/** Airflow-contract child entry: a scheduler task process re-imports the
  * app's module (which defines the op set) and executes exactly ONE op —
  * reference `PipelineClass.py:493-514` wraps each op in a
  * `PythonOperator` executed by an Airflow worker process. This is the
  * sandbox analogue: the parent test topologically orders the GENERATED
  * DAG file's tasks and spawns one JVM per task, each rebinding the same
  * deterministic op set and going through the `runop` CLI verb.
  *
  * Ops are pure-JVM marker writers (append one "pid" line per
  * execution), so per-task cost is JVM startup, not Spark startup; the
  * SparkSession handle is pass-through and never dereferenced by these
  * ops — the real-Spark `runop` path is covered by the `graft.Main`
  * child test.
  */
object ChildOpMain {
  def ops(markerDir: String): Seq[PipelineOp] = {
    def op(name: String, st: Stage) = PipelineOp(name, st, (_, _) => {
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(markerDir, name),
        ProcessHandle.current().pid().toString + "\n",
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
      ()
    })
    Seq(op("ext_a", Stage.Extract), op("trn_b", Stage.Transform),
      op("dim_c", Stage.LoadDim), op("ft_d", Stage.LoadFact))
  }

  def main(args: Array[String]): Unit = {
    val Array(markerDir, opName) = args
    val conf = GraftConf(warehousePath = markerDir + "/wh")
    Cli.execute(null, conf, Cli.parse(Seq("bulk", "runop", opName)),
      ops(markerDir))
    ()
  }
}
