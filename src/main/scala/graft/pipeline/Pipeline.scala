package graft.pipeline

import graft.GraftConf
import org.apache.spark.sql.SparkSession

import java.util.concurrent.Executors
import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}

/** Pipeline stages, executed in this order (reference
  * betl/PipelineClass.py:61-420): Extract → Transform → Load(dims) →
  * Load(facts) → Summarise. Dimension loads strictly precede fact loads —
  * the fact FK resolution joins need the SK/NK maps
  * (PipelineClass.py:203-296).
  */
sealed abstract class Stage(val order: Int, val name: String)
object Stage {
  case object Extract extends Stage(0, "EXTRACT")
  case object Transform extends Stage(1, "TRANSFORM")
  case object LoadDim extends Stage(2, "LOAD_DIM")
  case object LoadFact extends Stage(3, "LOAD_FACT")
  case object Summarise extends Stage(4, "SUMMARISE")
  val all: Seq[Stage] = Seq(Extract, Transform, LoadDim, LoadFact, Summarise)
}

/** One pipeline node: a named function over the session. The reference
  * wraps these in Airflow PythonOperators or calls them immediately
  * (PipelineClass.py:456-486); here the same Seq can be executed in-process
  * or exported to any scheduler.
  */
case class PipelineOp(
    name: String, stage: Stage, run: (SparkSession, GraftConf) => Unit)

/** Stage-ordered pipeline executor. Within a stage, ops are independent by
  * construction (per-table extracts, per-dim loads — mirroring the
  * reference's parallel Airflow branches) and run concurrently on a small
  * driver thread pool: Spark's scheduler interleaves their jobs across
  * executors, which keeps the cluster busy when a single op can't.
  *
  * Run-stage flags mirror the reference's RUN_EXTRACT/TRANSFORM/LOAD/
  * SUMMARISE ctrl args (betl/ConfClass.py:64-249).
  */
class Pipeline(
    conf: GraftConf,
    ops: Seq[PipelineOp],
    parallelism: Int = 1,
    skipStages: Set[Stage] = Set.empty) {

  private val log = org.slf4j.LoggerFactory.getLogger("graft.pipeline")

  /** Scheduler-export hook — the op graph the reference binds to Airflow
    * PythonOperators (betl/PipelineClass.py:456-514), as scheduler-neutral
    * JSON: every op is a node `(name, stage)`, and edges encode the stage
    * barriers (each op depends on every op of the previous non-empty,
    * non-skipped stage — the same upstream wiring the reference builds
    * between its per-stage operator groups). Any scheduler rehydrates
    * this into its own DAG; in-process `run` executes the identical
    * graph.
    */
  def dagJson: String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    val nodes = root.putArray("nodes")
    val active = Stage.all.filterNot(skipStages.contains)
      .map(st => st -> ops.filter(_.stage == st))
      .filter(_._2.nonEmpty)
    active.foreach { case (st, stageOps) =>
      stageOps.foreach { op =>
        val n = nodes.addObject()
        n.put("name", op.name)
        n.put("stage", st.name)
      }
    }
    val edges = root.putArray("edges")
    active.sliding(2).foreach {
      case Seq((_, upstream), (_, downstream)) =>
        for (u <- upstream; d <- downstream) {
          val e = edges.addObject()
          e.put("upstream", u.name)
          e.put("downstream", d.name)
        }
      case _ => ()
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  /** Write [[dagJson]] to a file. */
  def exportDag(path: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.write(p, dagJson.getBytes("UTF-8"))
  }

  /** Run exactly ONE op by name — the entry a generated Airflow task
    * reaches via `spark-submit ... --run-op <name>`
    * ([[AirflowDagGen]]); ordering is the scheduler's job there, so no
    * stage barriers apply.
    */
  def runOp(spark: SparkSession, name: String): Unit =
    ops.find(_.name == name) match {
      case Some(op) => op.run(spark, conf)
      case None => throw new IllegalArgumentException(
        s"runOp: unknown op '$name' (known: " +
          s"${ops.map(_.name).sorted.mkString(", ")})")
    }

  def run(spark: SparkSession): Unit = {
    Stage.all.filterNot(skipStages.contains).foreach { stage =>
      // load-stage setup: on a JDBC TRG sink, drop fact/summary FK
      // constraints + indexes before any dimension truncate (reference
      // dropFactFKConstraints as the load stage's first task,
      // stageLoad.py:96-131; no-op for Parquet/other sinks)
      if (stage == Stage.LoadDim)
        graft.warehouse.StageLoad.dropTrgSinkIndexes(conf)
      val stageOps = ops.filter(_.stage == stage)
      if (stageOps.nonEmpty) {
        log.info(s"[pipeline] stage ${stage.name}: " +
          s"${stageOps.map(_.name).mkString(", ")}")
        if (parallelism <= 1 || stageOps.size == 1) {
          stageOps.foreach(op => op.run(spark, conf))
        } else {
          val pool = Executors.newFixedThreadPool(
            math.min(parallelism, stageOps.size))
          implicit val ec: ExecutionContext =
            ExecutionContext.fromExecutorService(pool)
          try {
            val fs = stageOps.map(op => Future(op.run(spark, conf)))
            Await.result(Future.sequence(fs), Duration.Inf)
          } finally pool.shutdown()
        }
      }
    }
  }
}
