package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, RDDScanExec, SparkPlan}

/** Structural gate for the flagship q_pipeline_llm composition: every
  * stage boundary must be a PERSISTED cut (eager localCheckpoint), so
  * the expensive stages — PPJoin near-dup, decontamination, DSIR —
  * execute exactly once no matter how many downstream consumers or
  * actions read the result. The proof is plan-shaped: after
  * construction, the returned frame's physical plan reads ONLY
  * checkpointed RDD scans — zero file-source scans — so no action on it
  * can ever re-execute an upstream stage (the heavy lineage is simply
  * not in the plan).
  */
class FlagshipPipelineSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def leaves(p: SparkPlan): Seq[SparkPlan] = p.collectLeaves()

  test("q_pipeline_llm's final plan is fully behind persisted stage cuts") {
    val df = SparkEntry.queries("q_pipeline_llm")(spark, sfDir)
    val exec = df.queryExecution.executedPlan
    val fileScans = leaves(exec).collect { case f: FileSourceScanExec => f }
    assert(fileScans.isEmpty,
      s"flagship plan still scans files — a stage cut is missing:\n" +
        fileScans.map(_.simpleString(120)).mkString("\n"))
    val rddScans = leaves(exec).collect { case r: RDDScanExec => r }
    assert(rddScans.nonEmpty,
      "expected checkpointed-RDD scans at the plan leaves")
    // and the composition still produces the packed corpus
    assert(df.count() > 0)
  }
}
