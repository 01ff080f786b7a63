package graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Structural gate for the flagship q_pipeline_llm composition: every
  * stage boundary must be a PERSISTED cut (eager localCheckpoint), so
  * the expensive stages — PPJoin near-dup, decontamination, DSIR —
  * execute exactly once no matter how many downstream consumers or
  * actions read the result. The proof is plan-shaped: after
  * construction, the returned frame's OPTIMIZED LOGICAL plan reads ONLY
  * checkpointed LogicalRDD leaves — zero file-source relations — so no
  * action on it can ever re-execute an upstream stage (the heavy
  * lineage is simply not in the plan). We assert on the optimized
  * logical plan rather than executedPlan because under AQE a fresh
  * frame's executedPlan is a single AdaptiveSparkPlanExec wrapper
  * (isFinalPlan=false) whose leaves are not the real scans.
  */
class FlagshipPipelineSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("q_pipeline_llm's final plan is fully behind persisted stage cuts") {
    val df = SparkEntry.queries("q_pipeline_llm")(spark, sfDir)
    val leaves: Seq[LogicalPlan] = df.queryExecution.optimizedPlan.collectLeaves()
    val fileRelations = leaves.collect { case r: LogicalRelation => r }
    assert(fileRelations.isEmpty,
      s"flagship plan still scans files — a stage cut is missing:\n" +
        fileRelations.map(_.simpleString(120)).mkString("\n"))
    val rddLeaves = leaves.collect { case r: LogicalRDD => r }
    assert(rddLeaves.nonEmpty,
      "expected checkpointed-RDD leaves in the optimized plan")
    assert(rddLeaves.size == leaves.size,
      s"unexpected non-RDD leaves: ${leaves.filterNot(_.isInstanceOf[LogicalRDD]).map(_.nodeName).mkString(", ")}")
    // and the composition still produces the packed corpus
    assert(df.count() > 0)
  }
}
