import org.apache.spark.sql.SparkSession
object PlanPeek {
  def main(a: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.ui.enabled","false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries("q_pipeline_llm")(s, "/root/testdata/sf0.001")
    df.queryExecution.executedPlan.collectLeaves()
      .foreach(l => println("LEAF: " + l.getClass.getName + " :: " + l.simpleString(100)))
  }
}
