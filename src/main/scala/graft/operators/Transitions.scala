package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-order Markov transition matrix over per-key ordered event
  * sequences: for every (from, to) pair of consecutive states, the count
  * and the conditional probability P(to | from). Extension category —
  * the sequence-mining complement of the funnel and sessionization
  * operators (the reference has no ordered-event analytics at all).
  *
  * Scale shape: ONE hash exchange on the sequence key feeds the lead()
  * window (each task sorts only its keys' runs), then the pair counts
  * come out of a map-side-combined aggregation whose result is at most
  * |states|^2 rows. The row-count normalisation joins that tiny frame to
  * its own from-state margin — output-sized work, never a second pass
  * over the events. The probability is one division of two exact BIGINTs,
  * so the double is engine-identical (IEEE 754 division is exact-input
  * deterministic).
  */
object Transitions {

  /** (from_state, to_state, n, p) for consecutive-state pairs within
    * each key's timeline; `orderCols` must be a deterministic total
    * order within a key (add a tiebreaker id).
    */
  def matrix(df: DataFrame, keyCol: String, stateCol: String,
      orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(orderCols.map(col): _*)
    val pairs = df
      .withColumn("__to", lead(col(stateCol), 1).over(w))
      .where(col("__to").isNotNull)
      .groupBy(col(stateCol).as("from_state"), col("__to").as("to_state"))
      .agg(count(lit(1)).as("n"))
    val margins = pairs.groupBy("from_state")
      .agg(sum(col("n")).as("__tot"))
    pairs.join(margins, "from_state")
      .withColumn("p", col("n").cast("double") / col("__tot").cast("double"))
      .select("from_state", "to_state", "n", "p")
  }
}
