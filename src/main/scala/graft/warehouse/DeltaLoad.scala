package graft.warehouse

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Delta-extract classification — the reference DECLARED this but never
  * shipped it (deltaLoadDimension/Fact raise, stageLoad.py:433-438; the
  * extract-side merge logic survives only as a commented block,
  * stageExtract.py:95-228). This is that dormant design, Spark-first:
  * a single null-safe full-outer NK join classifies every row as
  * INSERT / UPDATE / DELETE / UNCHANGED in one shuffle, after which a
  * delta load applies each class (append inserts, overwrite updates,
  * tombstone deletes).
  *
  * Scale: the join shuffles both sides by NK once; attribute comparison
  * is row-local (`<=>` null-safe equality, codegen'd). Skewed NKs are a
  * data-quality bug upstream (NKs should be unique), so no salting here.
  */
object DeltaLoad {

  val OpCol = "delta_op"

  /** Classify `current` (the fresh extract) against `previous` (the
    * staged copy) on natural keys. Output: NKs + the CURRENT attribute
    * values (previous values for DELETEs) + [[OpCol]].
    */
  def classify(
      current: DataFrame, previous: DataFrame,
      nkCols: Seq[String]): DataFrame = {
    val attrCols = current.columns.filterNot(nkCols.contains).toSeq
    require(attrCols == previous.columns.filterNot(nkCols.contains).toSeq,
      "classify: current and previous must share a schema")
    val cur = attrCols.foldLeft(current)((d, c) =>
      d.withColumnRenamed(c, s"_cur_$c"))
      .withColumn("_cur_present", lit(true))
    val prev = attrCols.foldLeft(previous)((d, c) =>
      d.withColumnRenamed(c, s"_prev_$c"))
      .withColumn("_prev_present", lit(true))
    val changed = attrCols
      .map(c => !(col(s"_cur_$c") <=> col(s"_prev_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    val joined = cur.join(prev, nkCols, "full_outer")
    val classified = joined.withColumn(OpCol,
      when(col("_prev_present").isNull, "INSERT")
        .when(col("_cur_present").isNull, "DELETE")
        .when(changed, "UPDATE")
        .otherwise("UNCHANGED"))
    // current values whenever the current side has the row (a per-column
    // coalesce would silently resurrect the previous value for an UPDATE
    // that legitimately sets an attribute to NULL); previous values only
    // for DELETEs
    val out = attrCols.foldLeft(classified)((d, c) =>
      d.withColumn(c, when(col("_cur_present").isNotNull, col(s"_cur_$c"))
        .otherwise(col(s"_prev_$c"))))
    out.select((nkCols ++ attrCols :+ OpCol).map(col): _*)
  }

  /** Apply a classification to produce the new staged table: inserts and
    * updates take current values, unchanged rows stay, deletes drop out.
    */
  def applyDelta(classified: DataFrame): DataFrame =
    classified.where(col(OpCol) =!= "DELETE").drop(OpCol)
}
