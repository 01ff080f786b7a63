package graft.mdm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Result of a master-data mapping pass.
  *
  * @param mapped    the input data with master columns resolved (rows of the
  *                  mapping with no matching data — "right_only" — dropped)
  * @param writeBack distinct join+master combos with occurrence counts,
  *                  sorted desc — what the reference writes back to the
  *                  mapping sheet (dfl_mdm.py:141-146)
  * @param unmapped  rows in the data that had no mapping row (these are the
  *                  alert condition, dfl_mdm.py:196-204)
  */
case class MdmResult(mapped: DataFrame, writeBack: DataFrame, unmapped: DataFrame)

/** Master-data mapping (reference mapMasterData, betl/dataflow/dfl_mdm.py:
  * 8-213) with a DataFrame in place of the Google-Sheet worksheet; the
  * join/auto-populate/write-back/alert semantics are preserved exactly:
  *
  *  - full outer join data ↔ mapping on `joinCols` with an indicator,
  *  - auto-populate: a NULL or '' master value is filled from the data's
  *    same-named column (renamed `autoPop_<col>` before the join; autopop
  *    never overwrites a filled-in mapping),
  *  - remaining NULL master values normalise to '' (blank-cell parity),
  *  - output keeps "both" + "left_only" rows; write-back keeps everything.
  */
object MasterData {

  def mapMasterData(
      data: DataFrame,
      mdm: DataFrame,
      joinCols: Seq[String],
      masterDataCols: Seq[String],
      autoPopMappingCols: Seq[String] = Seq.empty): MdmResult = {

    // GSheet parity: NaNs won't join to empty cells (dfl_mdm.py:43)
    val stringCols = data.schema.fields
      .filter(_.dataType == StringType).map(_.name)
    val filled = data.na.fill("", stringCols)

    val renamed = autoPopMappingCols.foldLeft(filled)(
      (d, c) => d.withColumnRenamed(c, s"autoPop_$c"))

    val l = renamed.withColumn("_in_data", lit(1))
    val r = mdm.withColumn("_in_mdm", lit(1))
    val joined = l.join(r, joinCols, "full_outer")

    val autoPopped = autoPopMappingCols.foldLeft(joined) { (d, c) =>
      d.withColumn(c,
        when(col(c).isNull || col(c) === "", col(s"autoPop_$c"))
          .otherwise(col(c)))
    }
    val blanked = autoPopped.na.fill("", masterDataCols)

    val dropCols = autoPopMappingCols.map(c => s"autoPop_$c")
    val mapped = blanked
      .filter(col("_in_data").isNotNull)
      .drop("_in_data" :: "_in_mdm" :: dropCols.toList: _*)
    val unmapped = blanked
      .filter(col("_in_data").isNotNull && col("_in_mdm").isNull)
      .drop("_in_data" :: "_in_mdm" :: dropCols.toList: _*)
    val writeBack = blanked
      .select((joinCols ++ masterDataCols).map(col): _*)
      .groupBy((joinCols ++ masterDataCols).map(col): _*)
      .count()
      .orderBy(desc("count"))

    MdmResult(mapped, writeBack, unmapped)
  }

  /** The reference's unmapped-rows alert (dfl_mdm.py:196-204): when the
    * mapping pass left rows unmapped, append one alert block to the
    * warehouse's `_alerts.txt` ([[graft.Alerts]]) naming the dataset and
    * count. Opt-in: counting is an action, so callers invoke this at the
    * step where the reference would raise its alert.
    */
  def alertUnmapped(
      conf: graft.GraftConf, result: MdmResult, dataset: String,
      sampleRows: Int = 10): Long = {
    val n = result.unmapped.count()
    if (n > 0) {
      val sample = result.unmapped.limit(sampleRows).collect()
        .map(_.toSeq.mkString(", ")).mkString("\n")
      graft.Alerts.log(conf,
        s"ALERT: $n unmapped master-data row(s) in '$dataset'.\n" +
          s"Add mappings for:\n$sample")
    }
    n
  }
}
