package graft.warehouse

import graft.GraftConf
import graft.catalog.Layer
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date-dimension generator (reference transformDMDate,
  * betl/defaultdataflows/dmDate.py:58-98; range from conf
  * EARLIEST/LATEST_DATE_IN_DATA, betl/ConfClass.py:230-232).
  *
  * `sequence + explode` builds the calendar entirely inside Catalyst —
  * no driver-side loop, trivially parallel. Attribute set mirrors the
  * reference: yyyymmdd int key, calendar day/month/year parts, day-of-week
  * numberings, day-of-year, ISO week.
  */
object DmDate {

  def build(
      spark: SparkSession,
      startDate: String,
      endDate: String): DataFrame = {
    spark
      .sql(s"""SELECT explode(sequence(
              |  to_date('$startDate'), to_date('$endDate'),
              |  interval 1 day)) AS cal_date""".stripMargin)
      .select(
        (year(col("cal_date")) * 10000 + month(col("cal_date")) * 100 +
          dayofmonth(col("cal_date"))).cast("int").as("date_key"),
        date_format(col("cal_date"), "yyyy-MM-dd").as("cal_date_str"),
        year(col("cal_date")).as("cal_year"),
        month(col("cal_date")).as("cal_month"),
        dayofmonth(col("cal_date")).as("cal_day"),
        date_format(col("cal_date"), "MMMM").as("month_name"),
        // ISO numbering: 1 = Monday … 7 = Sunday (Spark weekday() is 0=Mon)
        (weekday(col("cal_date")) + 1).as("day_of_week_iso"),
        // US numbering: 1 = Sunday … 7 = Saturday
        dayofweek(col("cal_date")).as("day_of_week_us"),
        dayofyear(col("cal_date")).as("day_of_year"),
        weekofyear(col("cal_date")).as("week_of_year_iso"))
  }

  def load(spark: SparkSession, conf: GraftConf): DataFrame = {
    val dim = build(spark, conf.earliestDateInData, conf.latestDateInData)
    dim.write.mode("overwrite").parquet(conf.tablePath(Layer.BSE, "dm_date"))
    dim
  }
}
