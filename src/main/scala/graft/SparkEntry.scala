package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator in SURVEY.md §2 (plus the LLM-data-pipeline extensions)
  * is exposed as a named query over the driver's parquet corpus, paired
  * with a DuckDB oracle in [[oracleSql]] where the semantics are ANSI-SQL
  * expressible (rows-only check otherwise).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.defs ++ LifecycleQueries.defs ++ TextQueries.defs ++
      DedupQueries.defs ++ SimilarityQueries.defs ++ MultimodalQueries.defs ++
      StreamingQueries.defs ++ AnalyticsQueries.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ LifecycleQueries.oracles ++ TextQueries.oracles ++
      DedupQueries.oracles ++ SimilarityQueries.oracles ++
      MultimodalQueries.oracles ++ StreamingQueries.oracles ++
      AnalyticsQueries.oracles
}
