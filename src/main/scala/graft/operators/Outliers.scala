package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Exact per-group z-score outlier detection over a fixed-precision
  * measure. Extension category (the reference has no statistical ops;
  * its quality gates are the MDM unmapped-row alerts,
  * betl/dataflow/dfl_mdm.py:148-213) — this is the data-quality screen a
  * training pipeline runs over telemetry-style tables.
  *
  * The usual rendering `abs(v - avg) > z * stddev` compares doubles whose
  * value depends on accumulation order (non-deterministic across cluster
  * sizes, and engine-specific). Instead the measure is snapped to its
  * native fixed-point grid (cents for a 2dp money column) and the
  * inequality is cleared of divisions and square roots:
  *
  *   |v - s/n| > z * sqrt((n*ssq - s^2) / n^2)
  *     <=>  (n*v - s)^2 > z^2 * (n*ssq - s^2)
  *
  * — every operand an integer, so membership is bit-identical on any
  * partitioning and replayable by any engine. Products run in
  * DECIMAL(38,0) (Spark) / HUGEINT (DuckDB): at 100 TB,
  * n*ssq exceeds 64 bits long before the math is wrong. The valid
  * envelope is |n·v − s| < 10^19 (so its square stays inside 38
  * digits) — group row-count × fixed-point magnitude up to ~10^19,
  * comfortable for any telemetry measure on a cents grid; beyond it
  * Spark's non-ANSI decimal overflow would null the predicate, so
  * re-grid the measure (coarser fixed point) rather than trust a
  * silent result.
  *
  * Scale shape: one map-side-combined aggregation reduces the table to
  * |groups| stat rows, which broadcast back into a second scan — the
  * group-stats-broadcast pattern. A window over event_type would put
  * each group on ONE task; the broadcast join keeps the probe scan
  * embarrassingly parallel.
  */
object Outliers {

  private val D = DecimalType(38, 0)

  /** Rows whose fixed-point measure lies strictly outside `z` standard
    * deviations of their group mean. `fpCol` must already be an integer
    * column (e.g. cents).
    */
  def flag(df: DataFrame, groupCols: Seq[String], fpCol: String,
      z: Int): DataFrame = {
    require(z >= 1, s"z must be >= 1: $z")
    val v = col(fpCol).cast(D)
    val stats = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).cast(D).as("__n"),
        sum(v).as("__s"),
        sum(v * v).as("__ssq"))
    val dev: Column = col("__n") * v - col("__s")
    df.join(broadcast(stats), groupCols)
      .where(dev * dev >
        lit(z * z).cast(D) * (col("__n") * col("__ssq") -
          col("__s") * col("__s")))
      .drop("__n", "__s", "__ssq")
  }
}
