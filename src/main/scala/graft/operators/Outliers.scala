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
  * envelope is z·(n·max|v| + |s|) < 10^19 (so every square in the
  * predicate stays inside 38 digits) — group row-count × fixed-point
  * magnitude up to ~10^19, comfortable for any telemetry measure on a
  * cents grid. The envelope is ENFORCED at runtime: an `assert_true`
  * conjunct over the broadcast stats row fails the job loudly if any
  * group exceeds it (Spark's non-ANSI decimal overflow would otherwise
  * null the predicate and silently drop rows from the outlier set);
  * re-grid the measure (coarser fixed point) when it trips.
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
        sum(v * v).as("__ssq"),
        max(abs(v)).as("__maxv"))
    val dev: Column = col("__n") * v - col("__s")
    // overflow envelope: z·(n·max|v| + |s|) < 10^19 bounds BOTH sides'
    // squares inside DECIMAL(38,0). Evaluated per broadcast stats row
    // (a handful of exact integer ops); a null guard value means the
    // guard product itself overflowed — equally fatal.
    val guard = lit(z).cast(D) *
      (col("__n") * col("__maxv") + abs(col("__s")))
    val lim = lit(new java.math.BigDecimal("10000000000000000000")).cast(D)
    val inEnvelope = guard.isNotNull && guard < lim
    df.join(broadcast(stats), groupCols)
      .where(assert_true(inEnvelope,
        lit("Outliers.flag: fixed-point envelope exceeded — " +
          "z*(n*max|v| + |s|) >= 1e19 would overflow DECIMAL(38,0) " +
          "and silently null the predicate; re-grid the measure")).isNull
        && dev * dev >
          lit(z * z).cast(D) * (col("__n") * col("__ssq") -
            col("__s") * col("__s")))
      .drop("__n", "__s", "__ssq", "__maxv")
  }
}
