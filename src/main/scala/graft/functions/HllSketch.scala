package graft.functions

import graft.text.TextFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic HyperLogLog distinct-count sketch (Flajolet et al. 2007)
  * built from the engine's portable md5-based 60-bit hash, so the WHOLE
  * sketch — registers and estimate — is reproducible bit-for-bit in any
  * engine (the DuckDB oracle mirrors it term by term). Spark's own
  * `approx_count_distinct` is a black-box HLL++ whose registers no oracle
  * can replay; this one trades a little speed for verifiability.
  *
  * Scale stance: this is the canonical mergeable sketch. The register
  * build is ONE map-side-combined aggregation to [[M]] rows — each
  * executor folds its partitions into 64 maxima before any shuffle, so
  * network cost is O(M × executors) regardless of input size, and
  * register sets from different corpora union with a plain `max`.
  */
object HllSketch {

  /** Register count (2^6). 64 registers ≈ 13% standard error — the
    * bucket index spends 6 of the hash's 60 bits, leaving 54 for the
    * leading-zero geometric.
    */
  val M = 64
  val BucketBits = 6
  val RestBits: Int = 60 - BucketBits // 54
  /** Register cap: 2^(31 - rho) stays in exact integer range. */
  val MaxRho = 31

  /** Bias constant alpha_64 (m = 64 row of the published table). */
  val Alpha: Double = 0.709

  /** Numerator of the raw estimate, precomputed ONCE here and rendered
    * into both engines as the same double literal:
    * alpha * m^2 * 2^31 (the 2^31 un-scales [[sumPow]]'s fixed point).
    */
  val EstNumerator: Double = Alpha * M * M * 2147483648.0

  /** Linear-counting threshold: below 2.5m the raw estimator biases high
    * and the zero-register count is the better estimate.
    */
  val SmallRangeThreshold: Double = 2.5 * M

  private def hash(c: Column, salt: String): Column =
    TextFunctions.tokenHash60(concat(lit(salt), c.cast("string")))

  /** Register index: low [[BucketBits]] bits of the hash. */
  def bucketCol(h: Column): Column = h % M

  /** rho = position of the first set bit in the remaining [[RestBits]]
    * bits (1-based from the top), capped at [[MaxRho]]. Pure integer
    * comparisons — `rest >= 2^j` summed over j gives the bit length —
    * so the oracle mirrors it exactly (no log2 float detour).
    */
  def rhoCol(h: Column): Column = {
    val rest = shiftrightunsigned(h, BucketBits)
    val bitLen = (0 until RestBits)
      .map(j => when(rest >= lit(1L << j), 1).otherwise(0))
      .reduce(_ + _)
    least(lit(RestBits + 1) - bitLen, lit(MaxRho))
  }

  /** The m register maxima for a column, INCLUDING never-hit registers as
    * zero rows (the estimate formula needs all m terms).
    */
  def registers(
      spark: SparkSession, df: DataFrame, valueCol: String,
      salt: String = "hll:"): DataFrame = {
    val h = hash(col(valueCol), salt)
    val hit = df.select(bucketCol(h).as("bucket"), rhoCol(h).as("rho"))
      .groupBy("bucket").agg(max(col("rho")).as("m"))
    spark.range(M).toDF("bucket")
      .join(hit, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("m"), lit(0)).as("m"))
  }

  /** 2^(31 - m) as an exact long via table lookup (shift amounts must be
    * literals in codegen; m is a column).
    */
  def powCol(m: Column): Column =
    element_at(
      array((0 to MaxRho).map(j => lit(1L << (MaxRho - j))): _*), m + 1)

  /** Merge two full register frames (per-bucket max): THE property that
    * makes the sketch production-grade — registers built over any
    * partitioning of the data (executors, micro-batches, days, sites)
    * merge to exactly the registers of the union, so the streamed /
    * federated estimate is bit-identical to the batch one
    * (register-level law pinned by AnalyticsSpec; end-to-end by
    * `q_stream_hll`'s oracle, which is the BATCH oracle verbatim).
    */
  def mergeRegisters(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("bucket"), col("m").as("ma"))
      .join(b.select(col("bucket"), col("m").as("mb")), Seq("bucket"))
      .select(col("bucket"), greatest(col("ma"), col("mb")).as("m"))

  /** Collapse registers to the single-row estimate:
    * (m_buckets, sum_pow, n_zero, estimate) where
    * estimate = alpha·m²·2^31 / Σ 2^(31-M_j), with the standard
    * linear-counting correction m·ln(m/V) when the raw estimate is small
    * and empty registers remain. `sum_pow` is an exact integer, so the
    * only float op on the main path is one double division.
    */
  def estimate(regs: DataFrame): DataFrame = groupedEstimate(regs, Nil)

  /** Per-group register maxima — the realistic shape at scale (distinct
    * users per event type / day / source): ONE map-side-combined
    * aggregation to groups×[[M]] rows. Never-hit registers are restored
    * as zeros via a (distinct groups) × range(M) frame — group
    * cardinality is sketch-sized (it bounds the OUTPUT), so the cross
    * join is a broadcast of 64 rows, not a data-sized product.
    */
  def groupedRegisters(
      spark: SparkSession, df: DataFrame, groupCols: Seq[String],
      valueCol: String, salt: String = "hll:"): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    val h = hash(col(valueCol), salt)
    val hit = df
      .select(groupCols.map(col) :+ bucketCol(h).as("bucket") :+
        rhoCol(h).as("rho"): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("rho")).as("m"))
    // groups come from the already-aggregated `hit` (output-sized), not
    // a second corpus scan; the restore join is NULL-SAFE on the group
    // keys so a null group keeps its registers (a plain left join would
    // zero them all and report 0 distinct for a group with real data)
    val dense = hit.select(groupCols.map(col): _*).distinct()
      .crossJoin(broadcast(spark.range(M).toDF("bucket"))).as("d")
    val ha = hit.as("h")
    val cond = (groupCols.map(c => col(s"d.$c") <=> col(s"h.$c")) :+
      (col("d.bucket") === col("h.bucket"))).reduce(_ && _)
    dense.join(ha, cond, "left")
      .select(groupCols.map(c => col(s"d.$c").as(c)) :+
        col("d.bucket").as("bucket") :+
        coalesce(col("h.m"), lit(0)).as("m"): _*)
  }

  /** [[estimate]] per group (pass `Nil` for the global single row). */
  def groupedEstimate(regs: DataFrame, groupCols: Seq[String]): DataFrame =
    regs.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("m_buckets"),
      sum(powCol(col("m"))).as("sum_pow"),
      sum(when(col("m") === 0, 1L).otherwise(0L)).as("n_zero"))
      .withColumn("est_raw", lit(EstNumerator) / col("sum_pow"))
      // linear-counting ln(M/V) via DetLog (V = n_zero is an integer in
      // [1, M]) — no libm ln in either engine's plan; the oracle mirrors
      // with a precomputed M-entry literal list of the same doubles
      .withColumn("estimate",
        when(col("est_raw") <= SmallRangeThreshold && col("n_zero") > 0,
          lit(M.toDouble) *
            graft.functions.DetLog.lnRatio(lit(M.toLong), col("n_zero")))
          .otherwise(col("est_raw")))
      .drop("est_raw")
}
