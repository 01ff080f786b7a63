package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group embedding centroids — the aggregation behind IVF coarse
  * quantizers, cluster summaries, and class prototypes. Extension
  * category beyond the reference surface.
  *
  * Scale stance: `posexplode` + groupBy(label, dim) is the distributive
  * form — one map-side-combined shuffle of (label, dim, partial sum)
  * rows, never a per-group list materialisation (a `collect_list` of a
  * million vectors per label would OOM the reducer). Summation runs in
  * FIXED-POINT integers: floats scaled by 2^20 and floored, so partial
  * sums are associative-exact — the centroid is bit-identical under ANY
  * partitioning or aggregation order (IEEE double summation is not),
  * which is what makes the result verifiable by an oracle and stable
  * across cluster sizes. Error from the 2^20 grid is < 1e-6 per element.
  */
object Centroids {

  /** Fixed-point scale: 2^20. A power of two, so `v * Scale` is EXACT in
    * doubles (exponent shift) and `floor` is the only rounding step.
    */
  val Scale = 1048576L

  /** Per-(group, dimension) centroid of an `array<float>` column.
    * Output: groupCol, `dim` (1-based), `n_vectors`, `centroid` —
    * centroid = Σ floor(v·2^20) / (2^20 · n), one exact-integer double
    * division per output row.
    */
  def centroids(
      df: DataFrame, groupCol: String, vecCol: String): DataFrame =
    df.select(col(groupCol),
      posexplode(col(vecCol)).as(Seq("__d0", "__v")))
      .select(col(groupCol), (col("__d0") + 1).cast("long").as("dim"),
        floor(col("__v").cast("double") * Scale).cast("long").as("__fp"))
      .groupBy(col(groupCol), col("dim"))
      .agg(count(lit(1)).as("n_vectors"), sum(col("__fp")).as("__sum"))
      .withColumn("centroid",
        col("__sum").cast("double") / (lit(Scale.toDouble) * col("n_vectors")))
      .drop("__sum")
}
