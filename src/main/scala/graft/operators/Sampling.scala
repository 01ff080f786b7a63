package graft.operators

import graft.text.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling — the reproducible alternative to
  * `df.sample()` for corpus downsampling and train/eval splits.
  * Extension category (the reference's only row-capping device is the
  * dev-mode `limitdata` head, betl/ConfClass.py:186-188, which is biased
  * by source order; hash sampling is the production version).
  *
  * Scale stance: a row-local predicate on a salted md5 hash — no
  * shuffle, no RNG state, pushes down past column pruning, and the SAME
  * rows are selected on any cluster size, any partitioning, any engine
  * (the salt keys independent samples apart). That reproducibility is
  * what makes a 100 TB sample auditable: re-running selects identical
  * rows, and an oracle can replay the exact membership test.
  */
object Sampling {

  /** Stable per-row bucket in [0, buckets): salted md5 of the id. */
  def hashBucket(idCol: Column, salt: String, buckets: Int = 100): Column =
    TextFunctions.tokenHash60(concat(lit(salt), idCol.cast("string"))) %
      buckets

  /** Keep rows whose bucket falls under `pct` (percent, 0-100). */
  def hashSample(
      df: DataFrame, idCol: String, pct: Int,
      salt: String = "sample:"): DataFrame = {
    require(pct >= 0 && pct <= 100, s"pct out of range: $pct")
    df.where(hashBucket(col(idCol), salt) < pct)
  }

  /** Stratified deterministic sample: per-stratum keep-percentages with
    * a default for unlisted strata. One row-local predicate — the rate
    * lookup is a literal CASE chain, not a join.
    */
  def stratifiedSample(
      df: DataFrame, idCol: String, stratumCol: String,
      rates: Map[String, Int], defaultPct: Int,
      salt: String = "sample:"): DataFrame = {
    require((rates.values ++ Seq(defaultPct)).forall(p => p >= 0 && p <= 100),
      "rates must be percentages in [0, 100]")
    val rate = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultPct)) {
      case (acc, (stratum, pct)) =>
        when(col(stratumCol) === stratum, pct).otherwise(acc)
    }
    df.where(hashBucket(col(idCol), salt) < rate)
  }

  /** Weight-proportional deterministic Poisson sample: keep each row
    * with inclusion probability min(1, k * w / W) where W = sum of the
    * integer weight column — expected sample size ~k, heavier rows
    * proportionally likelier (the importance-sampling step of quality-
    * weighted corpus mixing). Membership is the exact integer test
    *   hash20 * W < k * w * 2^20
    * (DECIMAL(38,0) products — at 100 TB, hash20 * W overflows a long),
    * so the SAME rows are kept on any cluster and any engine can replay
    * the sample. The weight total W broadcasts from a one-row aggregate:
    * two scans of the input, zero shuffles of it.
    */
  def weightedSample(
      df: DataFrame, idCol: String, weightCol: String, k: Int,
      salt: String = "wsample:"): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val d = org.apache.spark.sql.types.DecimalType(38, 0)
    val tot = df.agg(sum(col(weightCol).cast(d)).as("__w_total"))
    val h20 = TextFunctions.tokenHash60(
      concat(lit(salt), col(idCol).cast("string"))) % (1L << 20)
    df.crossJoin(broadcast(tot))
      .where(h20.cast(d) * col("__w_total") <
        lit(k).cast(d) * col(weightCol).cast(d) * lit(1L << 20).cast(d))
      .drop("__w_total")
  }

  /** Temperature-flattened source mixing — the data-mixture rebalancing
    * step of corpus curation: resample so source s's share moves from
    * its corpus share p_s = n_s/N toward q_s ∝ p_s^T, upsampling rare
    * sources relative to dominant ones. The temperature is FIXED at
    * T = 1/2: sqrt is IEEE-correctly-rounded in every engine (the same
    * bits on JVM, DuckDB, anywhere), while a general pow(x, T) is libm
    * and would break the engine's replayable-membership contract.
    *
    * Determinism shape: per-source counts are exact longs; the sqrt
    * shares snap to 2^-20 fixed point (`floor(sqrt(n)·2^20)` as long)
    * so the normalising sum is exact-integer and order-insensitive;
    * membership is the exact integer cross-multiplication
    *   hash20 · n_s · S  <  k · ss_s · 2^20
    * (DECIMAL(38,0) products), i.e. keep-rate min(1, k·q_s/n_s) with
    * q_s = ss_s/S — the SAME rows on any cluster, any partitioning,
    * any engine. Scale: one combine-reduced count per source + two
    * broadcast joins of source-sized frames; the corpus is scanned
    * twice and never shuffled.
    */
  def temperatureMix(
      df: DataFrame, idCol: String, sourceCol: String, k: Int,
      salt: String = "tmix:"): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val d = org.apache.spark.sql.types.DecimalType(38, 0)
    val shares = df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__ss",
        floor(sqrt(col("__n")) * (1L << 20)).cast("long"))
    val tot = shares.agg(sum(col("__ss").cast(d)).as("__stot"))
    val h20 = TextFunctions.tokenHash60(
      concat(lit(salt), col(idCol).cast("string"))) % (1L << 20)
    df.join(broadcast(shares), Seq(sourceCol))
      .crossJoin(broadcast(tot))
      .where(h20.cast(d) * col("__n").cast(d) * col("__stot") <
        lit(k).cast(d) * col("__ss").cast(d) * lit(1L << 20).cast(d))
      .drop("__n", "__ss", "__stot")
  }

  /** Fixed-size deterministic sample per group: the k rows whose salted
    * hashes are smallest within each group (a uniform without-replacement
    * k-sample, reproducible on any cluster/engine). Rate-based sampling
    * can't promise "exactly 100 eval docs per language" — this does.
    *
    * One hash-partitioned window per group; the sort key is the 60-bit
    * hash (ties broken by id), so the window sorts GROUP-sized runs, and
    * skew is the stratum's own size. For k ≪ group this is the exact
    * grouped top-k; Spark plans a WindowExec with rank-pushdown limiting
    * in recent versions (WindowGroupLimit) so partitions pre-prune to k.
    */
  def groupSample(
      df: DataFrame, groupCol: String, idCol: String, k: Int,
      salt: String = "ksample:"): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val h = TextFunctions.tokenHash60(
      concat(lit(salt), col(idCol).cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(h.asc, col(idCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .drop("__rn")
  }

  /** Epoch-weighted source mixing: replicate each row per its source's
    * EPOCH factor — the pretraining "epochs over sources" recipe
    * (small high-quality sources upsampled past 1 epoch, bulk web
    * sampled under 1; the LLaMA-style mixture table). Every row
    * appears floor(e) times, plus one more exactly when its salted
    * 2^20 hash falls under frac(e) — a deterministic fractional epoch,
    * reproducible on any engine.
    *
    * `epochsMillis` maps source → epoch factor in fixed-point MILLIS
    * (2450 = 2.45 epochs); unlisted sources default to `defaultMillis`
    * (1000 = one epoch). Millis keep the fractional threshold in
    * integer arithmetic on both engines: the extra copy fires iff
    * `h20 · 1000 < (e mod 1000) · 2^20` — no double rounding at the
    * boundary. The output carries a 0-based `copy` index so a
    * downstream seeded shuffle spreads replicas across the order.
    *
    * Scale: row-local — the epoch lookup is a literal CASE chain (no
    * join), replication is one `explode(sequence(...))`; output size
    * is Σ_s n_s·e_s, the mixture's actual training budget. Rows whose
    * copy count is zero are filtered BEFORE the explode (Spark's
    * `sequence(0, -1)` would infer a negative step, not an empty
    * array).
    */
  def epochMix(
      df: DataFrame, idCol: String, sourceCol: String,
      epochsMillis: Map[String, Long], defaultMillis: Long = 1000L,
      salt: String = "emix:"): DataFrame =
    epochCopies(df, idCol, sourceCol, epochsMillis, defaultMillis, salt,
      copiesCol = "__copies")
      .where(col("__copies") > 0)
      .withColumn("copy",
        explode(sequence(lit(0L), col("__copies") - 1L)))
      .drop("__copies")

  /** [[epochMix]]'s per-row copy COUNT without the replication — the
    * annotate-don't-drop rendering: every row survives, zero-epoch
    * sources carrying `copiesCol` = 0 as a weight column instead of
    * disappearing from the frame.
    */
  def epochCopies(
      df: DataFrame, idCol: String, sourceCol: String,
      epochsMillis: Map[String, Long], defaultMillis: Long = 1000L,
      salt: String = "emix:", copiesCol: String = "epoch_copies")
      : DataFrame = {
    require(defaultMillis >= 0 && epochsMillis.values.forall(_ >= 0),
      "epoch factors must be non-negative")
    val e = epochsMillis.toSeq.sortBy(_._1).foldLeft(
      lit(defaultMillis)) { case (acc, (src, m)) =>
        when(col(sourceCol) === src, lit(m)).otherwise(acc)
    }
    val h20 = TextFunctions.tokenHash60(
      concat(lit(salt), col(idCol).cast("string"))) % (1L << 20)
    // Column `/` is double division; truncation back to long is exact
    // here because e/1000 carries ≤ 1e-3 rational parts whose IEEE
    // error (~1e-16) can never cross an integer boundary
    val copies = (e / 1000L).cast("long") +
      when(h20 * 1000L < (e % 1000L) * (1L << 20), 1L).otherwise(0L)
    df.withColumn(copiesCol, copies)
  }
}
