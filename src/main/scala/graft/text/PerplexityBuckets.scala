package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CCNet-style perplexity partitioning (Wenzek et al. 2020, "CCNet:
  * Extracting High Quality Monolingual Datasets from Web Crawl Data"):
  * score the corpus under a reference-trained LM, then split each
  * language into head / middle / tail by the per-language perplexity
  * terciles — the canonical selection step between LM scoring and
  * training-data sampling. Composes [[BigramLm]] (the scorer) with
  * [[graft.operators.Quantiles.groupQuantiles]] (the exact
  * histogram-based tercile). Extension category.
  *
  * Conventions: higher `avg_logprob` = lower perplexity = better, so
  * `head` is the top third. Tercile thresholds are computed over the
  * score snapped to a fixed 1e-3 grid ([[SnapScale]]) — the
  * [[graft.operators.Quantiles.approxGroupQuantiles]] scale argument:
  * the per-language histogram is bounded by the score RANGE (a few
  * thousand grid rows), not the document count, so the quantile
  * window never sorts anything corpus-sized. Band assignment:
  * `tail` when snapped ≤ t(1/3), `middle` when ≤ t(2/3), else `head`
  * — thresholds are actual histogram values, broadcast back into the
  * probe scan, so the split replays bit-exactly in any engine.
  *
  * Scale shape: [[BigramLm.score]]'s linear counting joins, one
  * grid-histogram aggregation (map-side combined), a window over
  * DISTINCT GRID VALUES per language, and one broadcast join of the
  * per-language threshold table. Nothing corpus-sized shuffles twice.
  */
object PerplexityBuckets {

  /** Snap grid for threshold computation: 1e-3 log-prob resolution. */
  val SnapScale = 1000L

  /** Tercile points (exact double literals, mirrored in the oracle). */
  val Q1: Double = 1.0 / 3.0
  val Q2: Double = 2.0 / 3.0

  /** Head/middle/tail split of `docs` by LM score terciles within each
    * `groupCols` partition (CCNet groups by language). Output:
    * (idCol, groupCols…, n_tokens, avg_logprob, ppl_bucket).
    */
  def bucket(docs: DataFrame, train: DataFrame, idCol: String,
      textCol: String, groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be nonempty")
    // The scored frame is PINNED too (eager localCheckpoint): it is
    // only doc-sized (id, groupCols, n_tokens, avg_logprob, __v), but
    // it is consumed twice — once to build the terciles, once as the
    // probe side of the band join — and without the pin the expensive
    // BigramLm corpus scoring chain (the token/bigram-stream joins)
    // executes once per consumer.
    val scored = BigramLm.score(docs, train, idCol, textCol)
      .join(docs.select((idCol +: groupCols).map(col): _*), idCol)
      .withColumn("__v",
        floor(col("avg_logprob") * SnapScale.toDouble).cast("long"))
      .localCheckpoint()
    val ts = graft.operators.Quantiles.groupQuantiles(
      scored, groupCols, "__v", Seq(Q1, Q2))
    // The threshold frame is PINNED (eager localCheckpoint of the
    // groups-sized table) before broadcasting back into the probe
    // scan: without it the probe join is a self-join on `scored`, and
    // Spark's self-join deduplication mis-binds the cloned threshold
    // columns when the upstream lineage is deep (observed in the
    // flagship funnel: every doc landed in `tail`).
    val wide = ts.groupBy(groupCols.map(col): _*).agg(
      max(when(col("q") === Q1, col("quantile_value"))).as("__t1"),
      max(when(col("q") === Q2, col("quantile_value"))).as("__t2"))
      .localCheckpoint()
    scored.join(broadcast(wide), groupCols)
      .withColumn("ppl_bucket",
        when(col("__v") <= col("__t1"), "tail")
          .when(col("__v") <= col("__t2"), "middle")
          .otherwise("head"))
      .select((col(idCol) +: groupCols.map(col)) ++
        Seq(col("n_tokens"), col("avg_logprob"), col("ppl_bucket")): _*)
  }
}
