package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Token-balanced shard assignment: split a corpus into `k` shards of
  * (nearly) equal TOKEN count — the layout step before a distributed
  * training run, where each worker's shard must carry the same token
  * budget (balancing by document COUNT skews badly when lengths vary;
  * the data-parallel loader reads shards, not documents). Extension
  * category — the reference has no layout operators.
  *
  * Semantics: the corpus is laid out in the total order given by
  * `orderCols` (callers pass a seeded hash key for a decorrelated
  * order — the [[graft.text.SeqPack]]/q_corpus_shuffle convention), and
  * shard boundaries cut that order into k contiguous token ranges:
  * `shard = (global_token_offset * k) div total_tokens`. Documents are
  * never split — a document belongs to the shard containing its FIRST
  * token, so any shard's token count deviates from total/k by at most
  * one document's length. Deterministic: offsets come from a total
  * order, the division is integer arithmetic.
  *
  * Scale shape: the global token offset is the
  * [[graft.text.SeqPack.globalOffsets]] two-phase layout (range
  * repartition → per-partition subtotals → driver prefix-sum of p rows
  * → broadcast back) — no single-partition running-sum window; the
  * 1-row total frame broadcasts into the doc-sized assignment scan.
  */
object Shards {

  /** Assign each row to a shard.
    *
    * @param df        doc-sized frame carrying `orderCols` and `nCol`
    * @param orderCols the layout order; MUST be a unique key (the
    *                  [[graft.text.SeqPack.globalOffsets]] contract)
    * @param nCol      integral token weight (zero-weight rows are kept:
    *                  they ride at their order position and the final
    *                  `least` clamp keeps a trailing zero-weight run —
    *                  whose offset equals the total — in shard k-1)
    * @param k         number of shards, ≥ 1
    * @return `df`'s `orderCols` plus (`n_tokens`, `tok_offset`,
    *         `shard`); empty input yields an empty result (no total to
    *         divide by — the join against the empty total frame keeps
    *         the plan closed)
    */
  def assign(df: DataFrame, orderCols: Seq[String], nCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"shard count must be >= 1: $k")
    val placed = graft.text.SeqPack.globalOffsets(df, orderCols, nCol)
    // total = Σ __n over the DOC-SIZED placed frame (the corpus text
    // scan is long gone by here) — 1 row, broadcast
    val total = placed.agg(sum(col("__n")).as("__tot"))
      .where(col("__tot") > 0)
    placed.crossJoin(broadcast(total))
      .select(
        orderCols.map(col) ++ Seq(
          col("__n").as("n_tokens"),
          col("__start").as("tok_offset"),
          // INTEGER div: offset*k reaches 2^53 at trillion-token corpora
          // × wide k, where a double detour would silently round
          least(lit(k - 1).cast("long"),
            expr(s"(__start * $k) div __tot")).as("shard")): _*)
  }
}
