package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-point PageRank: r' = 0.15 + 0.85·Σ r(u)/outdeg(u), iterated a
  * fixed number of rounds over (src, dst) edges.
  *
  * All arithmetic is INTEGER: ranks are 10^6-scaled longs, per-edge
  * contributions use floor division (`r div outdeg`), and the damping is
  * the exact rational 17/20. Floating-point PageRank sums doubles whose
  * accumulation order differs per partitioning/engine; the integer
  * rendering is bit-identical anywhere — a DuckDB recursive CTE replays
  * it row-for-row (q_pagerank's oracle).
  *
  * Scale shape: each round is one equi-join (edges ⋈ ranks on src, the
  * rank side keyed and orders of magnitude smaller than edges) plus one
  * combine-reduced agg by dst. The edges⋈outdeg frame is persisted once
  * and reused every round. Each round's rank frame is localCheckpointed:
  * iterative DataFrame lineage otherwise grows ~4^rounds and stalls
  * Catalyst analysis (same discipline as Dedup.connectedComponents).
  *
  * Precondition: every node referenced by `dst` must also appear as a
  * `src` (no dangling nodes) — callers with directed data add reverse
  * edges or sink self-loops first; nodes without in-edges fall out of
  * the result (their rank is the constant 0.15 base).
  */
object PageRank {

  /** Rank scale: 1.0 == 10^6 (decimal, so SQL replays are readable). */
  val Scale = 1000000L
  val Base: Long = Scale * 15 / 100

  def run(edges: DataFrame, iterations: Int): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val e = edges.select(col("src"), col("dst"))
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // pin hash(src) partitioning INTO the persisted edges: AQE turns the
    // degree join into a broadcast, whose output keeps the scan's file
    // partitioning — without the explicit repartition every round's
    // rank join re-shuffles the full edge frame; with it, each round
    // shuffles only the node-sized rank side into the cached layout
    val withDeg = e.join(deg, "src").repartition(col("src")).persist()
    try {
      var rank = deg.select(col("src").as("id"), lit(Scale).as("r"))
      for (_ <- 1 to iterations) {
        rank = withDeg.join(rank, col("src") === col("id"))
          .select(col("dst"), expr("r div outdeg").as("c"))
          .groupBy("dst")
          .agg(sum(col("c")).as("c"))
          .select(col("dst").as("id"),
            (lit(Base) + expr("(17 * c) div 20")).as("r"))
          .localCheckpoint()
      }
      rank.select(col("id"), col("r").as("rank_fp"))
    } finally withDeg.unpersist()
  }
}
