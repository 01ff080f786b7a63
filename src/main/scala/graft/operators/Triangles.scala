package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting over an undirected edge list — the
  * clustering-coefficient primitive for co-occurrence graphs (suppliers
  * sharing parts, documents sharing domains). Extension category, like
  * [[PageRank]] and [[graft.dedup.Dedup.connectedComponents]].
  *
  * Algorithm: degree-oriented node-iterator. Every undirected edge is
  * oriented from its lower-(degree, id) endpoint to the higher one; each
  * triangle then has exactly ONE vertex with two out-edges, so counting
  * closed wedges over the orientation counts each triangle once — no
  * /3 correction, no duplicate pairs.
  *
  * Scale shape: the orientation is the whole trick. Wedge generation is
  * a self-equi-join on the out-edge source, and a vertex's out-degree
  * under (degree, id) orientation is bounded by O(sqrt(|E|)) (the
  * arboricity bound), so a celebrity node with 10^7 neighbours
  * contributes ~|E|^{1/2} wedges instead of 10^14. Both joins are plain
  * equi-joins (hash-partitioned); nothing is ever nested-loop.
  */
object Triangles {

  /** Global triangle count of the undirected graph given as (a, b) rows;
    * edges are canonicalised and deduped internally. Returns one row:
    * (n_edges, n_triangles).
    */
  def run(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val e = edges
      .select(least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .where(col("a") =!= col("b")) // self-loops close no triangles
      .distinct()
    val deg = e.select(col("a").as("v"))
      .unionAll(e.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    // orient: src = endpoint with smaller (degree, id); total order so
    // exactly one direction survives per edge
    val withDeg = e
      .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
    val oriented = withDeg.select(
      when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
        struct(col("a").as("src"), col("b").as("dst")))
        .otherwise(struct(col("b").as("src"), col("a").as("dst")))
        .as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    // wedges from a common source; a triangle's apex (the one vertex
    // with two out-edges) emits the wedge in both orderings, but only
    // the ordering that matches the closing edge's orientation joins —
    // so each triangle is counted exactly once
    val o1 = oriented.select(col("src"), col("dst").as("v1"))
    val o2 = oriented.select(col("src"), col("dst").as("v2"))
    val wedges = o1.join(o2, "src").where(col("v1") =!= col("v2"))
    val closed = wedges.join(
      oriented.select(col("src").as("v1"), col("dst").as("v2")),
      Seq("v1", "v2"))
    val nE = e.agg(count(lit(1)).as("n_edges"))
    val nT = closed.agg(count(lit(1)).as("n_triangles"))
    nE.crossJoin(nT)
  }
}
