package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed Lloyd k-means over embedding vectors, bit-exact in any
  * engine: every quantity is an integer.
  *
  * - Points are snapped to a 2^-20 fixed-point grid ONCE, with a +2.0
  *   offset first: squared-L2 distances are translation-invariant, and
  *   all-positive coordinates make integer division unambiguous
  *   (floor == truncate), so Spark's `div` and DuckDB's `//` agree.
  * - Seeds are the k smallest vec_ids (deterministic, replayable).
  * - Assignment: argmin of the integer squared distance, ties to the
  *   smaller centroid id. Update: per-dimension integer mean (floor).
  *
  * Scale shape: each round broadcasts the k-row centroid frame into the
  * points scan; the argmin is a map-side-combined `min_by` agg (the ×k
  * fan-out never shuffles — partials reduce to one row per point before
  * the exchange), and the update is a posexplode + (cid, dim) agg, the
  * same distributive form as [[Centroids]]. Per-round localCheckpoint
  * caps iterative lineage. Clusters that lose all points drop out (same
  * arithmetic in the oracle drops them identically).
  */
object KMeans {

  /** Fixed-point scale 2^20; `(v + Offset) * Scale` is exact in doubles
    * (|v| < 2 ⇒ the product is an integer-valued double below 2^22).
    */
  val Scale = 1048576L
  val Offset = 2.0

  /** (vec_id, p: array<long>) in offset fixed-point space. */
  def pointsFp(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).as("vec_id"),
      transform(col(vecCol), v =>
        floor((v.cast("double") + Offset) * Scale).cast("long")).as("p"))

  /** Nearest-centroid assignment: (vec_id, cid).
    *
    * The centroid frame is k×dim — tiny by construction — so it
    * collects to the driver and the argmin runs as a primitive-loop
    * kernel INSIDE the point scan: no ×k crossJoin fanout, no
    * re-aggregation shuffle, one row-local pass per point. Integer
    * arithmetic and the ties-to-smaller-cid rule are bit-identical to
    * [[assignDeclarative]] (the oracle-replayed reference rendering,
    * parity-pinned by KMeansSpec) — measured ~10× on the trained-IVF
    * path, where k ≈ √n makes the fanout k-fold the corpus.
    */
  private[graft] def assign(pts: DataFrame, cent: DataFrame): DataFrame = {
    val cents: Array[(Long, Array[Long])] = cent.collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
      .sortBy(_._1)
    // broadcast, not closure-capture: with the trained-IVF sizing
    // k ≈ √n the centroid table grows with the corpus, and a captured
    // array would ship inside EVERY task closure instead of once per
    // executor
    val bc = pts.sparkSession.sparkContext.broadcast(cents)
    val argmin = udf { (p: Seq[Long]) =>
      val cs = bc.value
      val pa = p.toArray
      var bestCid = 0L
      var bestD = Long.MaxValue
      var i = 0
      while (i < cs.length) {
        val c = cs(i)._2
        var d = 0L
        var j = 0
        val n = math.min(pa.length, c.length)
        while (j < n) { val x = pa(j) - c(j); d += x * x; j += 1 }
        // strict <: ascending-cid iteration keeps the smallest cid on ties
        if (d < bestD) { bestD = d; bestCid = cs(i)._1 }
        i += 1
      }
      bestCid
    }
    // materialize (eager localCheckpoint), then destroy the broadcast:
    // PQ training runs M subspaces × (iters+1) assigns per query and
    // the nearline soaks run one per batch — without the destroy every
    // centroid table stays pinned on the executors until its plan is
    // GC'd. The checkpoint is a 2-long-column frame, write cost noise
    // next to the point scan it caps.
    val out = pts.select(col("vec_id"), argmin(col("p")).as("cid"))
      .localCheckpoint()
    bc.destroy()
    out
  }

  /** The declarative Column rendering of [[assign]] — the form the
    * DuckDB oracles replay (crossJoin the broadcast centroids, integer
    * squared distance, min_by with ties to the smaller cid). Kept as
    * the bit-parity reference for the kernel.
    */
  private[graft] def assignDeclarative(
      pts: DataFrame, cent: DataFrame): DataFrame =
    pts.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("cid"),
        aggregate(
          zip_with(col("p"), col("c"), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x).as("dist"))
      .groupBy("vec_id")
      .agg(min_by(col("cid"), struct(col("dist"), col("cid"))).as("cid"))

  /** `iterations` Lloyd rounds over persisted fixed-point points →
    * final centroid frame (cid, c: array<long>).
    */
  private def lloyd(pts: DataFrame, k: Int, iterations: Int): DataFrame =
    lloydFrom(pts,
      pts.orderBy("vec_id").limit(k)
        .select(col("vec_id").as("cid"), col("p").as("c")),
      iterations)

  /** WARM-START Lloyd: `iterations` rounds from an explicit starting
    * centroid frame — the refinement step between a pure reassignment
    * and a from-scratch retrain (cold [[lloyd]] is this seeded by the
    * k lowest vec_ids). Same bit-exact integer geometry per round.
    */
  private[graft] def lloydFrom(pts: DataFrame, cent0: DataFrame,
      iterations: Int): DataFrame =
    // the single-group chain IS the grouped chain at grp = 0: each
    // round fuses the argmin into the update aggregation's scan — one
    // job per round, where the former assign-then-join form paid a
    // checkpointed assignment plus a vec_id join (two exchanges) per
    // round. Same integer arithmetic, same results (KMeansSpec).
    lloydMultiFrom(
      pts.select(lit(0).as("grp"), col("vec_id"), col("p")),
      cent0.select(lit(0).as("grp"), col("cid"), col("c")),
      iterations)
      .select("cid", "c")

  /** Final (vec_id, cid) assignment after `iterations` Lloyd rounds —
    * the clustering handle compositions build on (semantic dedup shards
    * the pair search by cid).
    */
  def fitAssign(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iterations: Int): DataFrame = {
    require(k >= 1 && iterations >= 1, "k and iterations must be >= 1")
    val pts = pointsFp(df, idCol, vecCol).persist()
    try {
      pts.count()
      // assign() materialises its output, so the caller can reference
      // the assignment repeatedly (pair-join sides) after pts unpersists
      assign(pts, lloyd(pts, k, iterations))
    } finally pts.unpersist()
  }

  /** As [[fitModel]], but over an ALREADY fixed-point points frame
    * (vec_id, p: array&lt;long&gt;) — the product-quantizer training
    * shape, where each subspace trains on a slice of the one shared
    * [[pointsFp]] projection (slicing fixed-point coordinates is
    * identical to fixing the sliced floats, so sub-chains replay
    * bit-exactly).
    */
  def fitModelFp(pts: DataFrame, k: Int, iterations: Int)
      : (DataFrame, DataFrame) = {
    require(k >= 1 && iterations >= 1, "k and iterations must be >= 1")
    val p = pts.persist()
    try {
      p.count()
      val cent = lloyd(p, k, iterations)
      (cent, assign(p, cent))
    } finally p.unpersist()
  }

  /** Centroids ONLY from `iterations` Lloyd rounds over an
    * already-fixed-point points frame — the frozen-codebook training
    * shape (the caller assigns OTHER frames against these centroids
    * later, so computing the training frame's own assignment here
    * would be wasted work).
    */
  def fitCentroidsFp(pts: DataFrame, k: Int, iterations: Int): DataFrame = {
    require(k >= 1 && iterations >= 1, "k and iterations must be >= 1")
    val p = pts.persist()
    try {
      p.count()
      lloyd(p, k, iterations)
    } finally p.unpersist()
  }

  /** One Lloyd run, BOTH outputs: the final centroid frame
    * (cid, c: array&lt;long&gt; fixed-point) and the final assignment
    * (vec_id, cid) against those centroids — the IVF training shape,
    * where the same model must serve as coarse quantizer (centroids,
    * probed per query) and as partition map (assignment, shards the
    * candidate scan). Both frames are materialised (localCheckpoint) so
    * the caller can reference them repeatedly without re-running Lloyd.
    */
  def fitModel(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iterations: Int): (DataFrame, DataFrame) = {
    require(k >= 1 && iterations >= 1, "k and iterations must be >= 1")
    val pts = pointsFp(df, idCol, vecCol).persist()
    try {
      pts.count()
      val cent = lloyd(pts, k, iterations)
      (cent, assign(pts, cent))
    } finally pts.unpersist()
  }

  /** Collect a GROUPED centroid frame (grp: int, cid: long,
    * c: array&lt;long&gt;) into the per-group argmin kernel's broadcast
    * shape: grp → centroids ascending by cid (the tie rule's iteration
    * order).
    */
  private def collectGrouped(cent: DataFrame)
      : Map[Int, Array[(Long, Array[Long])]] =
    cent.collect()
      .map(r => (r.getInt(0), (r.getLong(1), r.getSeq[Long](2).toArray)))
      .groupBy(_._1)
      .map { case (g, rs) => g -> rs.map(_._2).sortBy(_._1) }

  /** Per-group argmin kernel over a broadcast grp → centroids map —
    * the multi-group rendering of [[assign]]'s loop, bit-identical per
    * group (same integer distance, same strict-&lt; ties-to-smaller-cid
    * rule over ascending cids).
    */
  private def argminGrouped(
      bc: org.apache.spark.broadcast.Broadcast[
        Map[Int, Array[(Long, Array[Long])]]]) =
    udf { (g: Int, p: Seq[Long]) =>
      // a group with no centroid rows (e.g. an empty codebook frame)
      // assigns cid 0 for every point — the single-group assign()'s
      // empty-centroid behavior, not an executor NoSuchElementException
      val cs = bc.value.getOrElse(g, Array.empty[(Long, Array[Long])])
      val pa = p.toArray
      var bestCid = 0L
      var bestD = Long.MaxValue
      var i = 0
      while (i < cs.length) {
        val c = cs(i)._2
        var d = 0L
        var j = 0
        val n = math.min(pa.length, c.length)
        while (j < n) { val x = pa(j) - c(j); d += x * x; j += 1 }
        if (d < bestD) { bestD = d; bestCid = cs(i)._1 }
        i += 1
      }
      bestCid
    }

  /** MULTI-GROUP assignment: `pts` (grp: int, vec_id, p) against a
    * grouped centroid frame (grp, cid, c) — one Spark job assigns every
    * group, each group bit-identical to [[assign]] against that group's
    * centroids alone (KMeansSpec pins the parity). This is the
    * product-quantizer job-count lever: M subspaces assign in 1 pass
    * instead of M.
    */
  private[graft] def assignMulti(pts: DataFrame, cent: DataFrame)
      : DataFrame = {
    val bc = pts.sparkSession.sparkContext.broadcast(collectGrouped(cent))
    val out = pts.select(col("grp"), col("vec_id"),
      argminGrouped(bc)(col("grp"), col("p")).as("cid"))
      .localCheckpoint()
    bc.destroy()
    out
  }

  /** MULTI-GROUP warm-start Lloyd: `iterations` rounds over
    * (grp, vec_id, p) points from the grouped seed frame `cent0`
    * (grp, cid, c). Each round is ONE fused job — the per-group argmin
    * runs inside the update aggregation's scan (no materialised
    * assignment, no join back to the points), and per-(grp, cid, dim)
    * integer sums are disjoint across groups, so every group's chain
    * replays [[lloydFrom]] on its slice bit-exactly while the family
    * pays one job per round instead of one per group per round.
    * Precondition (callers': ProductQuantizer): groups partition the
    * SAME row set, i.e. every (grp, vec_id) appears exactly once.
    */
  private[graft] def lloydMultiFrom(pts: DataFrame, cent0: DataFrame,
      iterations: Int): DataFrame = {
    var cent = cent0
    for (_ <- 1 to iterations) {
      val bc = pts.sparkSession.sparkContext
        .broadcast(collectGrouped(cent))
      cent = pts
        .select(col("grp"), argminGrouped(bc)(col("grp"), col("p"))
          .as("cid"), col("p"))
        .select(col("grp"), col("cid"),
          posexplode(col("p")).as(Seq("d0", "v")))
        .groupBy(col("grp"), col("cid"),
          (col("d0") + 1).cast("long").as("dim"))
        .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
        .select(col("grp"), col("cid"), col("dim"),
          expr("s div n").as("cv"))
        .groupBy("grp", "cid")
        .agg(transform(
          array_sort(collect_list(struct(col("dim"), col("cv")))),
          x => x.getField("cv")).as("c"))
        .localCheckpoint()
      bc.destroy()
    }
    cent
  }

  /** Run `iterations` Lloyd rounds; output one row per (cluster, dim):
    * (cid, dim 1-based, n_points, centroid_fp) where n_points counts the
    * FINAL assignment against the last centroids.
    */
  def fit(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iterations: Int): DataFrame = {
    require(k >= 1 && iterations >= 1, "k and iterations must be >= 1")
    val pts = pointsFp(df, idCol, vecCol).persist()
    try {
      pts.count()
      val cent = lloyd(pts, k, iterations)
      val sizes = assign(pts, cent)
        .groupBy("cid").agg(count(lit(1)).as("n_points"))
      cent
        .select(col("cid"), posexplode(col("c")).as(Seq("d0", "cfp")))
        .select(col("cid"), (col("d0") + 1).cast("long").as("dim"),
          col("cfp").as("centroid_fp"))
        .join(sizes, "cid")
        .select("cid", "dim", "n_points", "centroid_fp")
    } finally pts.unpersist()
  }
}
