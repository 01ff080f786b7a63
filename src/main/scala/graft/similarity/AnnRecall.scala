package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Recall measurement for the ANN operators — grades LSH (tables ×
  * hash-bits) and IVF (nprobe) on the axis a 100 TB user actually
  * tunes: recall@k against the brute-force ground truth vs the work the
  * index admits (candidates scanned per query).
  *
  * The candidate generation is the SAME plan shape as the production
  * queries (`q_ann_lsh` / `q_ann_ivf` in
  * [[graft.queries.SimilarityQueries]]): band-key equi-join for LSH,
  * probed-cluster attach for IVF. Since both score candidates with the
  * exact cosine, recall@k equals |candidates ∩ true-top-k| / k — no
  * re-ranking needed for the measurement.
  */
object AnnRecall {

  final case class LshPoint(
      planes: Int, bandBits: Int, tables: Int,
      recallAt: Double, avgCandidates: Double)

  final case class IvfPoint(
      nprobe: Int, recallAt: Double, avgScannedFraction: Double)

  /** Brute-force ground truth: true top-k neighbor ids per query id. */
  def groundTruth(
      emb: DataFrame, numQueries: Int, k: Int): Map[Long, Seq[Long]] = {
    val q = emb.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val rank = row_number().over(
      Window.partitionBy("qid").orderBy(desc("cosine"), asc("vec_id")))
    emb.crossJoin(broadcast(q))
      .where(col("qid") =!= col("vec_id"))
      .withColumn("cosine", VectorFunctions.cosine(col("qv"), col("embedding")))
      .withColumn("rank", rank)
      .where(col("rank") <= k)
      .select("qid", "vec_id", "rank")
      .collect()
      .groupBy(_.getLong(0))
      .map { case (qid, rows) =>
        qid -> rows.sortBy(_.getInt(2)).map(_.getLong(1)).toSeq
      }
  }

  /** LSH candidate sets per query for one (planes, bandBits) config —
    * the q_ann_lsh band-join shape.
    */
  private def lshCandidates(
      emb: DataFrame, numQueries: Int, planes: Int, bandBits: Int)
      : Map[Long, Set[Long]] = {
    val keys = VectorFunctions.planeBandKeys(col("embedding"), planes, bandBits)
    val qb = emb.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"),
        posexplode(keys).as(Seq("band", "key")))
    val cb = emb.select(col("vec_id"), posexplode(keys).as(Seq("band", "key")))
    qb.join(cb, Seq("band", "key"))
      .where(col("qid") =!= col("vec_id"))
      .select("qid", "vec_id").distinct()
      .collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }
  }

  /** Sweep LSH configurations, returning recall@k + avg candidate count
    * (the per-query work the index admits — the cost knob).
    */
  def lshCurve(
      emb: DataFrame, configs: Seq[(Int, Int)], numQueries: Int = 50,
      k: Int = 10): Seq[LshPoint] = {
    val truth = groundTruth(emb, numQueries, k)
    configs.map { case (planes, bits) =>
      val cand = lshCandidates(emb, numQueries, planes, bits)
      val (recall, avgCand) = scoreCandidates(truth, cand, k)
      LshPoint(planes, bits, planes / bits, recall, avgCand)
    }
  }

  private def cosineLocalA(a: Seq[Float], b: Seq[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < math.min(a.length, b.length)) {
      val x = a(i).toDouble; val y = b(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Sweep IVF probe counts over a TRAINED k-means coarse quantizer —
    * the production `q_ann_ivf` shape ([[KMeans.fitModel]], centroids
    * probed in raw float space). Returns recall@k + avg corpus fraction
    * scanned per nprobe.
    */
  def ivfCurveTrained(
      emb: DataFrame, k: Int, iters: Int, nprobes: Seq[Int],
      numQueries: Int = 50, kAt: Int = 10): Seq[IvfPoint] = {
    val (centFp, asg) = KMeans.fitModel(emb, "vec_id", "embedding", k, iters)
    sweepKmeansIvf(emb, centFp, asg, nprobes, numQueries, kAt)
  }

  /** As [[ivfCurveTrained]], but the quantizer trains on `train` ONLY
    * (the streamed index's bootstrap batch) and is then FROZEN: the
    * whole corpus assigns to the fixed centroids by the bit-exact
    * integer argmin — the `q_stream_ann_ivf_trained` shape. Grades the
    * recall cost of bootstrap-only training, the question a 100 TB
    * streamed deployment actually faces (the model sees the first
    * arrivals, never retrains).
    */
  def ivfCurveFrozen(
      emb: DataFrame, train: DataFrame, k: Int, iters: Int,
      nprobes: Seq[Int], numQueries: Int = 50, kAt: Int = 10)
      : Seq[IvfPoint] = {
    val (centFp, _) = KMeans.fitModel(train, "vec_id", "embedding", k, iters)
    val asg = KMeans.assign(
      KMeans.pointsFp(emb, "vec_id", "embedding"), centFp)
    sweepKmeansIvf(emb, centFp, asg, nprobes, numQueries, kAt)
  }

  /** Shared sweep: probe the fixed-point centroid frame in raw float
    * space, score the probed clusters' members against ground truth.
    * The index state (corpus count, centroid/member/query collects)
    * is gathered ONCE and shared across every nprobe point.
    */
  private def sweepKmeansIvf(
      emb: DataFrame, centFp: DataFrame, asg: DataFrame,
      nprobes: Seq[Int], numQueries: Int, kAt: Int): Seq[IvfPoint] = {
    val truth = groundTruth(emb, numQueries, kAt)
    val state = collectIvfState(emb, centFp, asg, numQueries)
    nprobes.map { np =>
      val cand = kmeansCandidates(state, np)
      val (recall, _) = scoreCandidates(truth,
        cand.map { case (q, (c, _)) => q -> c }, kAt)
      IvfPoint(np, recall, cand.values.map(_._2).sum / cand.size)
    }
  }

  /** Driver-side snapshot of a k-means IVF index at measurement scale:
    * corpus size, float centroids, per-cluster member sets + sizes, and
    * the query vectors. Collected once so a multi-point nprobe sweep
    * amortizes the count and the collects across every point.
    */
  final case class IvfIndexState(
      total: Double, cent: Map[Long, Array[Double]],
      members: Map[Long, Set[Long]], sizes: Map[Long, Int],
      qRows: Array[(Long, Seq[Float])])

  def collectIvfState(
      emb: DataFrame, centFp: DataFrame, asg: DataFrame,
      numQueries: Int): IvfIndexState = {
    val total = emb.count().toDouble
    // cids stay Long end-to-end: a narrowing here could silently merge
    // clusters on collision and misreport recall/scanned-fraction
    val cent: Map[Long, Array[Double]] = centFp.collect().map { r =>
      r.getLong(0) ->
        r.getSeq[Long](1).map(_.toDouble / KMeans.Scale - KMeans.Offset)
          .toArray
    }.toMap
    val members: Map[Long, Set[Long]] = asg.collect()
      .groupBy(_.getLong(1))
      .map { case (c, rows) => c -> rows.map(_.getLong(0)).toSet }
    val sizes: Map[Long, Int] = members.map { case (c, m) => c -> m.size }
    val qRows = emb.where(col("vec_id") < numQueries)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    IvfIndexState(total, cent, members, sizes, qRows)
  }

  /** Per-query probed candidate sets (and scanned fraction) of a
    * k-means IVF index at one nprobe — the measurement primitive
    * [[sweepKmeansIvf]] and the scale-recall tool share. Single-point
    * convenience over [[collectIvfState]]; sweeps should collect the
    * state once and call the overload below per point.
    */
  def kmeansCandidates(
      emb: DataFrame, centFp: DataFrame, asg: DataFrame,
      nprobe: Int, numQueries: Int): Map[Long, (Set[Long], Double)] =
    kmeansCandidates(collectIvfState(emb, centFp, asg, numQueries), nprobe)

  /** Per-query probed (qid, cid) pairs at one nprobe — the probe table
    * the IVF-composed query paths broadcast (same ranking arithmetic as
    * [[kmeansCandidates]]: cosine of the raw query vs the float
    * centroid, ties to the smaller cid).
    */
  def probePairs(state: IvfIndexState, nprobe: Int): Seq[(Long, Long)] =
    state.qRows.toSeq.flatMap { case (qid, qv) =>
      state.cent.toSeq
        .map { case (l, cv) => (l, cosineLocalA(qv, cv)) }
        .sortBy { case (l, cc) => (-cc, l) }.take(nprobe)
        .map { case (l, _) => (qid, l) }
    }

  def kmeansCandidates(
      state: IvfIndexState, nprobe: Int): Map[Long, (Set[Long], Double)] = {
    import state.{total, cent, members, sizes, qRows}
    qRows.map { case (qid, qv) =>
      val probed = cent.toSeq
        .map { case (l, cv) => (l, cosineLocalA(qv, cv)) }
        .sortBy { case (l, cc) => (-cc, l) }.take(nprobe).map(_._1)
      qid -> (probed.flatMap(c => members.getOrElse(c, Set.empty))
        .toSet - qid,
        probed.map(c => sizes.getOrElse(c, 0)).sum.toDouble / total)
    }.toMap
  }

  /** Recall@k of the PQ/ADC ranking ([[ProductQuantizer.adcTopK]])
    * against brute-force truth. PQ reranks the WHOLE corpus through
    * its lookup tables (the knob is code budget, not scan fraction),
    * so the grade is top-k agreement of the approximate scores.
    */
  /** With `shortlist` > kAt this grades the ADC-shortlist-then-exact-
    * rerank deployment: recall@kAt equals the truth coverage of the
    * depth-`shortlist` ADC candidate list (the exact rerank recovers
    * any true neighbour the shortlist admits).
    */
  def pqRecall(s: org.apache.spark.sql.SparkSession, emb: DataFrame,
      m: Int = ProductQuantizer.NumSubspaces,
      k: Int = ProductQuantizer.CodebookK,
      numQueries: Int = 50, kAt: Int = 10,
      shortlist: Int = 10): Double = {
    val truth = groundTruth(emb, numQueries, kAt)
    val got = ProductQuantizer.adcTopK(
      s, emb.select("vec_id", "embedding"), "vec_id", "embedding",
      numQueries, math.max(kAt, shortlist), m, k)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }
    val per = truth.toSeq.map { case (q, top) =>
      top.count(got.getOrElse(q, Set.empty).contains).toDouble / top.size
    }
    per.sum / per.size
  }

  /** Recall@k of the JL-projected-space cosine ranking (q_ann_projected)
    * against full-dimension truth; with `shortlist` > kAt this grades
    * the project-shortlist-then-exact-rerank deployment (like
    * [[pqRecall]]). The measurement ranks driver-side — the corpus at
    * measurement scale collects; production stays the distributed
    * q_ann_projected plan.
    */
  def projRecall(emb: DataFrame, numQueries: Int = 50, kAt: Int = 10,
      shortlist: Int = 10): Double = {
    val truth = groundTruth(emb, numQueries, kAt)
    val pv = emb.select(col("vec_id"),
      VectorFunctions.project(col("embedding")).as("pv"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val qs = pv.filter(_._1 < numQueries)
    val depth = math.max(kAt, shortlist)
    val per = qs.map { case (qid, qv) =>
      val top = pv.filter(_._1 != qid)
        .map { case (id, v) => (id, cos(qv, v)) }
        .sortBy { case (id, c) => (-c, id) }.take(depth).map(_._1).toSet
      truth.get(qid).map(t =>
        t.count(top.contains).toDouble / t.size).getOrElse(0.0)
    }
    per.sum / per.length
  }

  /** Sweep IVF probe counts over the corpus's `label` coarse partition,
    * returning recall@k + the average fraction of the corpus scanned.
    */
  def ivfCurve(
      emb: DataFrame, nprobes: Seq[Int], numQueries: Int = 50,
      k: Int = 10): Seq[IvfPoint] = {
    val truth = groundTruth(emb, numQueries, k)
    val total = emb.count().toDouble
    // cluster sizes + centroids, computed once (the q_ann_ivf shape)
    val sizes = emb.groupBy("label").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val cent = emb
      .select(col("label"), posexplode(col("embedding")).as(Seq("d", "v")))
      .groupBy("label", "d")
      .agg((sum(col("v").cast(org.apache.spark.sql.types.DecimalType(38, 15)))
        .cast("double") / count(lit(1))).as("c"))
      .collect().groupBy(_.getInt(0))
      .map { case (l, rows) =>
        l -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)) }
    val qRows = emb.where(col("vec_id") < numQueries)
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1), r.getInt(2)))
    // membership per cluster (collected once; the corpus is
    // measurement-sized here — production stays distributed)
    val members = emb.select("vec_id", "label").collect()
      .groupBy(_.getInt(1)).map { case (l, rows) =>
        l -> rows.map(_.getLong(0)).toSet }
    def cosineLocal(a: Seq[Float], b: Seq[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < math.min(a.length, b.length)) {
        val x = a(i).toDouble; val y = b(i)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    nprobes.map { np =>
      val cand = qRows.map { case (qid, qv, _) =>
        val probed = cent.toSeq
          .map { case (l, cv) => (l, cosineLocal(qv, cv)) }
          .sortBy { case (l, cc) => (-cc, l) }.take(np).map(_._1)
        qid -> (probed.flatMap(members).toSet - qid,
          probed.map(sizes).sum.toDouble / total)
      }.toMap
      val (recall, _) = scoreCandidates(truth,
        cand.map { case (q, (c, _)) => q -> c }, k)
      IvfPoint(np, recall, cand.values.map(_._2).sum / cand.size)
    }
  }

  private def scoreCandidates(
      truth: Map[Long, Seq[Long]], cand: Map[Long, Set[Long]], k: Int)
      : (Double, Double) = {
    // toSeq FIRST: mapping the Map directly to (recall, candCount)
    // tuples would rebuild a Map KEYED BY RECALL, silently collapsing
    // every pair of queries with equal recall before the average
    val per = truth.toSeq.map { case (q, top) =>
      val c = cand.getOrElse(q, Set.empty)
      (top.count(c.contains).toDouble / top.size, c.size.toDouble)
    }
    (per.map(_._1).sum / per.size, per.map(_._2).sum / per.size)
  }
}
