package graft.similarity

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector similarity over `array<float>` embedding columns — pure Column
  * composition (codegen'd, no UDFs). Dot products run in double with a
  * strict left-to-right fold so results are bit-identical to the DuckDB
  * oracle's sequential list reduction.
  */
object VectorFunctions {

  /** Left-fold double dot product: 0.0 + a1*b1 + a2*b2 + … */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Primitive-loop cosine kernel, bit-identical to [[cosine]] (same
    * left-to-right double accumulation). Use on HOT pair sets — e.g. the
    * candidate pairs of an LSH similarity join, where the interpreted
    * higher-order expression's boxing dominates the query.
    */
  val cosineKernel: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (a: Seq[Float], b: Seq[Float]) =>
      var dotAcc = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dotAcc += x * y; na += x * x; nb += y * y
        i += 1
      }
      dotAcc / (math.sqrt(na) * math.sqrt(nb))
    }

  // ------------------------------------------------------------------
  // random-hyperplane LSH
  // ------------------------------------------------------------------

  val NumPlanes = 16
  val PlaneBandBits = 4
  val NumPlaneBands: Int = NumPlanes / PlaneBandBits
  val Dim = 64

  /** Deterministic pseudo-random hyperplane `p`: components on a
    * thousandths grid in [-1, 1] from [[graft.util.SplitMix]] mixing, so
    * the exact same literals can be embedded in oracle SQL (a 3-decimal
    * literal parses to the identical double in any engine). Defined for
    * ANY index — the recall-curve harness sweeps table counts beyond the
    * default [[NumPlanes]].
    */
  def hyperplane(p: Int): IndexedSeq[Double] =
    (0 until Dim).map { d =>
      (math.floorMod(graft.util.SplitMix.mix(p.toLong * Dim + d), 2001L)
        - 1000L) / 1000.0
    }

  val Hyperplanes: IndexedSeq[IndexedSeq[Double]] =
    (0 until NumPlanes).map(hyperplane)

  /** Render a hyperplane's components as SQL literals (exactly what
    * [[planeLit]] feeds Spark).
    */
  def planeSqlLiterals(p: Int): Seq[String] =
    Hyperplanes(p).map(v => graft.util.Fmt.fixed(v, 3))

  private def planeLit(p: Int): Column =
    array(hyperplane(p).map(v =>
      lit(graft.util.Fmt.fixed(v, 3).toDouble)): _*)

  /** Johnson–Lindenstrauss-style deterministic random projection: the
    * REAL-VALUED dots against the first `k` hyperplanes (the LSH sign
    * bits keep only `sign(dot)`; this keeps the value). The classic
    * third embedding-compression axis next to int8 (coarser values)
    * and PQ (codes): 64 float dims become `k` doubles, shrinking ANN
    * candidate-generation compute and shuffle width 64/k-fold, with
    * recall measured (not assumed) by the AnnRecall harness. Same
    * 3-decimal plane literals as the LSH — the oracle replays the
    * projection exactly.
    */
  def project(v: Column, k: Int = NumPlanes): Column =
    array((0 until k).map(p => dot(v, planeLit(p))): _*)

  /** One sign bit per hyperplane: '1' where dot(v, plane) > 0. */
  def planeBits(v: Column): Column = planeBits(v, NumPlanes)

  def planeBits(v: Column, numPlanes: Int): Column =
    concat((0 until numPlanes).map { p =>
      when(dot(v, planeLit(p)) > 0, "1").otherwise("0")
    }: _*)

  /** LSH band keys: the bit signature cut into [[NumPlaneBands]] chunks
    * of [[PlaneBandBits]] bits. Candidates for a similarity join are the
    * pairs sharing (band index, chunk) — an equi-join, never an
    * all-pairs product. More bits per band → higher precision, lower
    * recall; 4 bits suits a weak-similarity corpus, 8-16 bits a
    * true near-dup corpus at scale. The (tables × hashes) tradeoff is
    * MEASURED per configuration by [[AnnRecall.lshCurve]].
    */
  def planeBandKeys(v: Column): Column =
    planeBandKeys(v, NumPlanes, PlaneBandBits)

  /** Parameterized band keys: `numPlanes / bandBits` tables of
    * `bandBits`-bit hashes (numPlanes must divide evenly).
    */
  def planeBandKeys(v: Column, numPlanes: Int, bandBits: Int): Column = {
    require(numPlanes % bandBits == 0,
      s"numPlanes $numPlanes must be a multiple of bandBits $bandBits")
    val bits = planeBits(v, numPlanes)
    array((0 until numPlanes / bandBits).map { b =>
      substring(bits, b * bandBits + 1, bandBits)
    }: _*)
  }
}
