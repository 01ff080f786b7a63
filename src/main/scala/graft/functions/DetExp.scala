package graft.functions

/** Cross-engine-DETERMINISTIC exponential on 2^-20 fixed-point inputs —
  * [[DetLog]]'s sibling for the operators that need `exp` VALUES (the
  * DoReMi exponentiated-gradient domain-weight step), where DetLog only
  * removes libm from log-space SUMS.
  *
  * Pure INTEGER arithmetic end to end, so the replay story is even
  * stronger than DetLog's IEEE-determinism argument: `exp(x)` for
  * `x = xFp/2^20` is DEFINED as the exact Long this object computes —
  * range-reduce `x = k + r` (integer nats + fractional part), `e^r` by
  * the 13-term Taylor sum with an explicit floor division at every
  * term (`t_i = t_{i-1}·rFp div (i·2^20)`, all operands positive), then
  * `k` sequential multiplies by `EFp = ⌊e·2^20⌋` with a floor division
  * each. Every step is a Long multiply/divide both engines perform
  * identically (DuckDB `//`, driver `/` — equal on non-negative
  * operands), so the fixed-point result is bit-identical by
  * construction. Negative inputs invert: `2^40 div expFp(−x)`.
  *
  * Absolute error of the quantization is ≤ ~k·2^-20·e^k (one floor per
  * stage) — like every DetLog snap, the quantized value IS the
  * operator's definition, not an approximation of one.
  *
  * Domain: |x| < 15 nats ([[MaxAbsX]]) keeps every intermediate inside
  * Long (`acc·EFp ≤ e^14·2^20·2^21.5 < 2^63`); callers clamp (an excess
  * loss of 15 nats per token is ~e^15 likelihood ratio — far beyond any
  * meaningful signal).
  */
object DetExp {

  /** Fixed-point scale, shared with the LM chains (2^20). */
  val Scale: Long = 1L << 20

  /** ⌊e · 2^20⌋ — the per-integer-nat multiplier. */
  val EFp: Long = 2850325L

  /** Taylor terms for e^r, r ∈ [0, 1): term 13 is ⌊2^20/13!⌋ = 0, so
    * the series is exhausted at this depth for every representable r.
    */
  val Terms = 13

  /** Domain bound: |xFp| must stay under 15 · 2^20. */
  val MaxAbsX: Long = 15L * Scale

  /** exp of a 2^-20 fixed-point value, as a 2^20 fixed-point Long. */
  def expFp(xFp: Long): Long = {
    require(math.abs(xFp) < MaxAbsX,
      s"DetExp domain is |x| < 15 nats: $xFp")
    val ax = math.abs(xFp)
    val k = ax >> 20
    val r = ax & (Scale - 1)
    var term = Scale
    var sum = term
    var i = 1
    while (i <= Terms) {
      term = term * r / (i * Scale)
      sum += term
      i += 1
    }
    var acc = sum
    var j = 0L
    while (j < k) {
      acc = acc * EFp / Scale
      j += 1
    }
    if (xFp < 0) (1L << 40) / acc else acc
  }

  /** DuckDB CTE chain computing `$outName = expFp($xExpr)` for every
    * row of `$srcFrom`, carrying `keyCols` (and `extraCols`) through —
    * the [[DetLog.lnRatioCtes]] convention. The Taylor terms are
    * explicit chained CTEs (one floor division per stage, same order
    * as [[expFp]]); the k-nat power is a `list_reduce` whose lambda
    * touches only the accumulator (the tokenHash fold shape — safe
    * from the DuckDB reduce-contamination bug the unigram backtrack
    * hit, which needs row columns re-read inside the lambda).
    */
  def expFpCtes(prefix: String, srcFrom: String, xExpr: String,
      outName: String, keyCols: Seq[String],
      extraCols: Seq[String] = Nil): String = {
    val keys = (keyCols ++ extraCols).mkString(", ")
    val keysC = if (keys.isEmpty) "" else keys + ", "
    val taylor = (1 to Terms).map { i =>
      s"""${prefix}_t$i AS (SELECT *,
         |  (t${i - 1} * r) // (${i}::BIGINT * $Scale) AS t$i
         |  FROM ${prefix}_t${i - 1})""".stripMargin
    }.mkString(",\n")
    val sumTs = (0 to Terms).map(i => s"t$i").mkString(" + ")
    s"""${prefix}_in AS (SELECT $keysC
       |  CAST($xExpr AS BIGINT) AS x FROM $srcFrom),
       |${prefix}_rk AS (SELECT *, abs(x) // $Scale AS k,
       |  abs(x) % $Scale AS r FROM ${prefix}_in),
       |${prefix}_t0 AS (SELECT *, CAST($Scale AS BIGINT) AS t0
       |  FROM ${prefix}_rk),
       |$taylor,
       |${prefix}_s AS (SELECT *, $sumTs AS ts FROM ${prefix}_t$Terms),
       |${prefix}_p AS (SELECT *, list_reduce(
       |    [ts] || list_transform(range(k), i -> CAST(0 AS BIGINT)),
       |    (acc, v) -> (acc * $EFp) // $Scale) AS ep
       |  FROM ${prefix}_s),
       |$prefix AS (SELECT $keysC x,
       |  CASE WHEN x < 0 THEN CAST(1099511627776 AS BIGINT) // ep
       |       ELSE ep END AS $outName
       |  FROM ${prefix}_p)""".stripMargin
  }
}
