package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-DETERMINISTIC natural log of positive integer-valued
  * columns.
  *
  * libm `ln()` is only faithfully rounded — JVM `Math.log` and a SQL
  * engine's `ln` may disagree in the last ulp, and a fixed-point
  * `floor(x * 2^20)` snap can amplify that ulp into a flipped integer
  * (the latent cross-engine flake flagged on the BM25 scorer). This
  * helper removes libm from BOTH plans: range-reduce `m = 2^k * r`
  * with an explicit power-of-two CASE ladder (exact double literals),
  * then `ln(r)` for `r in [1,2)` via the odd artanh series on
  * `t = (r-1)/(r+1) in [0, 1/3]` — Horner to `t^15`, absolute error
  * under 1e-9. Every operation involved is a correctly-rounded
  * IEEE-754 `+ - * /` or a decimal-literal parse, both of which every
  * engine rounds identically, so the Column rendering and the SQL
  * rendering below produce bit-identical doubles by construction.
  * The approximation — not libm ln — IS the engine's log definition
  * for ranking scores; it is strictly increasing in `m`, so orderings
  * keep BM25/TF-IDF qualitative behaviour.
  *
  * Rational arguments: `ln(a/b) = lnInt(a) - lnInt(b)`; the BM25 idf
  * argument `(N - df + 0.5) / (df + 0.5)` is `(2N-2df+1) / (2df+1)`,
  * a ratio of integers.
  */
object DetLog {

  /** Nearest double to ln 2 (hardcoded shortest repr — parsing it is
    * deterministic where `Math.log(2)` is not guaranteed to be).
    */
  val Ln2Str = "0.6931471805599453"
  val Ln2: Double = Ln2Str.toDouble

  /** 1/3, 1/5, ... 1/15 — exact IEEE divisions; emitted to SQL via
    * shortest-round-trip `toString`, which parses back to the same
    * double in any correctly-rounded reader.
    */
  private val C3 = 1.0 / 3.0
  private val C5 = 1.0 / 5.0
  private val C7 = 1.0 / 7.0
  private val C9 = 1.0 / 9.0
  private val C11 = 1.0 / 11.0
  private val C13 = 1.0 / 13.0
  private val C15 = 1.0 / 15.0

  /** Ladder exponents, high to low; covers every positive Long. */
  private val Ks: Seq[Int] = 62 to 1 by -1

  // ---- Column rendering -------------------------------------------------

  /** floor(log2(m)) of a positive integer column — EXACT integer route:
    * the bit length of m minus one (`bin` renders without leading
    * zeros). No floating log anywhere near the branch, and identical to
    * the SQL rendering's explicit CASE ladder because both compute the
    * same integer exactly. (A Column-side CASE ladder was measured ~2×
    * slower on vocabulary-sized frames: Catalyst inlines the 62-branch
    * tree into every reference.)
    */
  private def kBits(m: Column): Column =
    (length(bin(m)) - 1).cast("int")

  /** 2^floor(log2(m)) as an exact double: integer shift, exact cast. */
  private def p2Bits(m: Column): Column =
    call_function("shiftleft", lit(1L), kBits(m)).cast("double")

  private def horner(t2: Column): Column =
    lit(1.0) + t2 * (lit(C3) + t2 * (lit(C5) + t2 * (lit(C7) +
      t2 * (lit(C9) + t2 * (lit(C11) + t2 * (lit(C13) + t2 * lit(C15)))))))

  /** Deterministic ln of a positive integer-valued (long) column. */
  def lnInt(m: Column): Column = {
    val r = m.cast("double") / p2Bits(m)
    val t = (r - lit(1.0)) / (r + lit(1.0))
    val t2 = t * t
    kBits(m).cast("double") * lit(Ln2) + lit(2.0) * (t * horner(t2))
  }

  /** Deterministic ln(a/b) for positive integer-valued columns. */
  def lnRatio(a: Column, b: Column): Column = lnInt(a) - lnInt(b)

  // ---- SQL rendering (DuckDB-portable; same arithmetic DAG) -------------

  def kSql(m: String): String =
    "CASE " + Ks.map(j => s"WHEN $m >= ${1L << j} THEN $j")
      .mkString(" ") + " ELSE 0 END"

  /** Power-of-two literals emitted as the double's own shortest
    * round-trip repr: exponent-form literals are DOUBLE in DuckDB
    * (skipping DECIMAL entirely), and shortest-repr parse is exact.
    */
  def p2Sql(m: String): String =
    "CASE " + Ks.map(j =>
      s"WHEN $m >= ${1L << j} THEN ${(1L << j).toDouble.toString}")
      .mkString(" ") + " ELSE 1.0 END"

  /** Non-exact coefficients as CAST('…' AS DOUBLE): a bare 16-digit
    * literal like 0.3333333333333333 types as DECIMAL(17,16) in DuckDB,
    * and the bit-identity claim would then rest on the oracle engine's
    * DECIMAL→DOUBLE cast rounding — an implementation detail. A quoted
    * string→double parse is the correctly-rounded shortest-repr route,
    * the same guarantee the Scala side gets from `"0.69…".toDouble`.
    */
  private def dlit(d: Double): String = s"CAST('${d.toString}' AS DOUBLE)"

  def hornerSql(t2: String): String =
    s"1.0 + $t2 * (${dlit(C3)} + $t2 * (${dlit(C5)} + $t2 * (${dlit(C7)} " +
      s"+ $t2 * (${dlit(C9)} + $t2 * (${dlit(C11)} + $t2 * (${dlit(C13)} " +
      s"+ $t2 * ${dlit(C15)}))))))"

  private def finishSql(k: String, t: String, t2: String): String =
    s"CAST($k AS DOUBLE) * CAST('$Ln2Str' AS DOUBLE) + " +
      s"2.0 * ($t * (${hornerSql(t2)}))"

  /** CTE chain computing `outCol = lnInt(aExpr) - lnInt(bExpr)` over
    * `srcFrom` (a FROM fragment), carrying `carry` columns through.
    * The final CTE is named `prefix`. Staged so the big ladders and
    * the t/t2 subtrees are evaluated once per row, mirroring the
    * Column DAG exactly.
    */
  def lnRatioCtes(prefix: String, srcFrom: String, aExpr: String,
      bExpr: String, outCol: String, carry: Seq[String]): String = {
    val cs = if (carry.isEmpty) "" else carry.mkString(", ") + ", "
    s"""${prefix}_m AS (SELECT $cs$aExpr AS __ma, $bExpr AS __mb
       |  FROM $srcFrom),
       |${prefix}_r AS (SELECT $cs${kSql("__ma")} AS __ka,
       |    CAST(__ma AS DOUBLE) / (${p2Sql("__ma")}) AS __ra,
       |    ${kSql("__mb")} AS __kb,
       |    CAST(__mb AS DOUBLE) / (${p2Sql("__mb")}) AS __rb
       |  FROM ${prefix}_m),
       |${prefix}_t AS (SELECT $cs${"__ka, __kb"},
       |    (__ra - 1.0) / (__ra + 1.0) AS __ta,
       |    (__rb - 1.0) / (__rb + 1.0) AS __tb
       |  FROM ${prefix}_r),
       |${prefix}_t2 AS (SELECT $cs${"__ka, __kb"}, __ta, __tb,
       |    __ta * __ta AS __ta2, __tb * __tb AS __tb2
       |  FROM ${prefix}_t),
       |$prefix AS (SELECT $cs(${finishSql("__ka", "__ta", "__ta2")})
       |    - (${finishSql("__kb", "__tb", "__tb2")}) AS $outCol
       |  FROM ${prefix}_t2)""".stripMargin
  }

  /** CTE chain computing `outCol = lnInt(mExpr)` over `srcFrom`,
    * carrying `carry` columns; final CTE named `prefix`.
    */
  def lnCtes(prefix: String, srcFrom: String, mExpr: String,
      outCol: String, carry: Seq[String]): String = {
    val cs = if (carry.isEmpty) "" else carry.mkString(", ") + ", "
    s"""${prefix}_m AS (SELECT $cs$mExpr AS __m FROM $srcFrom),
       |${prefix}_r AS (SELECT $cs${kSql("__m")} AS __k,
       |    CAST(__m AS DOUBLE) / (${p2Sql("__m")}) AS __r
       |  FROM ${prefix}_m),
       |${prefix}_t AS (SELECT $cs${"__k"}, (__r - 1.0) / (__r + 1.0) AS __t
       |  FROM ${prefix}_r),
       |${prefix}_t2 AS (SELECT $cs${"__k"}, __t, __t * __t AS __t2
       |  FROM ${prefix}_t),
       |$prefix AS (SELECT $cs${finishSql("__k", "__t", "__t2")} AS $outCol
       |  FROM ${prefix}_t2)""".stripMargin
  }

  // ---- Plain-Scala reference (same DAG; for specs and driver use) -------

  def lnIntRef(m: Long): Double = {
    require(m >= 1, s"lnIntRef needs a positive integer, got $m")
    var k = 0
    var j = 62
    while (j >= 1 && k == 0) { if (m >= (1L << j)) k = j; j -= 1 }
    val p2 = if (k == 0) 1.0 else (1L << k).toDouble
    val r = m.toDouble / p2
    val t = (r - 1.0) / (r + 1.0)
    val t2 = t * t
    val h = 1.0 + t2 * (C3 + t2 * (C5 + t2 * (C7 + t2 * (C9 +
      t2 * (C11 + t2 * (C13 + t2 * C15))))))
    k.toDouble * Ln2 + 2.0 * (t * h)
  }

  def lnRatioRef(a: Long, b: Long): Double = lnIntRef(a) - lnIntRef(b)
}
