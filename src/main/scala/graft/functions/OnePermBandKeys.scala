package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-permutation MinHash band keys (Li, Owen & Zhang, NIPS 2012) with
  * rotation densification (Shrivastava & Li, ICML 2014): ONE permuted
  * hash per shingle — h = (a·(md5_60(x) mod p) + b) mod p, the same
  * Mersenne-31 space as [[MinHashKernel]] — scattered into
  * K = 64 strided bins (bin = h mod K, minimum kept per bin); empty bins
  * borrow the nearest occupied bin to the right (cyclic), offset by
  * t·p per rotation step so mutually-empty bins of DIFFERENT documents
  * never collide spuriously.
  *
  * The point at 100 TB: classic MinHash does 64 multiply-mods per
  * shingle; this does ONE — signature CPU was the measured bottleneck
  * of every dedup query, and the hash pass is the part that scales with
  * the corpus. Same banding layout downstream (16 bands × 4 rows), same
  * exact-verify contract, estimator variance within the same order.
  *
  * All arithmetic is exact 64-bit integer (max value ≈ 64·p < 2^37), so
  * the DuckDB oracle replays the signature bit-identically.
  */
object OnePermKernel {
  import graft.dedup.Dedup.{BandRows, MinHashP, NumBands, NumHashes}

  /** Bins == signature width == 64 (NumHashes), banded exactly like the
    * classic signature.
    */
  val K: Int = NumHashes

  /** Rotation offset constant: ≥ p keeps borrowed values outside the
    * native value range of any bin.
    */
  val C: Long = MinHashP

  private val A0: Long = graft.dedup.Dedup.HashA(0)
  private val B0: Long = graft.dedup.Dedup.HashB(0)

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Bin minima (-1 = empty) then rotation-densified signature. */
  private def densify(m: Array[Long]): Array[Long] = {
    val sig = new Array[Long](K)
    var j = 0
    while (j < K) {
      var t = 0
      var v = -1L
      while (t < K && v < 0) {
        val src = m((j + t) % K)
        if (src >= 0) v = src + t.toLong * C
        t += 1
      }
      sig(j) = if (v >= 0) v else MinHashP // no occupied bin at all
      j += 1
    }
    sig
  }

  def eval(arr: ArrayData): ArrayData = {
    val m = new Array[Long](K)
    java.util.Arrays.fill(m, -1L)
    val digest = md5.get()
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      digest.reset()
      val h31 = graft.text.TextFunctions
        .fold60(digest.digest(arr.getUTF8String(i).getBytes)) % MinHashP
      val h = (A0 * h31 + B0) % MinHashP
      val j = (h % K).toInt
      if (m(j) < 0 || h < m(j)) m(j) = h
      i += 1
    }
    val sig = densify(m)
    val out = new Array[Any](NumBands)
    var b = 0
    while (b < NumBands) {
      val sb = new java.lang.StringBuilder(4 * 12)
      var r = 0
      while (r < BandRows) {
        if (r > 0) sb.append(',')
        sb.append(sig(b * BandRows + r))
        r += 1
      }
      out(b) = UTF8String.fromString(sb.toString)
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Plain-Scala reference over already-materialised shingles —
    * bit-parity pin for the kernel (and the shape the DuckDB oracle
    * mirrors).
    */
  private[graft] def ref(shingles: Seq[String]): Seq[String] = {
    val m = Array.fill(K)(-1L)
    shingles.foreach { g =>
      val h31 = graft.text.TextFunctions.md5Hash60(g) % MinHashP
      val h = (A0 * h31 + B0) % MinHashP
      val j = (h % K).toInt
      if (m(j) < 0 || h < m(j)) m(j) = h
    }
    val sig = densify(m)
    (0 until NumBands).map { b =>
      sig.slice(b * BandRows, (b + 1) * BandRows).mkString(",")
    }
  }
}

/** Native Catalyst expression `oneperm_band_keys(array<string>)` →
  * `array<string>`: the one-permutation-hashing LSH band keys in one
  * primitive pass (1 multiply-mod per shingle vs the classic kernel's
  * 64), inside whole-stage codegen.
  */
case class OnePermBandKeys(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def prettyName: String = "oneperm_band_keys"

  override def nullSafeEval(a: Any): Any =
    OnePermKernel.eval(a.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.OnePermKernel.eval($a);")

  override protected def withNewChildInternal(
      newChild: Expression): OnePermBandKeys = copy(child = newChild)
}
