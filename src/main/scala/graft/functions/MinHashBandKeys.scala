package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass primitive kernel for the MinHash-LSH band keys: from a
  * shingle array, the 64-permutation signature minima
  * (h_i(x) = (a_i * (md5_60(x) mod p) + b_i) mod p, Mersenne p = 2^31-1)
  * sliced into [[graft.dedup.Dedup.NumBands]] comma-joined band-key
  * strings. Shared by the native expression's interpreted and codegen
  * paths, and bit-identical to both the declarative
  * `bandKeys(minHashSignature(...))` Column rendering and the DuckDB
  * oracle (unit-asserted): all arithmetic is exact 64-bit integer.
  *
  * The MD5 digester is thread-local — one instance per task thread, not
  * one per shingle — and shingle bytes are read straight off the
  * columnar UTF8String without materialising java.lang.Strings.
  */
object MinHashKernel {
  import graft.dedup.Dedup.{BandRows, MinHashP, NumBands, NumHashes}

  private val A: Array[Long] = graft.dedup.Dedup.HashA.toArray
  private val B: Array[Long] = graft.dedup.Dedup.HashB.toArray

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def eval(arr: ArrayData): ArrayData = {
    val sig = new Array[Long](NumHashes)
    java.util.Arrays.fill(sig, MinHashP)
    val digest = md5.get()
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      digest.reset()
      val h31 = graft.text.TextFunctions
        .fold60(digest.digest(arr.getUTF8String(j).getBytes)) % MinHashP
      var i = 0
      while (i < NumHashes) {
        val v = (A(i) * h31 + B(i)) % MinHashP
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      j += 1
    }
    val out = new Array[Any](NumBands)
    var b = 0
    while (b < NumBands) {
      val sb = new java.lang.StringBuilder(4 * 11)
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
}

/** Native Catalyst expression `minhash_band_keys(array<string>)` →
  * `array<string>`: per-document MinHash-LSH band keys in ONE primitive
  * pass over the shingles (64 × |shingles| multiply-mod ops). Replaces
  * the mapPartitions rendering of the same kernel — as an Expression it
  * stays inside whole-stage codegen (no Row boxing, no codegen fence
  * around the projection) and composes with any surrounding plan.
  */
case class MinHashBandKeys(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def prettyName: String = "minhash_band_keys"

  override def nullSafeEval(a: Any): Any =
    MinHashKernel.eval(a.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.MinHashKernel.eval($a);")

  override protected def withNewChildInternal(
      newChild: Expression): MinHashBandKeys = copy(child = newChild)
}
