package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass primitive kernel for character n-gram generation:
  * bit-identical to the declarative per-position rendering
  * `transform(sequence(1, len−n+1), i -> substring(text, i, n))`
  * (unit-asserted in LangIdNbSpec), but O(len) instead of O(len²) —
  * `UTF8String.substring` locates its start CODEPOINT by scanning from
  * byte 0 on every call, so the per-position rendering rescans the
  * whole prefix for each gram (measured 277s → 56s on the sf10
  * q_langid_trained corpus scan). Here the codepoint→byte offsets are
  * computed once per row and each gram is a byte-range copy.
  */
object CharNgramKernel {

  def eval(text: UTF8String, n: Int): ArrayData = {
    // mirrored in CharNgrams.checkInputDataTypes (analysis-time); this
    // guard covers direct kernel callers and keeps the executor error
    // legible instead of an ArrayIndexOutOfBounds (n < 0) or a silent
    // len+1 empty-string grams result (n = 0)
    if (n < 1) throw new IllegalArgumentException(
      s"char_ngrams: n must be >= 1, got $n")
    val total = text.numChars()
    if (total < n) return new GenericArrayData(Array.empty[Any])
    val bytes = text.getBytes
    // codepoint start offsets, one linear scan
    val offs = new Array[Int](total + 1)
    var pos = 0
    var cp = 0
    while (cp < total) {
      offs(cp) = pos
      pos += UTF8String.numBytesForFirstByte(bytes(pos))
      cp += 1
    }
    offs(total) = bytes.length
    val m = total - n + 1
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      out(i) = UTF8String.fromBytes(bytes, offs(i), offs(i + n) - offs(i))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native Catalyst expression `char_ngrams(text, n)` → `array<string>`:
  * every n-codepoint window of `text` in one primitive pass, inside
  * whole-stage codegen. `n` must be a foldable integer ≥ 1. Mirrored in
  * SQL by `list_transform(range(1, len−n+2), i -> substr(text, i, n))`
  * (see [[graft.text.LangIdNb.charNgrams]]).
  */
case class CharNgrams(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) if right.foldable =>
        // the documented contract is n >= 1; catching it at analysis
        // time keeps a bad literal off the executors (where n < 0
        // would throw per-row and n = 0 would silently emit len+1
        // empty-string grams)
        right.eval() match {
          case null => TypeCheckResult.TypeCheckFailure(
            s"$prettyName: n must not be null")
          case v: Integer if v < 1 => TypeCheckResult.TypeCheckFailure(
            s"$prettyName: n must be >= 1, got $v")
          case _ => TypeCheckResult.TypeCheckSuccess
        }
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (string, foldable int), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def prettyName: String = "char_ngrams"

  override def nullSafeEval(a: Any, b: Any): Any =
    CharNgramKernel.eval(a.asInstanceOf[UTF8String], b.asInstanceOf[Int])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.CharNgramKernel.eval($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CharNgrams =
    copy(left = newLeft, right = newRight)
}
