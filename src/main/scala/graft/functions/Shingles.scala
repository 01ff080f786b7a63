package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass primitive kernel for word k-gram shingling: whitespace
  * tokenize + k-gram join + first-occurrence dedup, bit-identical to the
  * declarative `shinglesFromTokens(tokens(text), k)` chain
  * (unit-asserted), element order included:
  *
  *  - leading/trailing ASCII space stripped, then Java-regex `\s+`
  *    split with limit -1 — exactly Spark's `split(trim(c), "\\s+")`,
  *    including the empty leading token a tab-led document produces;
  *  - a space-trimmed-empty document yields the single empty-string
  *    shingle (`concat_ws` over an empty token array);
  *  - documents shorter than k tokens collapse to one whole-text
  *    shingle; otherwise k-grams are space-joined and deduped keeping
  *    FIRST occurrence (`array_distinct` order).
  *
  * The declarative rendering pays one interpreted higher-order
  * transform + slice + concat_ws tree per position plus a generic
  * array_distinct; this kernel is one split and one LinkedHashSet pass —
  * the measured bottleneck of every shingle-based dedup query was this
  * construction, not the candidate joins.
  */
object ShingleKernel {

  // Hoisted like WordNgramKernel.WS — String.split recompiles the \s+
  // regex per row; Pattern.split is identical incl. limit=-1 semantics.
  private val WS = java.util.regex.Pattern.compile("\\s+")

  def eval(text: UTF8String, k: Int): ArrayData = {
    val s = text.toString
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    if (b == e)
      return new GenericArrayData(
        Array[Any](UTF8String.fromString("")))
    val t = WS.split(s.substring(b, e), -1)
    val n = t.length
    if (n < k) {
      return new GenericArrayData(
        Array[Any](UTF8String.fromString(t.mkString(" "))))
    }
    val seen = new java.util.LinkedHashSet[String](n * 2)
    var i = 0
    while (i <= n - k) {
      val sb = new java.lang.StringBuilder(32)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(t(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
  }
}

/** Native Catalyst expression `shingles_k(text, k)` → `array<string>`:
  * distinct word k-gram shingles in one primitive pass, inside
  * whole-stage codegen. `k` must be a foldable integer.
  */
case class Shingles(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (string, foldable int), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def prettyName: String = "shingles_k"

  override def nullSafeEval(a: Any, b: Any): Any =
    ShingleKernel.eval(a.asInstanceOf[UTF8String],
      b.asInstanceOf[Int])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ShingleKernel.eval($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Shingles =
    copy(left = newLeft, right = newRight)
}
