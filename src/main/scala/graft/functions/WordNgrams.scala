package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass primitive kernel for word n-grams WITH repeats —
  * [[ShingleKernel]]'s non-distinct sibling, bit-identical to the
  * declarative `TextFunctions.ngrams(TextFunctions.tokens(text), n)`
  * chain (unit-asserted):
  *
  *  - leading/trailing ASCII space stripped, then Java-regex `\s+`
  *    split with limit -1 — exactly Spark's `split(trim(c), "\\s+")`,
  *    including the empty leading token a tab-led document produces;
  *  - a space-trimmed-empty document yields the EMPTY array
  *    (`tokens` → `[]`, `size < n`);
  *  - documents shorter than n tokens yield the EMPTY array (the
  *    `ngrams` convention — repetition/diversity statistics must not
  *    count a partial gram; contrast [[ShingleKernel]]'s whole-text
  *    fallback, which dedup candidate generation needs);
  *  - otherwise all `len−n+1` space-joined grams in order, repeats
  *    kept (multiplicities are the point for diversity/repetition
  *    statistics).
  *
  * The declarative rendering pays an interpreted transform + slice +
  * concat_ws tree per position — and Catalyst INLINES the `split`
  * into every lambda reference, so each position re-tokenizes the
  * document: O(len²) per document per n. Measured on q_ngram_diversity
  * at sf1: the three-n explode dominated the query (116s; the
  * (source, n, gram) exchange itself is combine-reduced and linear).
  */
object WordNgramKernel {

  // String.split recompiles multi-char regexes per call; Pattern is
  // thread-safe and Pattern.split keeps the limit=-1 trailing-empty
  // semantics, so this is the same tokenization without per-row compile.
  private val WS = java.util.regex.Pattern.compile("\\s+")

  def eval(text: UTF8String, n: Int): ArrayData = {
    val s = text.toString
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    if (b == e) return new GenericArrayData(Array.empty[Any])
    val t = WS.split(s.substring(b, e), -1)
    val len = t.length
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](len - n + 1)
    var i = 0
    while (i <= len - n) {
      val sb = new java.lang.StringBuilder(32)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(t(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native Catalyst expression `word_ngrams(text, n)` → `array<string>`:
  * word n-grams with repeats in one primitive pass, inside whole-stage
  * codegen. `n` must be a foldable integer ≥ 1 (validated at analysis
  * time — the [[CharNgrams]] convention).
  */
case class WordNgrams(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) if right.foldable =>
        val n = right.eval()
        if (n != null && n.asInstanceOf[Int] >= 1)
          TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects n >= 1, got $n")
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (string, foldable int), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def prettyName: String = "word_ngrams"

  override def nullSafeEval(a: Any, b: Any): Any =
    WordNgramKernel.eval(a.asInstanceOf[UTF8String], b.asInstanceOf[Int])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.WordNgramKernel.eval($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordNgrams =
    copy(left = newLeft, right = newRight)
}
