package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** One-pass primitive kernel for the Gopher repetition signals: from a
  * token array, the top-bigram mass (max bigram multiplicity / bigram
  * count) and the duplicate-3-gram fraction. Shared by the native
  * expression's interpreted and codegen paths, and bit-identical to the
  * declarative higher-order-function rendering (unit-asserted): the only
  * doubles are final divisions of exact integer counts.
  */
object RepetitionKernel {

  // Internal gram-grouping separator. NUL cannot appear in real token
  // streams, so tokens containing spaces (legal for arbitrary SQL-function
  // callers — the whitespace tokenizer never produces them) cannot alias
  // distinct n-grams the way a space separator would ("a b"+"c" vs
  // "a"+"b c"). Only gram EQUALITY matters, never the joined string, so
  // the choice is invisible to any whitespace-token caller.
  private final val Sep = "\u0000"

  def eval(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    var top2 = 0.0
    var dup3 = 0.0
    if (n >= 2) {
      val toks = new Array[String](n)
      var i = 0
      while (i < n) { toks(i) = arr.getUTF8String(i).toString; i += 1 }
      val counts = new java.util.HashMap[String, Integer](n * 2)
      var maxC = 0
      i = 0
      while (i < n - 1) {
        val g = toks(i) + Sep + toks(i + 1)
        val prev = counts.get(g)
        val c = if (prev == null) 1 else prev.intValue() + 1
        counts.put(g, c)
        if (c > maxC) maxC = c
        i += 1
      }
      top2 = maxC.toDouble / (n - 1)
      if (n >= 3) {
        val seen = new java.util.HashSet[String](n * 2)
        var distinct = 0
        i = 0
        while (i < n - 2) {
          if (seen.add(toks(i) + Sep + toks(i + 1) + Sep + toks(i + 2)))
            distinct += 1
          i += 1
        }
        dup3 = (n - 2 - distinct).toDouble / (n - 2)
      }
    }
    new GenericInternalRow(Array[Any](top2, dup3))
  }
}

/** Native Catalyst expression `repetition_stats(array<string>)` →
  * struct(top2_frac double, dup3_frac double). ONE pass over the tokens
  * per row (hash counting — no sort, no per-gram explode, no shuffle),
  * vs six interpreted higher-order trees for the declarative rendering.
  * Codegen emits a static kernel call, keeping the surrounding
  * projection inside whole-stage codegen.
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("top2_frac", DoubleType, nullable = false),
    StructField("dup3_frac", DoubleType, nullable = false)))

  override def prettyName: String = "repetition_stats"

  override def nullSafeEval(a: Any): Any =
    RepetitionKernel.eval(a.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.RepetitionKernel.eval($a);")

  override protected def withNewChildInternal(
      newChild: Expression): RepetitionStats = copy(child = newChild)
}
