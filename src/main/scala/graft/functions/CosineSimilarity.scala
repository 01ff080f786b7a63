package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: cosine similarity of two `array<float>`
  * embedding columns, with whole-stage codegen (`doGenCode` emits a
  * primitive loop over the columnar ArrayData — no boxing, no UDF SerDe).
  * This is the preferred rendering for hot vector math per the engine's
  * extension ladder: built-in functions → native Expression → UDF.
  *
  * Accumulation order matches [[graft.similarity.VectorFunctions.cosine]]
  * and the DuckDB oracle's sequential list_reduce exactly (left-to-right
  * double adds), so results are bit-identical across all three renderings.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<float> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double x = (double) $a.getFloat($i);
         |  double y = (double) $b.getFloat($i);
         |  $dot += x * y; $na += x * x; $nb += y * y;
         |}
         |${ev.value} = $dot /
         |  (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Registration plumbing for the engine's native functions. */
object GraftFunctions {

  private val cosineSimDescriptor: (FunctionIdentifier,
      ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "cosine_sim expects exactly 2 arguments")
      CosineSimilarity(children.head, children(1))
    })

  private val repetitionStatsDescriptor: (FunctionIdentifier,
      ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("repetition_stats"),
    new ExpressionInfo(classOf[RepetitionStats].getName, "repetition_stats"),
    (children: Seq[Expression]) => {
      require(children.size == 1,
        "repetition_stats expects exactly 1 argument")
      RepetitionStats(children.head)
    })

  private val minHashBandKeysDescriptor: (FunctionIdentifier,
      ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("minhash_band_keys"),
    new ExpressionInfo(classOf[MinHashBandKeys].getName,
      "minhash_band_keys"),
    (children: Seq[Expression]) => {
      require(children.size == 1,
        "minhash_band_keys expects exactly 1 argument")
      MinHashBandKeys(children.head)
    })

  private val onePermBandKeysDescriptor: (FunctionIdentifier,
      ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("oneperm_band_keys"),
    new ExpressionInfo(classOf[OnePermBandKeys].getName,
      "oneperm_band_keys"),
    (children: Seq[Expression]) => {
      require(children.size == 1,
        "oneperm_band_keys expects exactly 1 argument")
      OnePermBandKeys(children.head)
    })

  private val shinglesDescriptor: (FunctionIdentifier,
      ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("shingles_k"),
    new ExpressionInfo(classOf[Shingles].getName, "shingles_k"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "shingles_k expects exactly 2 arguments")
      Shingles(children.head, children(1))
    })

  private val charNgramsDescriptor: (FunctionIdentifier,
      ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("char_ngrams"),
    new ExpressionInfo(classOf[CharNgrams].getName, "char_ngrams"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "char_ngrams expects exactly 2 arguments")
      CharNgrams(children.head, children(1))
    })

  private val wordNgramsDescriptor: (FunctionIdentifier,
      ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("word_ngrams"),
    new ExpressionInfo(classOf[WordNgrams].getName, "word_ngrams"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "word_ngrams expects exactly 2 arguments")
      WordNgrams(children.head, children(1))
    })

  /** Register on an existing session (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      shinglesDescriptor._1, shinglesDescriptor._2, shinglesDescriptor._3)
    spark.sessionState.functionRegistry.registerFunction(
      cosineSimDescriptor._1, cosineSimDescriptor._2, cosineSimDescriptor._3)
    spark.sessionState.functionRegistry.registerFunction(
      repetitionStatsDescriptor._1, repetitionStatsDescriptor._2,
      repetitionStatsDescriptor._3)
    spark.sessionState.functionRegistry.registerFunction(
      minHashBandKeysDescriptor._1, minHashBandKeysDescriptor._2,
      minHashBandKeysDescriptor._3)
    spark.sessionState.functionRegistry.registerFunction(
      onePermBandKeysDescriptor._1, onePermBandKeysDescriptor._2,
      onePermBandKeysDescriptor._3)
    spark.sessionState.functionRegistry.registerFunction(
      charNgramsDescriptor._1, charNgramsDescriptor._2,
      charNgramsDescriptor._3)
    spark.sessionState.functionRegistry.registerFunction(
      wordNgramsDescriptor._1, wordNgramsDescriptor._2,
      wordNgramsDescriptor._3)
  }

  /** Column-level accessor for [[WordNgrams]]. */
  def wordNgrams(spark: SparkSession, text: Column, n: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_udf("word_ngrams", text,
      org.apache.spark.sql.functions.lit(n))
  }

  /** Column-level accessor for [[CharNgrams]]. */
  def charNgrams(spark: SparkSession, text: Column, n: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_udf("char_ngrams", text,
      org.apache.spark.sql.functions.lit(n))
  }

  /** Column-level accessor (registers on the session first). */
  def cosineSim(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_udf("cosine_sim", a, b)
  }

  /** Column-level accessor for [[RepetitionStats]]. */
  def repetitionStats(spark: SparkSession, toks: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_udf("repetition_stats", toks)
  }

  /** Column-level accessor for [[OnePermBandKeys]]. */
  def onePermBandKeys(spark: SparkSession, shingles: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_udf("oneperm_band_keys", shingles)
  }

  /** Column-level accessor for [[MinHashBandKeys]]. */
  def minHashBandKeys(spark: SparkSession, shingles: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_udf("minhash_band_keys", shingles)
  }

  /** Column-level accessor for [[Shingles]]. */
  def shinglesK(spark: SparkSession, text: Column, k: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_udf("shingles_k", text,
      org.apache.spark.sql.functions.lit(k))
  }
}

/** `spark.sql.extensions`-style injection
  * (`.config("spark.sql.extensions", "graft.functions.GraftSparkExtensions")`).
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (FunctionIdentifier("cosine_sim"),
        new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
        (children: Seq[Expression]) => CosineSimilarity(
          children.head, children(1))))
    ext.injectFunction(
      (FunctionIdentifier("repetition_stats"),
        new ExpressionInfo(classOf[RepetitionStats].getName,
          "repetition_stats"),
        (children: Seq[Expression]) => RepetitionStats(children.head)))
    ext.injectFunction(
      (FunctionIdentifier("minhash_band_keys"),
        new ExpressionInfo(classOf[MinHashBandKeys].getName,
          "minhash_band_keys"),
        (children: Seq[Expression]) => MinHashBandKeys(children.head)))
    ext.injectFunction(
      (FunctionIdentifier("shingles_k"),
        new ExpressionInfo(classOf[Shingles].getName, "shingles_k"),
        (children: Seq[Expression]) => Shingles(
          children.head, children(1))))
  }
}
