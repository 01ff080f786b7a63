package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF term scoring over a document corpus — the standard keyword /
  * salient-term extraction for corpus triage. Extension category beyond
  * the reference surface (see [[TextFunctions]]).
  *
  * Scale stance: two map-side-combined aggregations (term frequency per
  * doc, document frequency per term) + one equi-join on the term — all
  * shuffles are keyed and combine-reduced, nothing is corpus×vocab. The
  * final per-doc top-k window partitions by doc id, the natural sharding
  * key. AQE broadcasts the document-frequency side when the vocabulary
  * fits, and falls back to sort-merge when it doesn't.
  */
object TfIdf {

  /** Per-(doc, term) TF-IDF scores with raw (linear) inverse document
    * frequency: score = tf · N / df. Linear idf keeps the score ONE
    * exact-integer double division (tf·N < 2^53), bit-reproducible in
    * any engine — log-damped idf (`ln(N/df)`) ranks identically per
    * term and can be layered on for display.
    *
    * @param nDocs corpus document count (the N in idf) if already known;
    *              `None` derives it INSIDE the plan (a broadcast scalar
    *              cross-join on a count aggregate — one extra tiny stage,
    *              not a separate count() job re-scanning the corpus)
    */
  def scores(
      docs: DataFrame, idCol: String, textCol: String,
      nDocs: Option[Long] = None): DataFrame = {
    val terms = docs.select(col(idCol),
      explode(TextFunctions.tokens(col(textCol))).as("term"))
    val tf = terms.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    // tf already has one row per (doc, term), so df = row count per term
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val joined = tf.join(dfreq, Seq("term"))
    val withN = nDocs match {
      case Some(n) => joined.withColumn("__n", lit(n))
      case None => joined.crossJoin(
        broadcast(docs.agg(count(lit(1)).as("__n"))))
    }
    // tf·N stays an exact long product (< 2^53) before the one division
    withN.withColumn("tf_idf",
      (col("tf") * col("__n")).cast("double") / col("df"))
      .drop("__n")
  }

  /** Top-k salient terms per document by TF-IDF (term-alphabetical
    * tie-break, so ranking is total and deterministic).
    */
  def topTerms(
      docs: DataFrame, idCol: String, textCol: String, k: Int,
      nDocs: Option[Long] = None): DataFrame = {
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tf_idf").desc, col("term").asc)
    scores(docs, idCol, textCol, nDocs)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }
}
