package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance similarity self-join — the entity-resolution primitive
  * (matching name/address variants at corpus scale). Extension category;
  * the reference's only matching device is the exact-key MDM join
  * (betl/dataflow/dfl_mdm.py:70-95).
  *
  * Blocking is the FastSS deletion neighborhood: every string emits
  * itself plus each single-character deletion as block keys. Two strings
  * within Levenshtein distance 1 — substitution, insertion, or deletion
  * — necessarily share a key (delete the edited position from both), so
  * an EQUI-join on the key finds every candidate; an exact
  * `levenshtein()` then verifies. No similarity predicate ever reaches a
  * join condition — the O(n²) all-pairs comparison becomes O(n·L)
  * blocked rows.
  *
  * Scale shape: the same candidates-carry-only-ids discipline as the
  * LSH dedup plans — the key join ships (key, id), strings re-attach by
  * two id joins for the verify. Key skew equals real ambiguity (many
  * strings one edit apart), which is exactly the output, not an
  * artifact.
  */
object FuzzyJoin {

  /** The string itself plus its |s| single-deletion variants. The empty
    * string must short-circuit: Spark's `sequence(1, 0)` steps DOWNWARD
    * ([1, 0]), it is not an empty range.
    */
  private def deletionKeys(c: Column): Column =
    when(length(c) === 0, array(c)).otherwise(
      array_union(
        array(c),
        transform(sequence(lit(1), length(c)),
          i => concat(c.substr(lit(1), i - 1),
            c.substr(i + 1, length(c) - i)))))

  /** All pairs (id_a < id_b) of rows whose `strCol` values are within
    * Levenshtein distance 1, with the exact distance. Output:
    * (id_a, id_b, dist).
    */
  def editDistancePairs(
      df: DataFrame, idCol: String, strCol: String): DataFrame = {
    val base = df.select(col(idCol).as("__id"), col(strCol).as("__s"))
    val keyed = base.select(col("__id"),
      explode(deletionKeys(col("__s"))).as("__k"))
    val cand = keyed.select(col("__k"), col("__id").as("id_a"))
      .join(keyed.select(col("__k"), col("__id").as("id_b")), Seq("__k"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    cand
      .join(base.select(col("__id").as("id_a"), col("__s").as("__sa")),
        Seq("id_a"))
      .join(base.select(col("__id").as("id_b"), col("__s").as("__sb")),
        Seq("id_b"))
      .withColumn("dist",
        levenshtein(col("__sa"), col("__sb")).cast("long"))
      .where(col("dist") <= 1)
      .select("id_a", "id_b", "dist")
  }
}
