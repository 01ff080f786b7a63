package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sliding-window document chunking — long documents become overlapping
  * token-window chunks sized for a training context window. Extension
  * category beyond the reference surface (see [[TextFunctions]]).
  *
  * Scale stance: pure row-local explode — tokenize once, generate the
  * window starts with `sequence`, slice per start. No shuffle, no UDF,
  * linear in corpus size, and the chunk fan-out parallelises with the
  * scan partitions. Chunk ids derive from the window start (not a
  * row_number), so they are stable under any partitioning.
  */
object Chunker {

  /** Chunk `textCol` into windows of `size` tokens advancing by `stride`
    * (overlap = size - stride). The final window may be shorter; empty
    * documents yield one empty chunk (callers filter `n_tokens > 0` to
    * drop them). Output: idCol, `chunk_id`, `chunk_start` (1-based token
    * offset), `n_tokens`, `chunk_text`.
    */
  def chunk(
      df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"need 0 < stride <= size, got size=$chunkSize stride=$stride")
    df.select(col(idCol), TextFunctions.tokens(col(textCol)).as("__w"))
      .withColumn("chunk_start", explode(sequence(
        lit(1), greatest(lit(1), size(col("__w"))), lit(stride))))
      .withColumn("__c", slice(col("__w"), col("chunk_start"), lit(chunkSize)))
      .select(
        col(idCol),
        // starts are 1 + k*stride, so this recovers k exactly in
        // integer space
        expr(s"(chunk_start - 1) div $stride").as("chunk_id"),
        col("chunk_start"),
        size(col("__c")).as("n_tokens"),
        concat_ws(" ", col("__c")).as("chunk_text"))
  }
}
