package graft.text

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Training-sequence packing: concatenate documents in id order into one
  * token stream and chunk it into fixed-length sequences, letting
  * documents span sequence boundaries — the GPT-style pack-and-chunk
  * layout. Output is the (sequence, document) incidence: which token
  * range of each document lands in which sequence. Extension category —
  * this is the step between a cleaned corpus and a token-budgeted
  * training run.
  *
  * The core quantity is each document's global token offset — a running
  * sum over a total order, which naively is
  * `sum().over(Window.orderBy(id))`: a single-partition window that dies
  * at scale. This uses the same two-phase layout as
  * [[graft.warehouse.SurrogateKeys]]: range-repartition by id, stamp
  * physical positions, aggregate ONE row per partition (token subtotal),
  * prefix-sum those p rows on the driver, broadcast the offsets back,
  * and finish with a per-partition window (each task scans only its own
  * run). Two balanced shuffles of the doc-count frame, no global sort
  * point.
  */
object SeqPack {

  /** Pack rows carrying (`idCol`, `nCol` tokens) into sequences of
    * exactly `seqLen` tokens (the final partial sequence included).
    * Returns (seq_id, idCol, tok_start, n_toks): the id-ordered
    * concatenation restricted to sequence seq_id, where tok_start is the
    * 0-based offset of the contributed slice WITHIN the document. Rows
    * with n <= 0 are dropped (nothing to pack).
    */
  def pack(df: DataFrame, idCol: String, nCol: String,
      seqLen: Long): DataFrame = {
    require(seqLen >= 1, s"seqLen must be >= 1: $seqLen")
    val placed = globalOffsets(
      df.select(col(idCol), col(nCol).cast("long").as("__n"))
        .where(col("__n") > 0),
      Seq(idCol), "__n")
    placed
      .select(col(idCol), col("__n"), col("__start"),
        explode(sequence(
          expr("__start div " + seqLen),
          expr(s"(__start + __n - 1) div $seqLen"))).as("seq_id"))
      .select(
        col("seq_id"),
        col(idCol),
        greatest(col("seq_id") * seqLen - col("__start"), lit(0L))
          .as("tok_start"),
        (least(col("__start") + col("__n"), (col("seq_id") + 1) * seqLen)
          - greatest(col("__start"), col("seq_id") * seqLen))
          .as("n_toks"))
  }

  /** The two-phase global-offset layout on its own: running token
    * offsets over the total order given by `orderCols` (which must be a
    * unique key — ties would leave the order, and so the offsets,
    * partition-dependent). Returns the input's `orderCols` plus
    * (`__n` = the cast weight, `__start` = exclusive running sum of
    * `__n` in `orderCols` order), eagerly materialised (doc-sized) so
    * the internal persisted shuffle is released before the caller
    * builds on top. Shared by [[pack]] and
    * [[graft.operators.Shards.assign]] — any operator whose core
    * quantity is "global offset in a total order" without the
    * single-partition running-sum window.
    */
  def globalOffsets(df: DataFrame, orderCols: Seq[String],
      nCol: String): DataFrame = {
    val spark = df.sparkSession
    val p = spark.sessionState.conf.numShufflePartitions
    val oc = orderCols.map(col)
    val rows = df
      .select(oc :+ col(nCol).cast("long").as("__n"): _*)
      .repartitionByRange(p, oc: _*)
      .sortWithinPartitions(oc: _*)
      .select(monotonically_increasing_id().as("__mid"), col("*"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val pidOf = shiftright(col("__mid"), 33)
    val parts = rows.groupBy(pidOf.as("__pid"))
      .agg(sum(col("__n")).as("__t"))
      .collect().sortBy(_.getLong(0))
    var cum = 0L
    val offRows: Seq[Row] = parts.toSeq.map { r =>
      val off = cum; cum += r.getLong(1); Row(r.getLong(0), off)
    }
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offRows, 1),
      StructType(Seq(StructField("__pid", LongType, nullable = false),
        StructField("__off", LongType, nullable = false))))
    val w = Window.partitionBy(pidOf).orderBy(col("__mid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // materialise the doc-sized placement (one row per doc) so the
    // persisted shuffle can be released here instead of leaking for the
    // session lifetime; callers build lazily on top
    val placed = rows
      .join(broadcast(offDf), pidOf === col("__pid"))
      .withColumn("__start", col("__off") + sum(col("__n")).over(w)
        - col("__n"))
      .select(oc ++ Seq(col("__n"), col("__start")): _*)
      .localCheckpoint()
    rows.unpersist(false)
    placed
  }
}
