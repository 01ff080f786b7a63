package graft.streaming

import org.apache.spark.sql.SparkSession

/** Per-batch state-scan accounting for the nearline folds: each fold
  * calls [[add]] for every accumulated-state directory its batch plan
  * actually READS (bytes = the dir's on-disk parquet size — what the
  * scan pays), and the soak harness snapshots the counter around each
  * applyBatch. This is the instrument behind the sub-O(state) claim:
  * a guarded fold's fresh-key batches record near-zero scan bytes while
  * the state itself grows, where the unguarded fold records the full
  * state size every batch.
  *
  * Single-threaded per fold (foreachBatch serializes batches), so a
  * plain volatile counter suffices; the soak resets it per batch.
  */
object StateScanMeter {

  @volatile private var scanned: Long = 0L
  @volatile private var guard: Long = 0L

  def reset(): Unit = { scanned = 0L; guard = 0L }

  def value: Long = scanned

  /** Fixed-size guard overhead (bloom bitset reads) — tracked apart
    * from state scans: the guard's cost is O(m) per batch by
    * construction, the quantity the meter exists to separate from the
    * O(state) probes it eliminates.
    */
  def guardValue: Long = guard

  def addGuard(s: SparkSession, dir: String): Unit = {
    val b = graft.io.ParquetUtil.dirSizeBytes(s, dir)
    if (b > 0L) guard += b
  }

  /** Record a state read of `dir` (no-op when the dir is absent). */
  def add(s: SparkSession, dir: String): Unit = {
    val b = graft.io.ParquetUtil.dirSizeBytes(s, dir)
    if (b > 0L) scanned += b
  }

  /** Record a state read of an explicit byte count (bucket-pruned
    * reads meter only the buckets they open).
    */
  def addBytes(b: Long): Unit = if (b > 0L) scanned += b
}
