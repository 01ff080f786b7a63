package graft.streaming

import java.util.concurrent.atomic.AtomicLong

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
  * Counters are [[AtomicLong]]s so concurrent folds (two streams in
  * one JVM, a test suite's parallel specs) cannot lose increments —
  * the soak harness still resets per batch around a single fold.
  */
object StateScanMeter {

  private val scanned = new AtomicLong(0L)
  private val guard = new AtomicLong(0L)

  def reset(): Unit = { scanned.set(0L); guard.set(0L) }

  def value: Long = scanned.get()

  /** Fixed-size guard overhead (bloom bitset reads) — tracked apart
    * from state scans: the guard's cost is O(m) per batch by
    * construction, the quantity the meter exists to separate from the
    * O(state) probes it eliminates.
    */
  def guardValue: Long = guard.get()

  def addGuard(s: SparkSession, dir: String): Unit = {
    val b = graft.io.ParquetUtil.dirSizeBytes(s, dir)
    if (b > 0L) { guard.addAndGet(b); () }
  }

  /** Record a state read of `dir` (no-op when the dir is absent). */
  def add(s: SparkSession, dir: String): Unit = {
    val b = graft.io.ParquetUtil.dirSizeBytes(s, dir)
    if (b > 0L) { scanned.addAndGet(b); () }
  }

  /** Record a state read of an explicit byte count (bucket-pruned
    * reads meter only the buckets they open).
    */
  def addBytes(b: Long): Unit = if (b > 0L) { scanned.addAndGet(b); () }
}
