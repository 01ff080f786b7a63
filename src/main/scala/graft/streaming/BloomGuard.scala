package graft.streaming

import graft.functions.BloomFilter
import graft.io.ParquetUtil
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Persisted, OR-mergeable Bloom membership state for the nearline
  * folds — the sub-O(state) probe guard: every fold that anti-joins its
  * batch against an accumulated state table (doc-id replay guards, the
  * line-key first-occurrence index, the BM25 per-doc tables) pays a
  * full state SCAN per micro-batch even though the batch side is tiny
  * and, for fresh data, NONE of its keys are in the state. A Bloom
  * bitset maintained as fold state answers "definitely absent" row-
  * locally: a batch whose keys all miss skips the exact anti-join —
  * and therefore the state read — entirely; only bloom-HIT keys (rare:
  * replays, crash-window re-deliveries, false positives) pay the exact
  * probe, which restores exactness.
  *
  * Safety argument (why a Bloom cannot break a fold): the guard's only
  * action is SKIPPING an anti-join when the filter proves no batch key
  * is in the state. False positives merely run the exact probe
  * unnecessarily; false NEGATIVES are impossible as long as the bitset
  * over-approximates the state's key set — which the folds guarantee by
  * writing the updated bloom BEFORE appending the keys it covers (a
  * crash between the two writes leaves a superset bloom: harmless, the
  * next probe just pays one exact anti-join).
  *
  * Layout: one parquet row `(name, words: array<long>)` PER NAMED
  * bitset — a fold guarding several stores (LineDedup: line keys for
  * the index, coords for the marks) keeps them in ONE dir so each
  * batch pays one read and one combined swap, not one per bitset.
  * Fixed O(m) per-batch read/OR/rewrite cost, independent of state
  * size ([[DefaultNumBits]] = 2^21 bits = 256 KiB; size m to the
  * expected key cardinality — the probe stays correct when overloaded,
  * it just degrades to the pre-guard full probe). The swap runs through
  * [[ParquetUtil.safeOverwrite]], so every crash window recovers. At
  * 100 TB key cardinalities the single-row array swaps for the
  * distributed (word, bits) table ([[BloomFilter.build]]'s aggregation
  * IS that table before the collect) with the same OR-merge algebra;
  * the probe side is unchanged.
  *
  * Hashing is [[BloomFilter]]'s Kirsch–Mitzenmacher family over the
  * engine's portable md5 — the build (Column rendering) and the probe
  * (kernel UDF) are bit-identical (unit-asserted in BloomFilterSpec),
  * so build-side and probe-side never disagree on membership.
  */
object BloomGuard {

  /** 2^21 bits = 256 KiB = ~420k keys at 1% FP with k=5. */
  val DefaultNumBits: Int = 1 << 21
  val DefaultNumHashes: Int = 5

  /** The single-bitset folds' row name. */
  val DefaultName: String = "k"

  /** Kill switch for the counterfactual soak arm: with the guard off,
    * folds take their pre-guard path (exact anti-join against the full
    * state every batch) so the soak can measure what the guard saves.
    * Never off in production.
    */
  @volatile var enabled: Boolean = true

  private def schema = StructType(Seq(
    StructField("name", StringType),
    StructField("words", ArrayType(LongType, containsNull = false))))

  /** Initialise empty bitset(s) (all-zero). */
  def init(s: SparkSession, dir: String,
      names: Seq[String] = Seq(DefaultName),
      numBits: Int = DefaultNumBits): Unit = {
    require(numBits % 64 == 0 && numBits > 0, "numBits must be multiple of 64")
    write(s, dir, names.map(_ -> new Array[Long](numBits / 64)).toMap)
  }

  /** Read every named bitset of the dir. None when the dir is
    * missing/empty — the FAIL-SAFE direction: a state dir whose bloom
    * was never initialised (pre-guard deployments) must take the exact
    * probe path forever, because a fresh bloom would miss the old
    * state's keys and a miss is a correctness claim. O(m) driver cost;
    * metered as guard bytes.
    */
  def readAll(s: SparkSession, dir: String)
      : Option[Map[String, Array[Long]]] = {
    ParquetUtil.recoverInterrupted(s, dir)
    if (ParquetUtil.dirSizeBytes(s, dir) <= 0L) return None
    StateScanMeter.addGuard(s, dir)
    val rows = s.read.schema(schema).parquet(dir).collect()
    if (rows.isEmpty) None
    else Some(rows.map(r => r.getString(0) -> r.getSeq[Long](1).toArray)
      .toMap)
  }

  /** Read one named bitset (None = dir or name missing: fail safe). */
  def read(s: SparkSession, dir: String,
      name: String = DefaultName): Option[Array[Long]] =
    readAll(s, dir).flatMap(_.get(name))

  private def write(s: SparkSession, dir: String,
      blooms: Map[String, Array[Long]]): Unit = {
    import scala.jdk.CollectionConverters._
    val rows = blooms.toSeq.sortBy(_._1).map { case (n, w) =>
      org.apache.spark.sql.Row(n, w.toSeq) }
    // failpoints=false: the folds' crash specs aim ParquetUtil.crashPoint
    // at their OWN state writes; the bloom swap has its own failpoint
    ParquetUtil.safeOverwrite(s,
      s.createDataFrame(rows.asJava, schema).coalesce(1), dir,
      failpoints = false)
    if (crashAfterWrite) {
      crashAfterWrite = false
      throw new RuntimeException("injected crash after bloom write")
    }
  }

  /** Failpoint for the guard's own crash spec: the next [[addKeys]] /
    * [[addKeysMulti]] / [[init]] throws ONCE after its swap completes —
    * the window that leaves a SUPERSET bloom with no covered data
    * appended. Never set in production.
    */
  @volatile private[graft] var crashAfterWrite: Boolean = false

  /** OR each add's keys into its NAMED persisted bitset — one read,
    * one combined swap for the whole dir; run BEFORE the state appends
    * it covers. Key hashing casts through string (the
    * [[BloomFilter.hashCol]] contract), so long ids and string keys
    * share one code path. No-op when the bloom was never initialised
    * (see [[readAll]]'s fail-safe: creating a bloom that misses
    * pre-existing state keys would manufacture false negatives); adds
    * naming an uninitialised bitset within an initialised dir are
    * rejected loudly (same hazard).
    */
  def addKeysMulti(s: SparkSession, dir: String,
      adds: Seq[(DataFrame, String, String)]): Unit =
    readAll(s, dir).foreach { blooms =>
      adds.foreach { case (df, keyCol, name) =>
        val words = blooms.getOrElse(name, throw new IllegalArgumentException(
          s"BloomGuard: bitset '$name' was not initialised in $dir"))
        val delta = BloomFilter.build(df, keyCol, words.length * 64,
          DefaultNumHashes)
        var i = 0
        while (i < words.length) { words(i) |= delta(i); i += 1 }
      }
      write(s, dir, blooms)
    }

  /** Single-bitset convenience over [[addKeysMulti]]. */
  def addKeys(s: SparkSession, dir: String, df: DataFrame,
      keyCol: String, name: String = DefaultName): Unit =
    addKeysMulti(s, dir, Seq((df, keyCol, name)))

  /** Row-local membership probe column for `keyCol` against a read
    * bitset (never false-negative vs the keys [[addKeys]] recorded).
    */
  def hit(words: Array[Long], keyCol: String)
      : org.apache.spark.sql.Column =
    BloomFilter.mightContainUdf(words, DefaultNumHashes)(
      col(keyCol).cast("string"))

  /** The guard decision a fold makes per batch: true when the EXACT
    * state probe must run — the guard is disabled, the bloom was never
    * initialised (fail-safe), or at least one batch key hits the
    * bitset (replays, crash-window re-deliveries, false positives).
    * False = every key is provably absent from the state: skip the
    * anti-join and the state read entirely.
    */
  def needExact(s: SparkSession, dir: String, df: DataFrame,
      keyCol: String, name: String = DefaultName): Boolean =
    !enabled || (read(s, dir, name) match {
      case None => true
      case Some(words) =>
        df.where(hit(words, keyCol)).limit(1).count() > 0
    })
}
