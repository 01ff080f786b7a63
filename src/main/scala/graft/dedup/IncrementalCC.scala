package graft.dedup

import graft.streaming.{BloomGuard, StateScanMeter}
import graft.io.ParquetUtil
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Nearline duplicate-CLUSTER maintenance — the streamed rendering of
  * the `q_dedup_annotate` chain (n-gram Jaccard pairs →
  * [[Dedup.connectedComponents]] → per-doc cluster annotation), folded
  * across micro-batches so the annotate-don't-drop flagship can run
  * nearline. Batch reference semantics: [[Dedup.jaccardPairs]] for the
  * pair set and hash-min CC for the labels; the folded result equals
  * them VERBATIM for any batch partitioning (the batch oracle applies
  * unchanged).
  *
  * The CC fold never re-runs global label propagation. Its state is
  *  - `labels`: append-only (id, comp) rows, comp as resolved when the
  *    id ARRIVED (possibly stale later), hash-bucketed `kb=` for
  *    pruned endpoint lookups;
  *  - `remap`: a small, flat (old → fin) label-forwarding table —
  *    every label ever retired by a merge, mapped to its CURRENT
  *    component min. Kept COMPOSED (one hop resolves fully).
  * Per batch, existing components are CONTRACTED to their label nodes:
  * the delta pairs' endpoints resolve to current labels (bucket-pruned
  * lookups for old ids, self for new ids), and hash-min CC runs on the
  * label-space delta graph ONLY — touched-labels-sized, never
  * corpus-sized. The resulting non-identity mapping composes into
  * `remap`; arriving ids append with their resolved comp. Reads
  * resolve `coalesce(remap[comp], comp)` — one broadcast-sized hop.
  * Correctness invariant (induction over batches): every resolved
  * label IS the minimum doc id of its connected component over all
  * pairs seen so far — exactly the batch CC's fixpoint.
  *
  * Pair generation is a PPJoin-style PREFIX inverted index maintained
  * across batches (the nearline rendering of
  * [[Dedup.jaccardPairsPrefix]]): under the STABLE global shingle
  * order (xxhash64(g), g) each arriving doc indexes only its first
  * `n - ceil(t·n) + 1` shingles with their ranks, so any qualifying
  * pair must collide inside both prefixes and candidates survive the
  * exact PPJoin length + aggregate-position bounds; exact
  * intersections then come from the candidates' FULL shingle sets,
  * stored doc-hash-bucketed (`db=`) so verification opens only the
  * candidate docs' buckets — point lookups, never an index-sized
  * read. The order is FIXED (not df-maintained) precisely so that
  * prefixes indexed in earlier batches stay valid forever; in-batch
  * pairs self-join the batch's own full gram rows. Every qualifying
  * pair emits exactly once — in the batch where its LATER member
  * arrives (the [[Nearline]] contract) — and `inter/(na+nb-inter)` is
  * computed from the same full distinct-shingle sets, bit-identical to
  * the batch query.
  *
  * Scale shape per batch: |batch| PREFIX rows ((1-t) of the gram rows)
  * join the prefix index (the Nearline stance: at 100 TB the parquet
  * prefix index swaps for a keyed store, join shape unchanged);
  * verification reads only candidate `db=` buckets; the contracted CC
  * graph is bounded by 2×|delta pairs|; label lookups open only the
  * endpoint ids' `kb=` buckets; `remap` is bounded by labels retired
  * since the last [[compactLabels]] (cumulative merges — compaction
  * folds it into the base and empties it). Nothing corpus-sized moves
  * on a fresh batch.
  *
  * Crash contract — write order and why every window heals:
  *  1. doc-id bloom ([[BloomGuard]], with a resize source) — a crash
  *     after it leaves a harmless superset bloom;
  *  2. pairs append — replays drop re-emissions by the exact pairs
  *     anti-join (bloom-hit path only);
  *  3. prefix-index append, then shingle-set append — replays drop
  *     already-indexed docs by each store's own doc anti-join
  *     (bloom-hit path only; a doc present in either store implies its
  *     batch's pairs already landed, so re-generated candidates
  *     anti-join away at 2 regardless of which append the crash split);
  *  4. remap swap ([[ParquetUtil.safeOverwrite]]) — recomputing the
  *     delta from already-merged labels yields the identity mapping,
  *     so a replay rewrites nothing; appended-but-unremapped ids
  *     (crash after 4 landed, 5 didn't) still resolve because the
  *     remap KEEPS delta entries for arriving ids;
  *  5. labels append LAST — the fold's replay guard: once it lands,
  *     the whole batch anti-joins away (and writes NOTHING — not even
  *     the bloom).
  */
object IncrementalCC {

  /** Labels-base hash buckets: endpoint lookups open only their ids'
    * `kb=` dirs (parquet directory pruning), so resolving a bounded
    * pair delta reads a bounded slice of the corpus-sized base.
    */
  val LabelBuckets = 64

  private def kbCol(id: org.apache.spark.sql.Column) =
    pmod(id, lit(LabelBuckets.toLong)).cast("int")

  /** Shingle-set store hash buckets (`db=`): candidate verification
    * opens only the candidate old docs' buckets — the point-lookup
    * side of the prefix-index design (see [[applyBatch]]).
    */
  val SetBuckets = 64

  private def dbCol(id: org.apache.spark.sql.Column) =
    pmod(id, lit(SetBuckets.toLong)).cast("int")

  def bloomDir(labelsDir: String): String = labelsDir + "_bloom"

  /** The full shingle-set store rides next to the prefix index. */
  def setsDir(indexDir: String): String = indexDir + "_sets"

  private def labelsSchema = StructType(Seq(
    StructField("id", LongType), StructField("comp", LongType)))

  private def prefixSchema = StructType(Seq(
    StructField("doc", LongType), StructField("n", IntegerType),
    StructField("g", StringType), StructField("pos", IntegerType)))

  private def setsSchema = StructType(Seq(
    StructField("doc", LongType), StructField("n", IntegerType),
    StructField("s", ArrayType(StringType))))

  /** Initialise the combined nearline-annotate state: the gram index,
    * the emitted-pairs store, the bucketed labels base, the empty
    * remap, and the doc-id bloom. `capacityHint` pre-sizes the bloom
    * for deployments that know their corpus scale.
    */
  def initState(s: SparkSession, indexDir: String, pairsDir: String,
      labelsDir: String, remapDir: String,
      capacityHint: Long = 0L): Unit = {
    val empty = (schema: StructType) => s.createDataFrame(
      s.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    empty(prefixSchema).write.mode("overwrite").parquet(indexDir)
    empty(StructType(Seq(StructField("doc_a", LongType),
      StructField("doc_b", LongType),
      StructField("jaccard", DoubleType))))
      .write.mode("overwrite").parquet(pairsDir)
    // labels and the shingle-set store start as bare dirs: appends
    // create their kb= / db= partitions
    val conf = s.sessionState.newHadoopConf()
    Seq(labelsDir, setsDir(indexDir)).foreach { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      p.getFileSystem(conf).mkdirs(p)
    }
    empty(StructType(Seq(StructField("old", LongType),
      StructField("fin", LongType))))
      .write.mode("overwrite").parquet(remapDir)
    BloomGuard.init(s, bloomDir(labelsDir), capacityHint = capacityHint)
  }

  /** Read a hash-bucketed store's rows for the given buckets only
    * (None = all) — the bucket-pruned point lookup; metered as the
    * opened buckets' bytes. Fails loudly on data files outside the
    * bucket partitions (a layout no committed append produces).
    */
  private def readBuckets(s: SparkSession, dir: String, part: String,
      nBuckets: Int, schema: StructType,
      buckets: Option[Seq[Int]]): DataFrame = {
    val base = new org.apache.hadoop.fs.Path(dir)
    val fs = base.getFileSystem(s.sessionState.newHadoopConf())
    if (fs.exists(base)) {
      val stray = fs.listStatus(base).filter { st =>
        val n = st.getPath.getName
        st.isFile && !n.startsWith(".") && !n.startsWith("_")
      }
      if (stray.nonEmpty) throw new IllegalStateException(
        s"IncrementalCC: dir $dir contains data files " +
          s"outside $part= partitions (e.g. ${stray.head.getPath.getName})")
    }
    val wanted = buckets.getOrElse(0 until nBuckets)
    val paths = wanted.map(b => new org.apache.hadoop.fs.Path(
      base, s"$part=$b")).filter(fs.exists)
    if (paths.isEmpty)
      s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        schema)
    else {
      paths.foreach(p => StateScanMeter.addBytes(
        fs.getContentSummary(p).getLength))
      s.read.schema(schema).parquet(paths.map(_.toString): _*)
    }
  }

  /** Read labels rows of the given `kb=` buckets only (None = all). */
  private def readLabelBuckets(s: SparkSession, labelsDir: String,
      buckets: Option[Seq[Int]]): DataFrame =
    readBuckets(s, labelsDir, "kb", LabelBuckets, labelsSchema, buckets)

  /** Read shingle-set rows of the given `db=` buckets only (None =
    * all).
    */
  private def readSetBuckets(s: SparkSession, dir: String,
      buckets: Option[Seq[Int]]): DataFrame =
    readBuckets(s, dir, "db", SetBuckets, setsSchema, buckets)

  /** Fold one micro-batch of (doc, s: array&lt;string&gt; shingles)
    * rows: emit the batch's qualifying Jaccard pairs, merge the
    * touched components in label space, and append the arrivals'
    * labels. See the object doc for the algorithm and crash contract.
    */
  def applyBatch(s: SparkSession, b: DataFrame, threshold: Double,
      indexDir: String, pairsDir: String, labelsDir: String,
      remapDir: String): Unit = {
    Seq(indexDir, setsDir(indexDir), pairsDir, labelsDir).foreach(
      ParquetUtil.recoverAppend(s, _))
    ParquetUtil.recoverInterrupted(s, remapDir)
    val bloom = bloomDir(labelsDir)
    val batch = b.select(col("doc"), col("s"))
    val exact = BloomGuard.needExact(s, bloom, batch, "doc")
    val fresh =
      if (!exact) batch
      else batch.join(readLabelBuckets(s, labelsDir, None).select(
          col("id").as("doc")), Seq("doc"), "left_anti")
        .localCheckpoint()
    // empty batch or pure replay: write NOTHING
    if (fresh.isEmpty) return
    val newRows = fresh
      .select(col("doc"), size(col("s")).as("n"), explode(col("s")).as("g"))
      .localCheckpoint()
    // ---- pairs: new-vs-history through the PREFIX index + verified
    //      set point-lookups, plus the in-batch self-join ----
    // Prefix rows under the STABLE global shingle order (xxhash64(g),
    // g): a doc's first n - ceil(n·t) + 1 shingles in that order. Any
    // pair with jaccard >= t must collide inside both prefixes (the
    // prefix-filter principle; [[Dedup.jaccardPairsPrefix]] is the
    // batch rendering), and because the order never changes, prefixes
    // indexed in earlier batches stay valid forever — a df-maintained
    // order would invalidate them on every df shift.
    val newPrefix = fresh
      .select(col("doc"), size(col("s")).cast("int").as("n"),
        array_sort(transform(col("s"), g =>
          struct(xxhash64(g).as("h"), g.as("g")))).as("sg"))
      .select(col("doc"), col("n"),
        posexplode(slice(col("sg"), lit(1),
          (col("n") - ceil(col("n") * threshold) + 1).cast("int")))
          .as(Seq("p0", "e")))
      .select(col("doc"), col("n"), col("e.g").as("g"),
        (col("p0") + 1).cast("int").as("pos"))
      .localCheckpoint()
    val idxp = s.read.schema(prefixSchema).parquet(indexDir)
    StateScanMeter.add(s, indexDir)
    // PPJoin candidate generation — the jaccardPairsPrefix filters:
    // pair-level length ratio per collision row (before the shuffle),
    // then the aggregate position bound overlap <= cnt +
    // min(na - max_pa, nb - max_pb), exact because positions are ranks
    // in the SHARED stable order. The 1e-9 slack means double rounding
    // can only under-prune, never drop a boundary pair.
    val alpha = (lit(threshold) * (col("na") + col("nb"))
      / (1.0 + threshold)) - lit(1e-9)
    val candOld = newPrefix
      .select(col("g"), col("doc"), col("pos").as("pa"), col("n").as("na"))
      .join(idxp.select(col("g"), col("doc").as("doc_o"),
        col("pos").as("pb"), col("n").as("nb")), Seq("g"))
      .where(col("doc") =!= col("doc_o"))
      .where(least(col("na"), col("nb")).cast("double")
        >= lit(threshold) * greatest(col("na"), col("nb")) - lit(1e-9))
      .groupBy("doc", "doc_o")
      .agg(count(lit(1)).as("cnt"), max(col("pa")).as("pa"),
        max(col("pb")).as("pb"), first(col("na")).as("na"),
        first(col("nb")).as("nb"))
      .where((col("cnt") + least(col("na") - col("pa"),
        col("nb") - col("pb"))).cast("double") >= alpha)
      .select("doc", "doc_o")
      .localCheckpoint()
    // verification: exact intersections against the candidate docs'
    // FULL shingle sets — a bucket-pruned point lookup (only the
    // candidate docs' db= dirs open), never an index-sized scan
    val candDbs = candOld.select(dbCol(col("doc_o")).as("db"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val sets = setsDir(indexDir)
    val newOld = candOld
      .join(fresh.select(col("doc"), col("s").as("sa")), Seq("doc"))
      .join(readSetBuckets(s, sets, Some(candDbs))
        .select(col("doc").as("doc_o"), col("n").as("nb"),
          col("s").as("sb")), Seq("doc_o"))
      .select(col("doc"), col("doc_o"),
        size(array_intersect(col("sa"), col("sb"))).cast("long")
          .as("inter"),
        size(col("sa")).as("na"), col("nb"))
    val aRows = newRows.select(col("g"), col("doc").as("doc_a"),
      col("n").as("na"))
    val bRows = newRows.select(col("g"), col("doc").as("doc_b"),
      col("n").as("nb"))
    val newNew = aRows.join(bRows, Seq("g"))
      .where(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("inter"), first(col("na")).as("na"),
        first(col("nb")).as("nb"))
    val cand = newOld.select(
        least(col("doc"), col("doc_o")).as("doc_a"),
        greatest(col("doc"), col("doc_o")).as("doc_b"),
        col("inter"), col("na"), col("nb"))
      .unionByName(newNew)
      .withColumn("jaccard", col("inter").cast("double")
        / (col("na") + col("nb") - col("inter")))
      .where(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
    val delta =
      (if (!exact) cand
       else {
         // replay guard for the crash window after the pairs append:
         // drop pairs already on disk (output-sized read, hit path only)
         StateScanMeter.add(s, pairsDir)
         cand.join(s.read.parquet(pairsDir).select("doc_a", "doc_b"),
           Seq("doc_a", "doc_b"), "left_anti")
       }).localCheckpoint()
    // ---- contract to label space, CC the delta graph only ----
    val remap = s.read.parquet(remapDir)
    StateScanMeter.add(s, remapDir)
    val ends = delta.select(col("doc_a").as("id"))
      .union(delta.select(col("doc_b").as("id"))).distinct()
      .join(fresh.select(col("doc").as("id"), lit(true).as("__new")),
        Seq("id"), "left")
      .localCheckpoint()
    val oldEnds = ends.where(col("__new").isNull).select("id")
    val oldKbs = oldEnds.select(kbCol(col("id")).as("kb"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val oldLabels = oldEnds
      .join(readLabelBuckets(s, labelsDir,
        Some(oldKbs)), Seq("id"))
      .join(remap.withColumnRenamed("old", "comp"), Seq("comp"), "left")
      .select(col("id"), coalesce(col("fin"), col("comp")).as("lbl"))
    val endLabels = ends.where(col("__new").isNotNull)
      .select(col("id"), col("id").as("lbl"))
      .unionByName(oldLabels)
      .localCheckpoint()
    val contracted = delta
      .join(endLabels.select(col("id").as("doc_a"), col("lbl").as("la")),
        Seq("doc_a"))
      .join(endLabels.select(col("id").as("doc_b"), col("lbl").as("lb")),
        Seq("doc_b"))
      .where(col("la") =!= col("lb"))
      .select("la", "lb")
    // the delta graph's labels are collected into `merges` regardless
    // (the resolve map is driver-side by design), so when the EDGE list
    // is also driver-bounded the hash-min loop's ~4 jobs per round are
    // pure overhead: one limit-probe job fetches up to the gate, and a
    // union-find-by-min computes the identical min-label fixpoint on
    // the driver. Oversized deltas (the gate trips) keep the
    // distributed loop — same results either way (IncrementalCCSpec).
    val probe = contracted.limit(DriverCcMaxEdges + 1).collect()
    val merges: Map[Long, Long] =
      if (probe.isEmpty) Map.empty
      else if (probe.length <= DriverCcMaxEdges)
        driverCc(probe.map(r => (r.getLong(0), r.getLong(1))))
      else {
        // oversized delta: materialise the contracted edge list ONCE so
        // the distributed loop's repeated scans read it instead of
        // re-deriving the two delta-label joins every hash-min round
        val mat = contracted.localCheckpoint()
        Dedup.connectedComponents(mat, "la", "lb")
          .where(col("id") =!= col("comp"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      }
    // ---- writes, in the contract's order ----
    BloomGuard.addKeys(s, bloom, fresh.select("doc"), "doc",
      stateKeys = Some(() =>
        readLabelBuckets(s, labelsDir, None).select("id")))
    ParquetUtil.safeAppend(s, delta, pairsDir)
    val prefNew =
      if (!exact) newPrefix
      else {
        // replay guard for the crash window after the prefix append
        StateScanMeter.add(s, indexDir)
        newPrefix.join(idxp.select("doc").distinct(), Seq("doc"),
          "left_anti").localCheckpoint()
      }
    ParquetUtil.safeAppend(s, prefNew.select("doc", "n", "g", "pos"),
      indexDir)
    val setRows = fresh.select(col("doc"),
      size(col("s")).cast("int").as("n"), col("s"),
      dbCol(col("doc")).as("db"))
    val setsNew =
      if (!exact) setRows
      else {
        // replay guard for the crash window after the sets append —
        // bucket-pruned to the batch docs' own buckets
        val batchDbs = fresh.select(dbCol(col("doc")).as("db"))
          .distinct().collect().map(_.getInt(0)).toSeq
        setRows.join(readSetBuckets(s, sets, Some(batchDbs))
          .select("doc"), Seq("doc"), "left_anti").localCheckpoint()
      }
    ParquetUtil.safeAppend(s, setsNew.coalesce(1), sets,
      partitionBy = Seq("db"))
    if (merges.nonEmpty) {
      val mergeDf = merges.toSeq.toDF(s)("old", "fin")
      // compose: forward every retired label through the new merges,
      // then add the newly retired ones (disjoint by construction —
      // current labels never sit in remap's old column)
      val composed = remap.as("r")
        .join(broadcast(mergeDf.as("m")), col("r.fin") === col("m.old"),
          "left")
        .select(col("r.old"),
          coalesce(col("m.fin"), col("r.fin")).as("fin"))
        .unionByName(mergeDf)
      ParquetUtil.safeOverwrite(s, composed, remapDir)
    }
    val bm = s.sparkContext.broadcast(merges)
    val resolve = udf((id: Long) => bm.value.getOrElse(id, id))
    ParquetUtil.safeAppend(s,
      fresh.select(col("doc").as("id"), resolve(col("doc")).as("comp"),
        kbCol(col("doc")).as("kb")).coalesce(1),
      labelsDir, partitionBy = Seq("kb"))
    ()
  }

  /** Driver-CC gate: label-space delta graphs at or under this many
    * edges (16 B/edge → ≤ ~3 MiB — the same driver budget class as the
    * merge map itself) run union-find locally; larger deltas take the
    * distributed hash-min loop.
    */
  val DriverCcMaxEdges = 200000

  /** Union-find-by-min over an edge list: returns id → component-min
    * for every node whose component min is not itself — exactly the
    * non-identity rows of [[Dedup.connectedComponents]]'s fixpoint
    * (union by smaller root keeps each root the component's minimum).
    */
  private[graft] def driverCc(edges: Array[(Long, Long)])
      : Map[Long, Long] = {
    val parent = scala.collection.mutable.HashMap[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) {
        val n = parent(c); parent(c) = r; c = n
      }
      r
    }
    edges.foreach { case (a, b) =>
      val ra = find(a); val rb = find(b)
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    edges.iterator.flatMap(e => Iterator(e._1, e._2))
      .map(x => x -> find(x))
      .filter { case (x, r) => x != r }
      .toMap
  }

  private implicit class SeqToDf(private val rows: Seq[(Long, Long)]) {
    def toDF(s: SparkSession)(c1: String, c2: String): DataFrame = {
      import scala.jdk.CollectionConverters._
      s.createDataFrame(
        rows.map(r => org.apache.spark.sql.Row(r._1, r._2)).asJava,
        StructType(Seq(StructField(c1, LongType),
          StructField(c2, LongType))))
    }
  }

  /** The per-doc cluster annotation off the folded state — equals the
    * batch `q_dedup_annotate` chain exactly: resolved labels, cluster
    * size, canonical (= minimum-id, which IS the resolved label by the
    * CC invariant) flag.
    */
  def annotateFromState(s: SparkSession, labelsDir: String,
      remapDir: String): DataFrame = {
    val remap = s.read.parquet(remapDir).withColumnRenamed("old", "comp")
    val ann = readLabelBuckets(s, labelsDir, None)
      .join(remap, Seq("comp"), "left")
      .select(col("id").as("doc_id"),
        coalesce(col("fin"), col("comp")).as("cluster"))
    val stats = ann.groupBy("cluster")
      .agg(count(lit(1)).as("cluster_size"), min("doc_id").as("__min_id"))
    ann.join(stats, "cluster")
      .select(col("doc_id"), col("cluster"), col("cluster_size"),
        (col("doc_id") === col("__min_id")).as("is_canonical"))
  }

  /** Compaction: fold the remap into the labels base (one scan,
    * amortized at the caller's cadence) and empty it — bounds the
    * remap at labels-retired-since-last-compaction. Correctness never
    * depends on compaction having run ([[annotateFromState]] resolves
    * through the live remap either way).
    */
  def compactLabels(s: SparkSession, labelsDir: String,
      remapDir: String): Unit = {
    val remap = s.read.parquet(remapDir).withColumnRenamed("old", "comp")
    val resolved = readLabelBuckets(s, labelsDir, None)
      .join(remap, Seq("comp"), "left")
      .select(col("id"), coalesce(col("fin"), col("comp")).as("comp"),
        kbCol(col("id")).as("kb"))
      .localCheckpoint()
    ParquetUtil.safeOverwrite(s, resolved.coalesce(1), labelsDir,
      partitionBy = Seq("kb"), failpoints = false)
    ParquetUtil.safeOverwrite(s,
      s.read.parquet(remapDir).where(lit(false)), remapDir,
      failpoints = false)
  }
}
