package graft.dedup

import graft.text.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication for corpus-scale pipelines: exact (fingerprint
  * group-by), n-gram Jaccard (inverted-index join), MinHash-LSH banding,
  * and SimHash Hamming-ball pairing. Extension category beyond the
  * reference surface (its only dedup is exact `drop_duplicates`,
  * betl/dataflow/dfl_changeRow.py:23-34).
  *
  * Scale stance: NOTHING here does an all-pairs crossJoin. Candidate
  * generation is always an equi-join on a derived key (shingle, band
  * bucket, Hamming band), which shuffles by key and parallelises across
  * executors; exact verification then runs only on candidates.
  */
object Dedup {

  /** Eagerly materialise the OUTPUT-sized pair result, then release the
    * corpus-sized cached intermediates. Without this, a long-lived
    * session pins corpus blocks until the GC-driven ContextCleaner
    * happens to reclaim them; the caches are local to each pair
    * generator, so the terminal action can run here.
    *
    * persist + count, NOT localCheckpoint: localCheckpoint stores
    * unreplicated blocks AND truncates lineage, so one lost executor
    * between here and the caller's action kills the job. persist keeps
    * the lineage — a lost block recomputes from source (slower, the
    * caches are gone by then, but correct).
    */
  private[graft] def releasing(caches: DataFrame*)(
      result: DataFrame): DataFrame = {
    val out = result.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try { out.count(); out }
    finally caches.foreach(_.unpersist(false))
  }

  // ------------------------------------------------------------------
  // shingling
  // ------------------------------------------------------------------

  /** Distinct word k-gram shingles from a MATERIALISED token-array column;
    * documents shorter than k tokens collapse to a single whole-text
    * shingle. The token array must be its own column (not an inline
    * `tokens(text)` tree): `slice` runs inside the per-shingle lambda, and
    * an inline split tree would be re-evaluated per shingle — O(n²) per
    * document.
    */
  def shinglesFromTokens(t: Column, k: Int = 3): Column =
    when(size(t) >= k,
      array_distinct(transform(sequence(lit(1), size(t) - (k - 1)),
        i => concat_ws(" ", slice(t, i, lit(k))))))
      .otherwise(array(concat_ws(" ", t)))

  /** doc-id + shingle-set projection shared by the pair generators.
    * Uses the native one-pass [[graft.functions.ShingleKernel]]
    * expression — bit-identical to
    * `shinglesFromTokens(tokens(text), k)` (order included) but one
    * primitive pass instead of an interpreted HOF tree per position;
    * shingle construction, not the candidate joins, was the measured
    * bottleneck of every dedup query at sf0.1.
    */
  private def shingled(
      df: DataFrame, textCol: String, idCol: String, k: Int): DataFrame =
    df.select(col(idCol).as("doc"),
      graft.functions.GraftFunctions
        .shinglesK(df.sparkSession, col(textCol), k).as("s"))


  // ------------------------------------------------------------------
  // exact dedup
  // ------------------------------------------------------------------

  /** Exact dedup via canonical fingerprint: one row per distinct
    * fingerprint with the kept (minimum) id and the copy count. One
    * hash-aggregate shuffle on the fingerprint — map-side partial
    * aggregation makes this the cheapest possible exact dedup at scale.
    */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(TextFunctions.fingerprint(col(textCol)).as("fp"), col(idCol))
      .groupBy("fp")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  // ------------------------------------------------------------------
  // n-gram Jaccard via inverted-index join (exact, no crossJoin)
  // ------------------------------------------------------------------

  /** All pairs with shingle-Jaccard ≥ `threshold`, computed EXACTLY with
    * an inverted-index self-join: explode shingles, equi-join on the
    * shingle, count shared shingles per pair, then
    * `jaccard = inter / (|A| + |B| - inter)`.
    *
    * Any pair with jaccard ≥ t > 0 shares at least one shingle, so the
    * blocking loses nothing. At 100 TB the skew concern is high-frequency
    * shingles fanning out the join; AQE skew-join handles moderate skew,
    * and a document-frequency prefix filter (PPJoin-style) is the
    * standard exact refinement when vocabulary is heavy-tailed.
    */
  def jaccardPairs(
      df: DataFrame, textCol: String, idCol: String,
      threshold: Double, k: Int = 3): DataFrame = {
    // cache the FLAT exploded inverted index (doc, n, g) — one row per
    // (doc, shingle), never a pinned shingle ARRAY (the id-only cache
    // discipline minHashPairs set): arrays are recomputed, flat rows are
    // spill-friendly, and both sides of the self-join still shingle the
    // corpus exactly once (AQE's one-sided broadcast breaks
    // ReuseExchange, so an uncached index would be built twice)
    val inv = shingled(df, textCol, idCol, k)
      .withColumn("n", size(col("s")))
      .select(col("doc"), col("n"), explode(col("s")).as("g"))
      .cache()
    val a = inv.select(col("g"), col("doc").as("doc_a"), col("n").as("na"))
    val b = inv.select(col("g"), col("doc").as("doc_b"), col("n").as("nb"))
    releasing(inv) {
      a.join(b, Seq("g")).where(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(count(lit(1)).as("inter"), first("na").as("na"), first("nb").as("nb"))
        .withColumn("jaccard",
          col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
        .where(col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    }
  }

  /** [[jaccardPairs]] with PPJoin-style prefix filtering: shingles are
    * globally ordered by (document frequency, shingle), and each document
    * indexes only its first `|S| - ceil(t·|S|) + 1` shingles. Any pair
    * with jaccard ≥ t must collide on these prefixes (the prefix-filter
    * principle), so candidate generation stays EXACT while the inverted
    * index shrinks to the rarest shingles — the standard fix for the
    * head-of-vocabulary fanout that makes the plain inverted-index join
    * explode on corpora with small vocabularies. Verification computes
    * the full-set intersection on candidates only.
    */
  def jaccardPairsPrefix(
      df: DataFrame, textCol: String, idCol: String,
      threshold: Double, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // NOT cached: pinning (doc, shingle-array, n) is the one payload
    // that ignores the id-only cache discipline. The index build and
    // the two verify joins each re-shingle (row-local CPU, linear) —
    // the only cached frame on this path is the id-only prefix index
    // below, whose reuse is the measured win
    val sh = shingled(df, textCol, idCol, k)
      .withColumn("n", size(col("s")))
    val inv = sh.select(col("doc"), col("n"), explode(col("s")).as("g"))
    val dfreq = inv.groupBy("g").agg(count(lit(1)).as("df"))
    // per-doc prefix selection as a hash-agg + ROW-LOCAL array sort and
    // slice instead of a global window: one exchange by doc either way,
    // but the sort happens on doc-sized arrays inside the agg output
    // (map-side partial collect) rather than as a partition-wide sort
    // feeding row_number
    // position-aware prefix index: pos = the token's 1-based rank in the
    // doc's FULL (df, g)-sorted shingle list (the slice starts at rank 1,
    // so the posexplode index IS the global rank). Carrying (pos, n)
    // costs two ints per index row and buys the PPJoin position filter
    // below
    val prefix = inv.join(dfreq, Seq("g"))
      .groupBy(col("doc"), col("n"))
      .agg(collect_list(struct(col("df"), col("g"))).as("dg"))
      .select(col("doc"), col("n"),
        posexplode(slice(array_sort(col("dg")), lit(1),
          (col("n") - ceil(col("n") * threshold) + 1).cast("int")))
          .as(Seq("p0", "e")))
      .select(col("e.g").as("g"), col("doc"), (col("p0") + 1).as("pos"),
        col("n"))
    // cache the id-only prefix index: AQE turns ONE self-join side into
    // a broadcast, so the two sides' exchanges no longer match and
    // ReuseExchange stops deduplicating them — without the cache the
    // whole inverted-index + window pipeline runs twice (measured 12.4s
    // vs 7.5s at sf0.1)
    val pidx = prefix.cache()
    // PPJoin filters, applied around the pair aggregation:
    //  - length (per collision row, BEFORE the shuffle): jaccard >= t
    //    forces t*max(|A|,|B|) <= min(|A|,|B|) — pair-level property,
    //    identical on every collision row, so pre-filtering is safe;
    //  - aggregate position bound (the REAL PPJoin bound, per pair):
    //    the pair's collisions aggregate to (cnt, max pa, max pb).
    //    Positions are ranks in the SHARED (df, g) global order, so the
    //    collision with the highest order has the max position in BOTH
    //    docs — max(pa) and max(pb) come from the same token t*. Every
    //    common token NOT collision-counted is missing from at least
    //    one prefix, hence ranks after every collision token, hence
    //    sits strictly after (max_pa, max_pb) in both docs. Therefore
    //    overlap <= cnt + min(na - max_pa, nb - max_pb): an EXACT
    //    upper bound, strictly tighter than the old any-collision
    //    single-position test (which admitted every pair whose first
    //    common token passed) — at sf10 the tighter bound is what keeps
    //    the exact-verify join candidate-sized instead of fanout-sized.
    //    The groupBy costs the same shuffle the old .distinct() paid
    //    (both partial-aggregate map-side), carrying three small ints.
    // Overlap target alpha = t*(na+nb)/(1+t) (jaccard>=t <=> inter>=alpha);
    // comparisons use a 1e-9 slack instead of ceil so double rounding can
    // only under-prune, never drop a boundary pair.
    val alpha = (lit(threshold) * (col("na") + col("nb"))
      / (1.0 + threshold)) - lit(1e-9)
    val cand = pidx.select(col("g"), col("doc").as("doc_a"),
        col("pos").as("pa"), col("n").as("na"))
      .join(pidx.select(col("g"), col("doc").as("doc_b"),
        col("pos").as("pb"), col("n").as("nb")), Seq("g"))
      .where(col("doc_a") < col("doc_b"))
      .where(least(col("na"), col("nb")).cast("double")
        >= lit(threshold) * greatest(col("na"), col("nb")) - lit(1e-9))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("cnt"), max(col("pa")).as("pa"),
        max(col("pb")).as("pb"), first(col("na")).as("na"),
        first(col("nb")).as("nb"))
      .where((col("cnt") + least(col("na") - col("pa"),
        col("nb") - col("pb"))).cast("double") >= alpha)
      .select("doc_a", "doc_b")
    // the verify joins re-shingle (narrow scan+project, ReuseExchange
    // dedupes the two sides) rather than pinning shingle arrays in a
    // cache; a candidate-id pre-filter before the shingling was
    // MEASURED SLOWER at both sf0.1 and sf1 (the added id-distinct and
    // filter exchanges cost more than the row-local re-shingle saves)
    releasing(pidx) {
      cand
        .join(sh.select(col("doc").as("doc_a"), col("s").as("sa"),
          col("n").as("na")), Seq("doc_a"))
        .join(sh.select(col("doc").as("doc_b"), col("s").as("sb"),
          col("n").as("nb")), Seq("doc_b"))
        .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
        .withColumn("jaccard", col("inter").cast("double")
          / (col("na") + col("nb") - col("inter")))
        .where(col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    }
  }

  // ------------------------------------------------------------------
  // MinHash-LSH
  // ------------------------------------------------------------------

  /** 2^31 - 1, Mersenne-prime modulus for minhash permutations
    * h_i(x) = (a_i * (x mod p) + b_i) mod p. A 31-bit space keeps every
    * product inside a signed 64-bit long — plain integer arithmetic in
    * both Spark codegen and the DuckDB oracle (no decimal/HUGEINT detour)
    * — while leaving shingle-collision probability negligible for minhash
    * estimation.
    */
  val MinHashP: Long = (1L << 31) - 1

  val NumHashes = 64
  val BandRows = 4
  val NumBands: Int = NumHashes / BandRows

  /** Deterministic permutation constants ([[graft.util.SplitMix]] mixing
    * of the index). Values in [1, p-1] so a_i never degenerates. Shared
    * verbatim with the DuckDB oracle SQL so both engines compute
    * identical signatures.
    */
  private def mix(i: Long): Long =
    math.floorMod(graft.util.SplitMix.mix(i), MinHashP - 1) + 1
  val HashA: IndexedSeq[Long] = (0 until NumHashes).map(i => mix(2L * i))
  val HashB: IndexedSeq[Long] = (0 until NumHashes).map(i => mix(2L * i + 1))

  /** MinHash signature: per permutation i, the minimum of
    * (a_i * (h mod p) + b_i) mod p over the document's shingle hashes.
    *
    * Single left-fold over the (pre-hashed) shingle array: the running
    * accumulator is the 64-wide minima array and each element contributes
    * its 64 permuted values via zip_with — the hash array is referenced
    * exactly ONCE, so no optimizer collapse can duplicate the upstream
    * md5 work, and the whole thing is one row-local pass.
    *
    * Empty shingle arrays yield the neutral all-p signature.
    */
  def minHashSignature(hashesCol: Column): Column =
    aggregate(
      hashesCol,
      array_repeat(lit(MinHashP), NumHashes),
      (acc, h) => zip_with(acc, permutations(h % lit(MinHashP)),
        (a, p) => least(a, p)))

  /** The 64 permuted values of one 31-bit hash. `h31` is a bound lambda
    * variable (already evaluated), so the 64 references are free.
    */
  private def permutations(h31: Column): Column =
    array((0 until NumHashes).map { i =>
      (lit(HashA(i)) * h31 + lit(HashB(i))) % lit(MinHashP)
    }: _*)

  /** LSH band keys: the signature sliced into [[NumBands]] bands of
    * [[BandRows]] values, each rendered as a joinable string key.
    */
  def bandKeys(sigCol: Column): Column =
    array((0 until NumBands).map { b =>
      array_join(
        transform(slice(sigCol, b * BandRows + 1, BandRows),
          v => v.cast("string")), ",")
    }: _*)

  /** Per-document signature band keys as a plain-Scala reference loop:
    * the 64-permutation minima over md5-hashed shingles, sliced into
    * band-key strings. Values are bit-identical to [[minHashSignature]] +
    * [[bandKeys]] AND to the hot-path native expression
    * ([[graft.functions.MinHashKernel]], which runs inside whole-stage
    * codegen); this Seq-based form is kept as the three-way parity pin.
    */
  private[graft] def signatureBandKeys(shingles: Seq[String]): Seq[String] = {
    val sig = Array.fill(NumHashes)(MinHashP)
    shingles.foreach { g =>
      val h31 = TextFunctions.md5Hash60(g) % MinHashP
      var i = 0
      while (i < NumHashes) {
        val v = (HashA(i) * h31 + HashB(i)) % MinHashP
        if (v < sig(i)) sig(i) = v
        i += 1
      }
    }
    (0 until NumBands).map { b =>
      sig.slice(b * BandRows, (b + 1) * BandRows).mkString(",")
    }
  }

  /** MinHash-LSH near-dup pairs: signature → band buckets → equi-join on
    * (band index, band key) → distinct candidate pairs → EXACT Jaccard
    * verification on candidates only. With 16 bands × 4 rows, a
    * jaccard-0.9 pair is caught with probability 1 - 3.9e-8, while a
    * jaccard-0.1 pair costs ~1.6e-3 false candidates — which the exact
    * verify then discards. This is the 100 TB path: band buckets shard
    * the shuffle, no all-pairs work anywhere.
    */
  def minHashPairs(
      df: DataFrame, textCol: String, idCol: String,
      threshold: Double, k: Int = 3): DataFrame =
    bandedSignaturePairs(df, textCol, idCol, threshold, k,
      graft.functions.GraftFunctions.minHashBandKeys(df.sparkSession, _))

  /** [[minHashPairs]] with ONE-PERMUTATION hashing (Li/Owen/Zhang 2012,
    * rotation-densified per Shrivastava/Li 2014,
    * [[graft.functions.OnePermKernel]]): one multiply-mod per shingle
    * instead of 64 — the signature pass, which is the corpus-scaling
    * part of LSH dedup, drops ~64× in hash arithmetic. Banding, the
    * candidate join, and the exact Jaccard verify are identical.
    */
  def onePermPairs(
      df: DataFrame, textCol: String, idCol: String,
      threshold: Double, k: Int = 3): DataFrame =
    bandedSignaturePairs(df, textCol, idCol, threshold, k,
      graft.functions.GraftFunctions.onePermBandKeys(df.sparkSession, _))

  private def bandedSignaturePairs(
      df: DataFrame, textCol: String, idCol: String, threshold: Double,
      k: Int, bandFn: Column => Column): DataFrame = {
    val sh = shingled(df, textCol, idCol, k)
    // signature kernel is a native codegen Expression (narrow, no
    // shuffle, no Row boxing, no codegen fence): its output carries ONLY
    // (doc, bands) — shingle arrays never enter the candidate join; the
    // verify re-attaches them by id afterwards
    val withBands = sh.select(col("doc"), bandFn(col("s")).as("bands"))
    // candidate generation carries ONLY ids: the 16-band self-join and
    // the pair-dedup shuffle move (band, key, doc) rows — never shingle
    // payloads. Caching this id-only frame (not the shingles) is what
    // keeps the corpus from being signature-hashed twice.
    val banded = withBands
      .select(col("doc"), posexplode(col("bands")).as(Seq("band", "key")))
      .cache()
    val a = banded.select(col("band"), col("key"), col("doc").as("doc_a"))
    val b = banded.select(col("band"), col("key"), col("doc").as("doc_b"))
    val cands = a.join(b, Seq("band", "key"))
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .dropDuplicates("doc_a", "doc_b")
    releasing(banded) {
      cands
        .join(sh.select(col("doc").as("doc_a"), col("s").as("sa")), Seq("doc_a"))
        .join(sh.select(col("doc").as("doc_b"), col("s").as("sb")), Seq("doc_b"))
        .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
        .withColumn("jaccard", col("inter").cast("double")
          / (size(col("sa")) + size(col("sb")) - col("inter")))
        .where(col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    }
  }

  // ------------------------------------------------------------------
  // SimHash Hamming-ball pairs
  // ------------------------------------------------------------------

  val SimHashBands = 4
  val SimHashBandBits: Int = TextFunctions.SimHashBits / SimHashBands // 15

  /** The [[SimHashBands]] band values of a SimHash — 15-bit chunks. By
    * pigeonhole, two hashes within Hamming distance < [[SimHashBands]]
    * share at least one identical band, so banding is a RECALL-EXACT
    * blocking key for distance ≤ 3.
    */
  def simHashBands(h: Column): Column =
    array((0 until SimHashBands).map { b =>
      shiftright(h, b * SimHashBandBits)
        .bitwiseAND(lit((1L << SimHashBandBits) - 1))
    }: _*)

  /** Near-dup pairs among PRE-COMPUTED 60-bit hashes with Hamming
    * distance ≤ maxHamming (< [[SimHashBands]] for exact recall): band
    * equi-join → distinct candidates → exact `bit_count(a ^ b)`
    * verification. The hash source is pluggable — text SimHash
    * ([[simHashPairs]]) and image perceptual dHash
    * ([[graft.multimodal.MediaCodecs.ImageDHash]]) pair through the
    * same banding.
    */
  def hammingPairs(
      hashed: DataFrame, idCol: String, hashCol: String,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming < SimHashBands,
      s"banding guarantees recall only for distance < $SimHashBands")
    val h0 = hashed.select(col(idCol).as("doc"), col(hashCol).as("h"))
    val banded = h0.select(col("doc"), col("h"),
      posexplode(simHashBands(col("h"))).as(Seq("band", "key")))
      .cache() // both self-join sides read this; hash the corpus once
    val a = banded.select(col("band"), col("key"),
      col("doc").as("doc_a"), col("h").as("ha"))
    val b = banded.select(col("band"), col("key"),
      col("doc").as("doc_b"), col("h").as("hb"))
    releasing(banded) {
      a.join(b, Seq("band", "key"))
        .where(col("doc_a") < col("doc_b"))
        .dropDuplicates("doc_a", "doc_b")
        .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
        .where(col("hamming") <= maxHamming)
        .select("doc_a", "doc_b", "hamming")
    }
  }

  /** Near-dup pairs with SimHash Hamming distance ≤ maxHamming over a
    * text column — hashes with [[TextFunctions.simHashUdf]], pairs with
    * [[hammingPairs]].
    */
  def simHashPairs(
      df: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 3): DataFrame =
    hammingPairs(
      df.select(col(idCol).as("doc"),
        TextFunctions.simHashUdf(
          TextFunctions.tokens(col(textCol))).as("h")),
      "doc", "h", maxHamming)

  // ------------------------------------------------------------------
  // near-dup clustering
  // ------------------------------------------------------------------

  /** Connected components over an undirected pair list — the step that
    * turns any pair generator's output ([[jaccardPairs]],
    * [[minhashLshPairs]], [[simHashPairs]], embedding pairs) into usable
    * dedup clusters: `(id, cluster)` where `cluster` is the smallest id
    * reachable from `id` (so `id == cluster` marks the canonical keeper).
    * Only ids appearing in a pair are returned; untouched documents are
    * their own trivial cluster by definition.
    *
    * Algorithm: iterated hash-min label propagation PLUS pointer jumping
    * (`comp ← comp(comp)` each round), so convergence is O(log diameter)
    * rounds, not O(diameter) — a 1M-doc near-dup chain settles in ~20
    * rounds. Each round is two keyed equi-joins + one map-side-combined
    * min aggregation; nothing is ever collected to the driver and the
    * edge list stays partitioned by id throughout, so the operator scales
    * with cluster count, not corpus size.
    *
    * Labels are CHECKPOINTED every round, not merely persisted: each
    * round's plan embeds several copies of the previous round's, so
    * without truncation the logical plan grows ~4^rounds and Catalyst
    * analysis stalls long before the data does (the standard iterative-
    * DataFrame failure mode). With a checkpoint dir configured
    * (`sparkContext.setCheckpointDir` — do this on real clusters) rounds
    * use reliable, replicated checkpoints; otherwise they fall back to
    * `localCheckpoint`, whose executor-loss caveat is bounded to one
    * round here rather than a whole downstream job.
    */
  def connectedComponents(
      pairs: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 25): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    def truncated(df: DataFrame): DataFrame =
      if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
        df.checkpoint()
      else df.localCheckpoint()
    // Union's constraint rewrite (UnionBase.rewriteConstraints) throws
    // NoSuchElementException when a child's constraints reference the
    // shared lineage both children derive from (labels ∪ offered below).
    // Constraint propagation is an optimizer nicety (null-filter
    // inference); switch it off for the loop's internal plans. Every
    // frame that escapes this scope is checkpointed, so the setting
    // cannot leak into caller plans.
    val sess = pairs.sparkSession
    val cpKey = "spark.sql.constraintPropagation.enabled"
    val cpOld = sess.conf.getOption(cpKey)
    sess.conf.set(cpKey, "false")
    try connectedComponentsLoop(pairs, srcCol, dstCol, maxIter, truncated)
    finally cpOld match {
      case Some(v) => sess.conf.set(cpKey, v)
      case None => sess.conf.unset(cpKey)
    }
  }

  private def connectedComponentsLoop(
      pairs: DataFrame, srcCol: String, dstCol: String, maxIter: Int,
      truncated: DataFrame => DataFrame): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    // null filter AFTER the union so both directions of a null-endpoint
    // edge (including ids whose long cast nulls out) are dropped; no
    // extra persist on top of the checkpoint — the checkpoint blocks ARE
    // the materialisation, a persist would store the scan a second time
    val und = truncated(pairs
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .union(pairs.select(col(dstCol).cast("long").as("src"),
        col(srcCol).cast("long").as("dst")))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct())
    // truncated: also strips the `comp = id` alias constraint, which
    // Union's constraint rewrite mishandles (NoSuchElementException on
    // the duplicated attribute)
    var labels = truncated(und.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("comp")))
    var i = 0
    var done = false
    while (!done && i < maxIter) {
      // hash-min: every node offers its component to each neighbour
      val offered = und
        .join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id"), col("comp"))
      // persist: minLab feeds BOTH sides of the pointer-jump join, and
      // when AQE broadcasts one side the exchanges stop matching and
      // ReuseExchange would compute the union+aggregate twice per round
      // (same failure mode as the pidx cache in jaccardPairsPrefix)
      val minLab = labels.union(offered)
        .groupBy("id").agg(min("comp").as("comp"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      // pointer jump: follow the label one more hop (comp values are
      // always node ids, so the self-join always matches)
      val next = truncated(minLab.as("a")
        .join(minLab.select(col("id").as("cid"), col("comp").as("ccomp")),
          col("a.comp") === col("cid"))
        .select(col("a.id").as("id"),
          least(col("a.comp"), col("ccomp")).as("comp")))
      minLab.unpersist(false)
      done = next.as("n").join(labels.as("o"), "id")
        .where(col("n.comp") =!= col("o.comp")).isEmpty
      labels = next
      i += 1
    }
    // per-round checkpoint blocks (und and each round's labels) are
    // reclaimed by the ContextCleaner as the local frames go out of
    // scope — the Dataset API has no explicit free for localCheckpoint
    // storage, which is why the loop keeps at most two live rounds
    labels
  }
}
