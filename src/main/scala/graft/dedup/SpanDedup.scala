package graft.dedup

import graft.text.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact substring-span deduplication — the distributed analogue of the
  * suffix-array substring dedup of Lee et al., "Deduplicating Training
  * Data Makes Language Models Better" (2022, arXiv:2107.06499): find
  * every token span of width ≥ [[DefaultW]] whose text occurs more than
  * once in the corpus, and report, per document, how many tokens sit
  * inside such a repeated span. Document-level dedup ([[Dedup]]) misses
  * these — a boilerplate paragraph repeated across thousands of distinct
  * pages is exactly what substring dedup exists to catch. (Extension
  * category; the reference's only dedup is exact `drop_duplicates`,
  * betl/dataflow/dfl_changeRow.py:23-34.)
  *
  * Algorithm: a span of ≥ w tokens repeats iff every one of its w-grams
  * repeats, and a repeated w-gram IS a repeated span of width w — so the
  * set of tokens covered by duplicated w-grams is precisely the set of
  * tokens inside maximal repeated spans of width ≥ w. The suffix array
  * of the single-machine original becomes, distributed: explode
  * positioned w-grams → group by gram fingerprint → flag fingerprints
  * with > 1 occurrence → union the flagged [pos, pos+w) intervals per
  * document. Fingerprints are full md5 hex (128-bit): collision odds are
  * ~2^-48 even at 10^12 grams, so the match is exact in practice at any
  * scale (the 60-bit token hash used elsewhere would see real collisions
  * at corpus scale).
  *
  * Scale shape: occurrences are one row per (doc, position) — corpus
  * -token-sized, the same order as the corpus itself. One hash-agg
  * shuffle on the fingerprint (map-side combine reduces each partition
  * to its distinct grams first), one fingerprint equi-join to flag
  * duplicated occurrences, one doc-sized agg to fold intervals. No
  * crossJoin, no window; interval union is a row-local sorted fold.
  */
object SpanDedup {

  /** Minimum repeated-span width in tokens. Lee et al. use 50 BPE
    * tokens; the test corpus' documents are 30–60 words, so 10 keeps
    * the operator observable there. The width is a parameter.
    */
  val DefaultW = 10

  /** Positioned w-gram text of a token-array column: element i (1-based)
    * is tokens[i..i+w). Empty for documents shorter than w.
    */
  private[dedup] def positionedGrams(t: Column, w: Int): Column =
    when(size(t) >= w,
      transform(sequence(lit(1), size(t) - (w - 1)),
        i => concat_ws(" ", slice(t, i, lit(w)))))
      .otherwise(array().cast("array<string>"))

  /** Per-document repeated-span statistics.
    *
    * @return one row per input document:
    *         (idCol, n_tokens, dup_tokens, dup_spans, dup_frac) where
    *         dup_tokens = tokens covered by ≥ 1 duplicated w-gram,
    *         dup_spans = maximal merged repeated spans, and
    *         dup_frac = dup_tokens / n_tokens (0 for empty docs).
    */
  def spanStats(df: DataFrame, textCol: String, idCol: String,
      w: Int = DefaultW): DataFrame = {
    val toks = tokenized(df, textCol, idCol)
    val occ = positionedOcc(toks, w)
    // fingerprints occurring more than once anywhere (including twice
    // within one document — self-repetition is duplication too)
    val dups = occ.groupBy("fp").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") > 1).select("fp")
    statsFromFlags(toks, occ.join(dups, Seq("fp")).select("doc", "pos"),
      idCol, w)
  }

  /** (doc, t, n) token projection shared by batch and nearline paths. */
  private[dedup] def tokenized(df: DataFrame, textCol: String,
      idCol: String): DataFrame =
    df.select(col(idCol).as("doc"),
      TextFunctions.tokens(col(textCol)).as("t"))
      .withColumn("n", size(col("t")))

  /** (doc, pos, fp) gram occurrences — corpus-token-sized, one row per
    * position; fingerprints are the raw 16-byte md5 digest (unhex'd):
    * half the shuffle/index payload of the hex rendering and a cheaper
    * equality compare, with the same 128-bit exactness.
    */
  private[dedup] def positionedOcc(toks: DataFrame, w: Int): DataFrame =
    toks
      .select(col("doc"), posexplode(positionedGrams(col("t"), w))
        .as(Seq("p0", "g")))
      .select(col("doc"), (col("p0") + 1).as("pos"),
        unhex(md5(col("g").cast("binary"))).as("fp"))

  /** Fold flagged duplicated-gram start positions into per-document span
    * statistics: sorted starts → one row-local pass unions the
    * fixed-width intervals ((covered, end, spans) accumulator; starts
    * are sorted so end is nondecreasing), then every document gets a
    * row (zero for clean docs).
    */
  private[dedup] def statsFromFlags(toks: DataFrame, flagged: DataFrame,
      idCol: String, w: Int): DataFrame = {
    val folded = flagged
      .groupBy(col("doc"))
      .agg(sort_array(collect_list(col("pos"))).as("starts"))
      .select(col("doc"),
        aggregate(col("starts"),
          struct(lit(0L).as("cov"), lit(0L).as("end"), lit(0L).as("spans")),
          (acc, s) => {
            val newEnd = (s + (w - 1)).cast("long")
            when(s > acc.getField("end"),
              struct((acc.getField("cov") + w).as("cov"),
                newEnd.as("end"),
                (acc.getField("spans") + 1).as("spans")))
              .otherwise(
                struct((acc.getField("cov") + newEnd - acc.getField("end"))
                  .as("cov"),
                  newEnd.as("end"),
                  acc.getField("spans").as("spans")))
          }).as("u"))
      .select(col("doc"), col("u.cov").as("dup_tokens"),
        col("u.spans").as("dup_spans"))
    toks.select(col("doc"), col("n"))
      .join(folded, Seq("doc"), "left")
      .select(col("doc").as(idCol), col("n").cast("long").as("n_tokens"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        coalesce(col("dup_spans"), lit(0L)).as("dup_spans"),
        when(col("n") === 0, lit(0.0))
          .otherwise(round(coalesce(col("dup_tokens"), lit(0L))
            .cast("double") / col("n"), 6)).as("dup_frac"))
  }

  /** The ACTION counterpart of [[spanStats]] — the corpus rewrite of
    * Lee et al. 2022: cut every cross-document duplicated span from
    * every document EXCEPT the earliest (min doc id) document
    * containing it, which keeps its copy. Within-document repetition is
    * left to the repetition filters; the keeper rule needs only
    * `min(doc)` per fingerprint — no global ordering, one extra value
    * on the fingerprint agg.
    *
    * @return (idCol, n_tokens, kept_tokens, cleaned_text) for every
    *         document; documents fully covered by borrowed spans clean
    *         to the empty string.
    */
  def removeSpans(df: DataFrame, textCol: String, idCol: String,
      w: Int = DefaultW): DataFrame = {
    val toks = tokenized(df, textCol, idCol)
    val occ = positionedOcc(toks, w)
    // fingerprints seen in >1 document, with the keeper doc
    val dups = occ.groupBy("fp").agg(
      count_distinct(col("doc")).as("nd"), min(col("doc")).as("keeper"))
      .where(col("nd") > 1).select("fp", "keeper")
    val starts = occ.join(dups, Seq("fp"))
      .where(col("doc") =!= col("keeper"))
      .groupBy(col("doc"))
      .agg(sort_array(collect_set(col("pos"))).as("starts"))
    // row-local rewrite: covered = union of [s, s+w) intervals,
    // MATERIALISED as its own column before the per-token lambda (an
    // inline tree would be re-evaluated per token — the O(n²)/doc trap
    // the shingle kernels exist to avoid); array_contains per token is
    // then O(|covered|), bounded by document length, no shuffle
    toks.join(starts, Seq("doc"), "left")
      .withColumn("covered",
        when(col("starts").isNull, array().cast("array<int>"))
          .otherwise(array_distinct(flatten(transform(col("starts"),
            s => sequence(s, s + (w - 1)))))))
      .withColumn("kept",
        when(col("n") === 0, array().cast("array<string>"))
          .otherwise(filter(
            transform(sequence(lit(1), col("n")),
              i => when(!array_contains(col("covered"), i),
                element_at(col("t"), i))),
            x => x.isNotNull)))
      .select(col("doc").as(idCol), col("n").cast("long").as("n_tokens"),
        size(col("kept")).cast("long").as("kept_tokens"),
        concat_ws(" ", col("kept")).as("cleaned_text"))
  }

  // ------------------------------------------------------------------
  // nearline: the gram index maintained across micro-batches
  // ------------------------------------------------------------------

  /** Fold one micro-batch of documents into the (gram index, duplicated
    * occurrences) state — the streaming rendering of [[spanStats]]'s
    * duplicate detection. A duplicated occurrence is discovered in the
    * batch where the fingerprint's SECOND occurrence arrives, at which
    * point the earlier occurrences (sitting in the index) emit
    * retroactively; after any batch partitioning of the stream the
    * emitted occurrence set equals the batch ground truth
    * (SpanDedupDsirSpec pins batch-count invariance).
    *
    * IDEMPOTENT under at-least-once replay, the [[Nearline.applyBatch]]
    * contract: already-indexed docs drop out before any matching, and
    * emissions anti-join the occurrences already on disk — a replayed
    * batch, or a replay after a crash between the two appends, changes
    * nothing.
    *
    * Per-batch work: |batch| gram rows equi-join the index on fp (never
    * batch × corpus), one batch-sized self-count, id-only appends.
    */
  def applyBatch(s: org.apache.spark.sql.SparkSession, b: DataFrame,
      textCol: String, idCol: String, indexDir: String, dupDir: String,
      w: Int = DefaultW): Unit = {
    // the index is re-scanned three times below (replay guard, dup-fp
    // match, retro emission) — cache it for the batch so the parquet
    // read + decode happens once
    val idx = s.read.parquet(indexDir).cache()
    val newOcc = positionedOcc(tokenized(b, textCol, idCol), w)
      // replay guard: docs are batch-atomic, so an indexed doc's grams
      // are already fully applied
      .join(idx.select("doc").distinct(), Seq("doc"), "left_anti")
      .cache()
    // fingerprints that (including this batch) now occur ≥ 2 times:
    // batch-gram hits on the index, plus batch-internal repeats
    val batchCnt = newOcc.groupBy("fp").agg(count(lit(1)).as("bc"))
    val dupFps = batchCnt
      .join(idx.select("fp"), Seq("fp"), "left_semi").select("fp")
      .union(batchCnt.where(col("bc") > 1).select("fp"))
      .distinct()
    // every occurrence of a now-duplicated fp: historical (index) and
    // new; the anti-join keeps emission exactly-once across batches
    idx.join(dupFps, Seq("fp"), "left_semi").select("doc", "pos")
      .union(newOcc.join(dupFps, Seq("fp"), "left_semi")
        .select("doc", "pos"))
      .join(s.read.parquet(dupDir).select("doc", "pos"),
        Seq("doc", "pos"), "left_anti")
      .write.mode("append").parquet(dupDir)
    // only now does the batch join the index (crash before this line
    // replays into the anti-join guards above)
    newOcc.select("fp", "doc", "pos").write.mode("append").parquet(indexDir)
    newOcc.unpersist()
    idx.unpersist()
    ()
  }

  /** Initialise empty (index, duplicated-occurrence) state frames. */
  def initState(s: org.apache.spark.sql.SparkSession, indexDir: String,
      dupDir: String): Unit = {
    import org.apache.spark.sql.types._
    val empty = (schema: StructType) => s.createDataFrame(
      s.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    empty(StructType(Seq(StructField("fp", BinaryType),
      StructField("doc", LongType), StructField("pos", IntegerType))))
      .write.mode("overwrite").parquet(indexDir)
    empty(StructType(Seq(StructField("doc", LongType),
      StructField("pos", IntegerType))))
      .write.mode("overwrite").parquet(dupDir)
  }

  /** Assemble final per-document span statistics from the streamed
    * duplicated-occurrence state — equals [[spanStats]] of the full
    * corpus exactly.
    */
  def statsFromState(s: org.apache.spark.sql.SparkSession, df: DataFrame,
      textCol: String, idCol: String, dupDir: String,
      w: Int = DefaultW): DataFrame =
    statsFromFlags(tokenized(df, textCol, idCol),
      s.read.parquet(dupDir), idCol, w)
}
