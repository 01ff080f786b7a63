package graft.queries

import graft._
import graft.dedup.Dedup
import graft.similarity.VectorFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication queries over the `documents` / `embeddings` corpus:
  * exact fingerprint dedup, exact n-gram Jaccard pairs via inverted-index
  * join, MinHash-LSH near-dup pairs, SimHash Hamming-ball pairs, and
  * embedding-cosine near-dup via random-hyperplane LSH. No query contains
  * a crossJoin — candidate generation is always an equi-join on a derived
  * key. Every query has a DuckDB oracle: ground truth where blocking is
  * recall-exact (exact / ngram / simhash), a bit-identical pipeline mirror
  * for the probabilistic LSH paths (minhash / embedding).
  */
object DedupQueries {
  import Q._

  // Shared with q_stream_minhash_dedup (StreamingQueries), whose oracle
  // is this module's q_dedup_minhash — one constant keeps them in step.
  private[graft] val JaccardThreshold = 0.5
  private val CosineThreshold = 0.4

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact dedup: canonical fingerprint group-by
    "q_dedup_exact" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_dedup_exact")
      Dedup.exactDedup(src(dfl, "documents"), "text", "doc_id")
        .orderBy("keep_id")
    },

    // exact n-gram Jaccard pairs, inverted-index blocked
    "q_dedup_ngram" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_dedup_ngram")
      Dedup.jaccardPairs(src(dfl, "documents"), "text", "doc_id",
        JaccardThreshold).orderBy("doc_a", "doc_b")
    },

    // PPJoin-style prefix-filtered exact Jaccard (same ground truth as
    // q_dedup_ngram, far fewer candidate pairs at scale)
    "q_dedup_ngram_prefix" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_dedup_ngram_prefix")
      Dedup.jaccardPairsPrefix(src(dfl, "documents"), "text", "doc_id",
        JaccardThreshold).orderBy("doc_a", "doc_b")
    },

    // MinHash-LSH banding + exact Jaccard verify on candidates
    "q_dedup_minhash" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_dedup_minhash")
      Dedup.minHashPairs(src(dfl, "documents"), "text", "doc_id",
        JaccardThreshold).orderBy("doc_a", "doc_b")
    },

    // one-permutation MinHash (1 multiply-mod per shingle vs 64) with
    // rotation densification; same banding + exact verify downstream
    "q_dedup_oneperm" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_dedup_oneperm")
      Dedup.onePermPairs(src(dfl, "documents"), "text", "doc_id",
        JaccardThreshold).orderBy("doc_a", "doc_b")
    },

    // exact substring-span dedup (Lee et al. 2022): per-doc repeated-span
    // coverage via distributed positioned w-gram fingerprints
    "q_span_dedup" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_span_dedup")
      graft.dedup.SpanDedup.spanStats(src(dfl, "documents"), "text",
        "doc_id").orderBy("doc_id")
    },

    // the span-dedup ACTION: cut cross-doc duplicated spans, keeping
    // the earliest document's copy (Lee et al. 2022 corpus rewrite)
    "q_span_removal" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_span_removal")
      graft.dedup.SpanDedup.removeSpans(src(dfl, "documents"), "text",
        "doc_id").orderBy("doc_id")
    },

    // SimHash Hamming ≤ 3 pairs (banding is recall-exact for d < 4)
    "q_dedup_simhash" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_dedup_simhash")
      Dedup.simHashPairs(src(dfl, "documents"), "text", "doc_id",
        maxHamming = 3).orderBy("doc_a", "doc_b")
    },

    // the composed corpus-cleaning pass a training-data pipeline runs:
    // near-dup removal (keep the lowest doc_id of each 0.9-jaccard pair)
    // then quality filtering
    "q_corpus_clean" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_corpus_clean")
      val docs = src(dfl, "documents")
      // prefix-filtered variant: exact same pairs, far fewer candidates
      val dupLosers = Dedup.jaccardPairsPrefix(docs, "text", "doc_id", 0.9)
        .select(col("doc_b").as("doc_id")).distinct()
      docs.join(dupLosers, Seq("doc_id"), "left_anti")
        .withColumn("quality_score",
          graft.text.TextFunctions.qualityScore(col("text")))
        .where(col("quality_score") >= 0.5)
        .select("doc_id", "lang", "quality_score")
        .orderBy("doc_id")
    },

    // embedding-cosine near-dup via hyperplane LSH + exact verify
    "q_dedup_embedding" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_dedup_embedding")
      val e = src(dfl, "embeddings")
        .select(col("vec_id"), col("embedding"))
      // candidate generation carries ONLY ids: the band join and the
      // pair-dedup shuffle stay at 16 bytes/row; embeddings re-attach
      // afterwards via two id joins (broadcast-able at dim-table scale)
      val banded = e.select(col("vec_id"),
        posexplode(planeBandKeys(col("embedding"))).as(Seq("band", "key")))
        .cache()
      val cand = banded.select(col("band"), col("key"),
        col("vec_id").as("vec_a"))
        .join(banded.select(col("band"), col("key"),
          col("vec_id").as("vec_b")), Seq("band", "key"))
        .where(col("vec_a") < col("vec_b"))
        .select("vec_a", "vec_b").distinct()
      Dedup.releasing(banded) {
        cand
          .join(e.select(col("vec_id").as("vec_a"),
            col("embedding").as("ea")), Seq("vec_a"))
          .join(e.select(col("vec_id").as("vec_b"),
            col("embedding").as("eb")), Seq("vec_b"))
          // native codegen'd expression: candidate pairs are the hot set
          .withColumn("cosine",
            graft.functions.GraftFunctions.cosineSim(s, col("ea"), col("eb")))
          .where(col("cosine") >= CosineThreshold)
          .select("vec_a", "vec_b", "cosine")
      }.orderBy("vec_a", "vec_b")
    },

    // near-dup clustering: Jaccard pairs → distributed connected
    // components → (doc_id, cluster = min reachable id); cluster ==
    // doc_id marks the canonical keeper. Oracle is an INDEPENDENT
    // formulation: DuckDB recursive-CTE transitive closure.
    "q_dedup_cluster" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_dedup_cluster")
      val pairs = Dedup.jaccardPairs(src(dfl, "documents"), "text",
        "doc_id", JaccardThreshold)
      Dedup.connectedComponents(pairs, "doc_a", "doc_b")
        .select(col("id").as("doc_id"), col("comp").as("cluster"))
        .orderBy("doc_id")
    },

    // SemDeDup-style semantic dedup: k-means shards the corpus, then
    // pairwise cosine runs ONLY within a cluster (Σ|cluster|² pair work
    // instead of n²); a vector is dropped when a lower-id in-cluster
    // neighbour sits above the cosine threshold. Candidate pairs carry
    // only ids (cid equi-join); vectors re-attach for the exact verify.
    "q_semantic_dedup" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_semantic_dedup")
      val e = src(dfl, "embeddings").select(col("vec_id"), col("embedding"))
      val asg = graft.similarity.KMeans.fitAssign(e, "vec_id", "embedding",
        k = SimilarityQueries.KMeansK,
        iterations = SimilarityQueries.KMeansIters)
      val cand = asg.select(col("cid"), col("vec_id").as("vec_a"))
        .join(asg.select(col("cid"), col("vec_id").as("vec_b")), Seq("cid"))
        .where(col("vec_a") < col("vec_b"))
      val drops = cand
        .join(e.select(col("vec_id").as("vec_a"),
          col("embedding").as("ea")), Seq("vec_a"))
        .join(e.select(col("vec_id").as("vec_b"),
          col("embedding").as("eb")), Seq("vec_b"))
        .withColumn("cosine",
          graft.functions.GraftFunctions.cosineSim(s, col("ea"), col("eb")))
        .where(col("cosine") >= CosineThreshold)
        .select(col("vec_b").as("vec_id")).distinct()
        .withColumn("__drop", lit(1))
      asg.join(drops, Seq("vec_id"), "left")
        .select(col("vec_id"), col("cid"), col("__drop").isNull.as("kept"))
        .orderBy("vec_id")
    },

    // FineWeb-style duplicate-cluster ANNOTATION: instead of removing
    // near-duplicates, keep every document and annotate it with its
    // near-dup cluster id, the cluster's size, and whether it is the
    // cluster's canonical (minimum-id) member — the curation stance
    // that treats duplication level as a FEATURE (downweight, cap, or
    // filter downstream) rather than a hard drop. Docs in no pair are
    // their own singleton cluster. Scale shape: the component table is
    // pair-participant-sized (≪ corpus), the corpus joins it once;
    // cluster stats aggregate on cluster ids (≤ corpus rows) and join
    // back doc-sized — no window, nothing pairwise beyond the PPJoin
    // pair stage itself.
    "q_dedup_annotate" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_dedup_annotate")
      val docs = src(dfl, "documents")
      val pairs = Dedup.jaccardPairs(docs, "text", "doc_id",
        JaccardThreshold)
      val comp = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
      val ann = docs.select(col("doc_id"))
        .join(comp.select(col("id").as("doc_id"), col("comp")),
          Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("comp"), col("doc_id")).as("cluster"))
      val stats = ann.groupBy("cluster")
        .agg(count(lit(1)).as("cluster_size"),
          min(col("doc_id")).as("__min_id"))
      ann.join(stats, "cluster")
        .select(col("doc_id"), col("cluster"), col("cluster_size"),
          (col("doc_id") === col("__min_id")).as("is_canonical"))
        .orderBy("doc_id")
    },

    // Prototype-distance data pruning (Sorscher et al. 2022, "Beyond
    // neural scaling laws"): k-means prototypes over the embeddings,
    // per-point exact fixed-point squared distance to its assigned
    // prototype, keep the HARDEST half of each cluster
    // (distance-descending, vec_id tie-break — a total order both
    // engines share; the abundant-data regime of the paper, where easy
    // prototype-near examples are the redundant ones). Per-cluster
    // rank is a cid-partitioned window: partitions are cluster-sized
    // (n/k; √n at the trained-IVF sizing k=⌊√n⌋), never corpus-sized
    // single tasks.
    "q_prototype_prune" -> { (s, dir) =>
      implicit val c: GraftConf = conf(dir)
      val dfl = DataFlow(s, "q_prototype_prune")
      val e = src(dfl, "embeddings").select(col("vec_id"), col("embedding"))
      val (cent, asg) = graft.similarity.KMeans.fitModel(e, "vec_id",
        "embedding", SimilarityQueries.KMeansK, SimilarityQueries.KMeansIters)
      val pts = graft.similarity.KMeans.pointsFp(e, "vec_id", "embedding")
      val withDist = asg.join(pts, "vec_id")
        .join(broadcast(cent), "cid")
        .select(col("vec_id"), col("cid"),
          aggregate(
            zip_with(col("p"), col("c"), (a, b) => (a - b) * (a - b)),
            lit(0L), (acc, x) => acc + x).as("dist_fp"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("cid")
        .orderBy(col("dist_fp").desc, col("vec_id"))
      val wc = org.apache.spark.sql.expressions.Window.partitionBy("cid")
      withDist
        .withColumn("rnk", row_number().over(w))
        .withColumn("n_c", count(lit(1)).over(wc))
        .select(col("vec_id"), col("cid"), col("dist_fp"),
          (col("rnk") <= expr("(n_c + 1) div 2")).as("kept"))
        .orderBy("vec_id")
    })

  import OracleSql._

  val oracles: Map[String, String] = Map(
    "q_dedup_exact" ->
      """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
        |  min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin,
    "q_dedup_ngram" ->
      s"""WITH $toksCte, ${shinglesCte(3)},
        |e AS (SELECT doc_id, len(s) AS n, unnest(s) AS g FROM sh),
        |p AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    any_value(a.n) AS na, any_value(b.n) AS nb, count(*) AS inter
        |  FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b,
        |  CAST(inter AS DOUBLE) / (na + nb - inter) AS jaccard
        |FROM p
        |WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= $JaccardThreshold
        |ORDER BY doc_a, doc_b""".stripMargin,
    "q_dedup_cluster" ->
      s"""WITH RECURSIVE $toksCte, ${shinglesCte(3)},
        |e AS (SELECT doc_id, len(s) AS n, unnest(s) AS g FROM sh),
        |p AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    any_value(a.n) AS na, any_value(b.n) AS nb, count(*) AS inter
        |  FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT doc_a, doc_b FROM p
        |  WHERE CAST(inter AS DOUBLE) / (na + nb - inter)
        |    >= $JaccardThreshold),
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION SELECT doc_b, doc_a FROM pairs),
        |reach(id, r) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT g2.src, r.r FROM edges g2 JOIN reach r ON g2.dst = r.id)
        |SELECT id AS doc_id, min(r) AS cluster FROM reach
        |GROUP BY id ORDER BY doc_id""".stripMargin,
    "q_corpus_clean" -> {
      val quality =
        s"""round(
           |  CAST(least(len(w), 100) AS DOUBLE) / 100 * 0.4
           |  + (1.0 - CASE WHEN length(text) = 0 THEN 0.0 ELSE
           |      CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE)
           |        / length(text) END) * 0.3
           |  + least((CASE WHEN len(w) = 0 THEN 0.0 ELSE
           |      CAST(${hitsExpr(graft.text.TextFunctions.EnglishStopwords)}
           |        AS DOUBLE) / len(w) END) * 5, 1.0) * 0.3, 6)""".stripMargin
      s"""WITH $toksCte, ${shinglesCte(3)},
        |e AS (SELECT doc_id, len(s) AS n, unnest(s) AS g FROM sh),
        |losers AS (
        |  SELECT DISTINCT doc_b FROM (
        |    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |      any_value(a.n) AS na, any_value(b.n) AS nb,
        |      count(*) AS inter
        |    FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id
        |    GROUP BY 1, 2)
        |  WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.9),
        |q AS (SELECT doc_id, lang, $quality AS quality_score FROM toks)
        |SELECT doc_id, lang, quality_score FROM q
        |WHERE doc_id NOT IN (SELECT doc_b FROM losers)
        |  AND quality_score >= 0.5
        |ORDER BY doc_id""".stripMargin
    },
    // ground truth: every positioned 10-gram, duplicated fingerprints,
    // interval union per doc (edge-count rendering of the same union the
    // engine computes with a sorted fold)
    "q_span_dedup" -> {
      val w = graft.dedup.SpanDedup.DefaultW
      s"""WITH $toksCte,
        |g AS (SELECT doc_id, pos,
        |    md5(array_to_string(list_slice(w, pos, pos + ${w - 1}), ' '))
        |      AS fp
        |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - ${w - 2}))
        |      AS pos
        |    FROM toks WHERE len(w) >= $w)),
        |c AS (SELECT fp FROM g GROUP BY fp HAVING count(*) > 1),
        |d AS (SELECT g.doc_id, g.pos FROM g JOIN c USING (fp)),
        |cover AS (SELECT doc_id,
        |    list_sort(list_distinct(flatten(list(ps)))) AS cl
        |  FROM (SELECT doc_id, range(pos, pos + $w) AS ps FROM d)
        |  GROUP BY doc_id),
        |m AS (SELECT doc_id, len(cl) AS dup_tokens,
        |    len(list_filter(cl, p -> NOT list_contains(cl, p - 1)))
        |      AS dup_spans
        |  FROM cover)
        |SELECT t.doc_id, t.n AS n_tokens,
        |  CAST(coalesce(m.dup_tokens, 0) AS BIGINT) AS dup_tokens,
        |  CAST(coalesce(m.dup_spans, 0) AS BIGINT) AS dup_spans,
        |  CASE WHEN t.n = 0 THEN 0.0
        |    ELSE round(CAST(coalesce(m.dup_tokens, 0) AS DOUBLE) / t.n, 6)
        |  END AS dup_frac
        |FROM (SELECT doc_id, len(w) AS n FROM toks) t
        |LEFT JOIN m USING (doc_id) ORDER BY t.doc_id""".stripMargin
    },

    // the rewrite action: same gram table, keeper = min doc per
    // cross-doc-duplicated fp, positions outside the covered union
    // survive (DuckDB's 1-based indexed list_filter mirrors the
    // engine's position filter)
    "q_span_removal" -> {
      val w = graft.dedup.SpanDedup.DefaultW
      s"""WITH $toksCte,
        |g AS (SELECT doc_id, pos,
        |    md5(array_to_string(list_slice(w, pos, pos + ${w - 1}), ' '))
        |      AS fp
        |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - ${w - 2}))
        |      AS pos
        |    FROM toks WHERE len(w) >= $w)),
        |c AS (SELECT fp, min(doc_id) AS keeper FROM g GROUP BY fp
        |  HAVING count(DISTINCT doc_id) > 1),
        |d AS (SELECT g.doc_id, g.pos FROM g JOIN c USING (fp)
        |  WHERE g.doc_id <> c.keeper),
        |cover AS (SELECT doc_id, list_distinct(flatten(list(ps))) AS cl
        |  FROM (SELECT doc_id, range(pos, pos + $w) AS ps FROM d)
        |  GROUP BY doc_id),
        |k AS (SELECT t.doc_id, len(t.w) AS n_tokens,
        |    CASE WHEN cover.cl IS NULL THEN t.w
        |      ELSE list_filter(t.w, (x, i) -> NOT list_contains(cover.cl, i))
        |    END AS kept
        |  FROM toks t LEFT JOIN cover USING (doc_id))
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(len(kept) AS BIGINT) AS kept_tokens,
        |  -- DuckDB's array_to_string of an empty list is NULL, the
        |  -- engine's concat_ws is '' — normalise to ''
        |  coalesce(array_to_string(kept, ' '), '') AS cleaned_text
        |FROM k ORDER BY doc_id""".stripMargin
    },

    // ground truth is identical to the plain inverted-index rendering
    "q_dedup_ngram_prefix" ->
      s"""WITH $toksCte, ${shinglesCte(3)},
        |e AS (SELECT doc_id, len(s) AS n, unnest(s) AS g FROM sh),
        |p AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    any_value(a.n) AS na, any_value(b.n) AS nb, count(*) AS inter
        |  FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b,
        |  CAST(inter AS DOUBLE) / (na + nb - inter) AS jaccard
        |FROM p
        |WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= $JaccardThreshold
        |ORDER BY doc_a, doc_b""".stripMargin,
    "q_dedup_minhash" ->
      s"""WITH $toksCte, ${shinglesCte(3)},
        |hh AS (SELECT doc_id, s,
        |  list_transform(s, g -> ${tokenHash("g")}) AS hs FROM sh),
        |sig AS (SELECT doc_id, s, $minHashSigExpr AS sg FROM hh),
        |b0 AS (SELECT doc_id, s, sg, unnest(range(0, ${Dedup.NumBands}))
        |  AS band FROM sig),
        |bands AS (SELECT doc_id, s, band,
        |  array_to_string(list_transform(
        |    sg[band * ${Dedup.BandRows} + 1 : band * ${Dedup.BandRows} + ${Dedup.BandRows}],
        |    v -> v::VARCHAR), ',') AS key FROM b0),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bands a JOIN bands b
        |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
        |j AS (
        |  SELECT doc_a, doc_b, len(list_intersect(x.s, y.s)) AS inter,
        |    len(x.s) AS na, len(y.s) AS nb
        |  FROM cand JOIN sh x ON x.doc_id = doc_a
        |            JOIN sh y ON y.doc_id = doc_b)
        |SELECT doc_a, doc_b,
        |  CAST(inter AS DOUBLE) / (na + nb - inter) AS jaccard
        |FROM j
        |WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= $JaccardThreshold
        |ORDER BY doc_a, doc_b""".stripMargin,
    // bit-identical pipeline mirror of the one-permutation signature:
    // one permuted hash per shingle, strided bin minima, rotation
    // densification (t·p offset), classic 16×4 banding + exact verify
    "q_dedup_oneperm" -> {
      import graft.functions.OnePermKernel.{C, K}
      val p = Dedup.MinHashP
      val a0 = Dedup.HashA(0)
      val b0 = Dedup.HashB(0)
      s"""WITH $toksCte, ${shinglesCte(3)},
        |hh AS (SELECT doc_id, s,
        |  list_transform(s, g -> ${tokenHash("g")}) AS hs FROM sh),
        |pv AS (SELECT doc_id, s,
        |  list_transform(hs, x -> ($a0 * (x % $p) + $b0) % $p) AS ph
        |  FROM hh),
        |mm AS (SELECT doc_id, s,
        |  list_transform(range(0, $K),
        |    j -> list_min(list_filter(ph, v -> v % $K = j))) AS m0
        |  FROM pv),
        |sig AS (SELECT doc_id, s,
        |  list_transform(range(0, $K), j -> coalesce(
        |    list_filter(list_transform(range(0, $K), t ->
        |      CASE WHEN m0[((j + t) % $K) + 1] IS NOT NULL
        |        THEN m0[((j + t) % $K) + 1] + t * $C END),
        |      x -> x IS NOT NULL)[1], $p)) AS sg
        |  FROM mm),
        |b0 AS (SELECT doc_id, s, sg, unnest(range(0, ${Dedup.NumBands}))
        |  AS band FROM sig),
        |bands AS (SELECT doc_id, s, band,
        |  array_to_string(list_transform(
        |    sg[band * ${Dedup.BandRows} + 1 : band * ${Dedup.BandRows} + ${Dedup.BandRows}],
        |    v -> v::VARCHAR), ',') AS key FROM b0),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bands a JOIN bands b
        |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
        |j AS (
        |  SELECT doc_a, doc_b, len(list_intersect(x.s, y.s)) AS inter,
        |    len(x.s) AS na, len(y.s) AS nb
        |  FROM cand JOIN sh x ON x.doc_id = doc_a
        |            JOIN sh y ON y.doc_id = doc_b)
        |SELECT doc_a, doc_b,
        |  CAST(inter AS DOUBLE) / (na + nb - inter) AS jaccard
        |FROM j
        |WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= $JaccardThreshold
        |ORDER BY doc_a, doc_b""".stripMargin
    },
    "q_dedup_simhash" ->
      s"""WITH $toksCte,
        |hh AS (SELECT doc_id,
        |  list_transform(w, t -> ${tokenHash("t")}) AS hs FROM toks),
        |sv AS (SELECT doc_id, $simHashExpr AS h FROM hh)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(bit_count(xor(a.h::UBIGINT, b.h::UBIGINT)) AS INTEGER)
        |    AS hamming
        |FROM sv a JOIN sv b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.h::UBIGINT, b.h::UBIGINT)) <= 3
        |ORDER BY doc_a, doc_b""".stripMargin,
    "q_dedup_embedding" ->
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
        |bits AS (SELECT vec_id, embedding,
        |  ${planeBitsExpr("embedding")} AS sig FROM e),
        |b0 AS (SELECT vec_id, embedding, sig,
        |  unnest(range(0, $NumPlaneBands)) AS band FROM bits),
        |bands AS (SELECT vec_id, embedding, band,
        |  substr(sig, band * $PlaneBandBits + 1, $PlaneBandBits) AS key
        |  FROM b0),
        |cand AS (
        |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |    a.embedding AS ea, b.embedding AS eb
        |  FROM bands a JOIN bands b
        |    ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id)
        |SELECT vec_a, vec_b, ${cosineExpr("ea", "eb")} AS cosine
        |FROM cand
        |WHERE ${cosineExpr("ea", "eb")} >= $CosineThreshold
        |ORDER BY vec_a, vec_b""".stripMargin,

    "q_semantic_dedup" -> {
      val t = SimilarityQueries.KMeansIters
      s"""WITH ${kmeansCtes(SimilarityQueries.KMeansK, t)},
         |av AS (SELECT a.vec_id, a.cid, e.embedding
         |  FROM a${t + 1} a JOIN embeddings e USING (vec_id)),
         |pr AS (SELECT y.vec_id AS vb, x.embedding AS ea,
         |    y.embedding AS eb
         |  FROM av x JOIN av y
         |    ON x.cid = y.cid AND x.vec_id < y.vec_id),
         |dr AS (SELECT DISTINCT vb AS vec_id FROM pr
         |  WHERE ${cosineExpr("ea", "eb")} >= $CosineThreshold)
         |SELECT a.vec_id, a.cid,
         |  a.vec_id NOT IN (SELECT vec_id FROM dr) AS kept
         |FROM a${t + 1} a
         |ORDER BY a.vec_id""".stripMargin
    },

    // the q_dedup_cluster reachability replay + singleton fill-in +
    // cluster stats
    "q_dedup_annotate" ->
      s"""WITH RECURSIVE $toksCte, ${shinglesCte(3)},
        |e AS (SELECT doc_id, len(s) AS n, unnest(s) AS g FROM sh),
        |p AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    any_value(a.n) AS na, any_value(b.n) AS nb, count(*) AS inter
        |  FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT doc_a, doc_b FROM p
        |  WHERE CAST(inter AS DOUBLE) / (na + nb - inter)
        |    >= $JaccardThreshold),
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION SELECT doc_b, doc_a FROM pairs),
        |reach(id, r) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT g2.src, r.r FROM edges g2 JOIN reach r ON g2.dst = r.id),
        |cl AS (SELECT id AS doc_id, min(r) AS cluster FROM reach
        |  GROUP BY id),
        |ann AS (SELECT d.doc_id,
        |    coalesce(cl.cluster, d.doc_id) AS cluster
        |  FROM documents d LEFT JOIN cl USING (doc_id)),
        |st AS (SELECT cluster, count(*) AS cluster_size,
        |    min(doc_id) AS mn
        |  FROM ann GROUP BY 1)
        |SELECT ann.doc_id, ann.cluster, st.cluster_size,
        |  ann.doc_id = st.mn AS is_canonical
        |FROM ann JOIN st USING (cluster)
        |ORDER BY ann.doc_id""".stripMargin,

    // the k-means replay + exact integer prototype distances +
    // per-cluster hardest-half rank
    "q_prototype_prune" -> {
      val t = SimilarityQueries.KMeansIters
      val d1 = Dim + 1
      s"""WITH ${kmeansCtes(SimilarityQueries.KMeansK, t)},
         |pd AS (SELECT a.vec_id, a.cid,
         |    CAST(list_sum(list_transform(range(1, $d1),
         |      d -> (pts.p[d] - c.c[d]) * (pts.p[d] - c.c[d])))
         |      AS BIGINT) AS dist_fp
         |  FROM a${t + 1} a
         |  JOIN pts USING (vec_id)
         |  JOIN c$t c ON a.cid = c.cid),
         |rk AS (SELECT vec_id, cid, dist_fp,
         |    row_number() OVER (PARTITION BY cid
         |      ORDER BY dist_fp DESC, vec_id) AS rnk,
         |    count(*) OVER (PARTITION BY cid) AS n_c
         |  FROM pd)
         |SELECT vec_id, cid, dist_fp, rnk <= (n_c + 1) // 2 AS kept
         |FROM rk ORDER BY vec_id""".stripMargin
    })
}
