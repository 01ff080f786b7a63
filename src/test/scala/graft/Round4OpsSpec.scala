package graft

import graft.operators.{FuzzyJoin, Outliers, Sampling, Transitions,
  Triangles}
import graft.text.{Decontaminate, SeqPack}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Round-4 batch 2: exact z-score outliers, Markov transitions,
  * degree-oriented triangle counting, weighted sampling, benchmark
  * decontamination, sequence packing, k-means assignments.
  */
class Round4OpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------ outliers

  test("Outliers.flag matches the naive double z-score on clean data") {
    // values whose stats are exactly representable: mean 30, sd 10
    val df = Seq(("a", 1L, 20L), ("a", 2L, 30L), ("a", 3L, 40L),
      ("a", 4L, 30L), ("a", 5L, 130L), ("b", 6L, 5L), ("b", 7L, 5L))
      .toDF("g", "id", "v")
    val got = Outliers.flag(df, Seq("g"), "v", z = 2)
      .select("id").as[Long].collect().sorted
    // group a: n=5 s=250 ssq=14600+16900=... compute naive in Scala
    val rows = Seq(20L, 30L, 40L, 30L, 130L)
    val n = rows.size.toDouble
    val mean = rows.sum / n
    val variance = rows.map(x => (x - mean) * (x - mean)).sum / n
    val naive = Seq(1L, 2L, 3L, 4L, 5L).zip(rows)
      .filter { case (_, v) =>
        (v - mean) * (v - mean) > 4 * variance }
      .map(_._1)
    assert(got.toSeq === naive)
    // group b has zero variance: no outliers possible
    assert(!got.contains(6L) && !got.contains(7L))
  }

  test("Outliers.flag is strict: a 2-point group never flags") {
    // any 2 points are each exactly 1 sd from the mean — never > z*sd
    val df = Seq(("g", 1L, 0L), ("g", 2L, 1000000L)).toDF("g", "id", "v")
    assert(Outliers.flag(df, Seq("g"), "v", z = 1).count() === 0)
  }

  test("Outliers.flag fails loudly outside the fixed-point envelope") {
    // z*(n*max|v| + |s|) = 2*(9e18 + 6e18) = 3e19 > 1e19 trips the
    // guard while every sum/product in the plan still fits in
    // DECIMAL(38,0) — the silent-null regime the guard exists for
    // (values any larger and Spark 4's decimal-sum overflow already
    // fails loudly on its own)
    val big = 3000000000000000000L // 3e18
    val df = Seq(("g", 1L, big), ("g", 2L, big - 7), ("g", 3L, 5L))
      .toDF("g", "id", "v")
    val e = intercept[Exception] {
      Outliers.flag(df, Seq("g"), "v", z = 2).count()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("envelope")))
  }

  // --------------------------------------------------------- transitions

  test("Transitions.matrix counts consecutive pairs and normalises") {
    val df = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"), (1L, 4L, "b"),
      (2L, 1L, "a"), (2L, 2L, "c"))
      .toDF("u", "t", "s")
    val out = Transitions.matrix(df, "u", "s", Seq("t"))
      .orderBy("from_state", "to_state").collect()
    assert(out.toSeq === Seq(
      Row("a", "b", 2L, 2.0 / 3.0),
      Row("a", "c", 1L, 1.0 / 3.0),
      Row("b", "a", 1L, 1.0)))
  }

  test("Transitions.matrix probabilities sum to 1 per from_state") {
    val df = (1 to 200).map(i =>
      (i % 7L, i.toLong, "s" + (i * 31 % 5))).toDF("u", "t", "s")
    val sums = Transitions.matrix(df, "u", "s", Seq("t"))
      .groupBy("from_state").agg(sum("p").as("sp"))
      .select("sp").as[Double].collect()
    sums.foreach(sp => assert(math.abs(sp - 1.0) < 1e-9))
  }

  // ----------------------------------------------------------- triangles

  test("Triangles.run matches brute force on a random graph") {
    val rnd = new scala.util.Random(42)
    val edges = (1 to 120).map(_ => (rnd.nextInt(15).toLong,
      rnd.nextInt(15).toLong)).distinct
    val canon = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }.distinct
    val eset = canon.toSet
    val vs = canon.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    var brute = 0L
    for {
      i <- vs.indices; j <- (i + 1) until vs.size; l <- (j + 1) until vs.size
      if eset((vs(i), vs(j))) && eset((vs(j), vs(l))) && eset((vs(i), vs(l)))
    } brute += 1
    val out = Triangles.run(edges.toDF("a", "b"), "a", "b").collect()(0)
    assert(out.getLong(0) === canon.size.toLong)
    assert(out.getLong(1) === brute)
  }

  test("Triangles.run counts one triangle exactly once") {
    val df = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("a", "b")
    val out = Triangles.run(df, "a", "b").collect()(0)
    assert(out.getLong(0) === 4L && out.getLong(1) === 1L)
  }

  test("Triangles: forced distributed fallback matches broadcast path") {
    val df = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L),
      (5L, 3L), (4L, 1L)).toDF("a", "b")
    val bc = Triangles.run(df, "a", "b").collect()(0)
    val dist = Triangles.run(df, "a", "b", adjBytesBudget = 0L).collect()(0)
    assert(bc.getLong(0) === dist.getLong(0))
    assert(bc.getLong(1) === dist.getLong(1))
  }

  test("Triangles.estimatedAdjBytes: byte-aware across id widths") {
    val longIds = Seq((1L, 2L)).toDF("src", "dst")
    val wideIds = Seq(("u", "x" * 40)).toDF("src", "dst")
    val n = 1000L
    val longEst = Triangles.estimatedAdjBytes(longIds, n)
    val wideEst = Triangles.estimatedAdjBytes(wideIds, n)
    assert(longEst === n * 8L + 48L * n)
    assert(wideEst === n * (40L + 16L) + 48L * n)
    assert(wideEst > longEst) // same edge count, bigger payload
  }

  // ----------------------------------------------------- weighted sample

  test("weightedSample: deterministic, zero-weight excluded, k-monotone") {
    val df = (1L to 400L).map(i => (i, if (i % 10 == 0) 0L else i % 97))
      .toDF("id", "w")
    def ids(k: Int) = Sampling.weightedSample(df, "id", "w", k)
      .select("id").as[Long].collect().toSet
    val k50 = ids(50)
    assert(ids(50) === k50) // deterministic
    assert(k50.forall(_ % 10 != 0)) // zero weight never kept
    assert(k50.subsetOf(ids(150))) // larger target ⊇ smaller
  }

  // ------------------------------------------------------ decontaminate

  test("Decontaminate.flag finds planted n-gram overlap only") {
    val eval = Seq((100L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val train = Seq(
      (1L, "x alpha beta gamma delta epsilon y"), // shares 1 5-gram
      (2L, "totally different words here entirely now"),
      (3L, "alpha beta gamma delta wrong tail")) // 4-token overlap only
      .toDF("doc_id", "text")
    val out = Decontaminate.flag(train, eval, "text", "doc_id", k = 5)
      .orderBy("doc_id").collect()
    assert(out.toSeq === Seq(
      Row(1L, 1L, true), Row(2L, 0L, false), Row(3L, 0L, false)))
  }

  // ----------------------------------------------------------- seq pack

  test("SeqPack.pack conserves tokens and fills sequences exactly") {
    val docs = (1L to 57L).map(i => (i, 1L + (i * 13) % 40))
      .toDF("doc_id", "nt")
    val out = SeqPack.pack(docs, "doc_id", "nt", seqLen = 64)
    val perDoc = out.groupBy("doc_id").agg(sum("n_toks").as("t"))
      .orderBy("doc_id").select("t").as[Long].collect()
    val want = (1L to 57L).map(i => 1L + (i * 13) % 40)
    assert(perDoc.toSeq === want)
    val perSeq = out.groupBy("seq_id").agg(sum("n_toks").as("t"))
      .orderBy("seq_id").select("t").as[Long].collect()
    assert(perSeq.init.forall(_ === 64L)) // all but the tail are full
    assert(perSeq.last <= 64L)
    // slices within a doc are contiguous from 0
    val slices = out.orderBy("doc_id", "seq_id")
      .select("doc_id", "tok_start", "n_toks").collect()
      .groupBy(_.getLong(0))
    slices.values.foreach { rs =>
      rs.foldLeft(0L) { (pos, r) =>
        assert(r.getLong(1) === pos); pos + r.getLong(2)
      }
    }
  }

  test("SeqPack.pack is invariant to input partitioning") {
    val docs = (1L to 100L).map(i => (i, 1L + i % 17)).toDF("doc_id", "nt")
    def run(df: org.apache.spark.sql.DataFrame) =
      SeqPack.pack(df, "doc_id", "nt", seqLen = 32)
        .orderBy("seq_id", "doc_id").collect().toSeq
    assert(run(docs.repartition(1)) === run(docs.repartition(7)))
  }

  // ----------------------------------------------------------- fuzzy join

  test("FuzzyJoin.editDistancePairs matches brute-force levenshtein") {
    val names = Seq("kitten", "sitten", "sittin", "kittens", "mitten",
      "cat", "cap", "cat", "dog", "do", "kitte", "abcdef")
    val df = names.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "s")
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val brute = (for {
      i <- names.indices; j <- (i + 1) until names.size
      if lev(names(i), names(j)) <= 1
    } yield (i.toLong, j.toLong, lev(names(i), names(j)).toLong)).sorted
    val got = FuzzyJoin.editDistancePairs(df, "id", "s")
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === brute)
  }

  test("FuzzyJoin handles empty and single-char strings") {
    val df = Seq((1L, ""), (2L, ""), (3L, "a"), (4L, "b"), (5L, "ab"))
      .toDF("id", "s")
    val got = FuzzyJoin.editDistancePairs(df, "id", "s")
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // ""≡"" (0); ""~"a"/"b" (1); "a"~"b" (1); "a"/"b"~"ab" (1)
    assert(got === Seq((1L, 2L, 0L), (1L, 3L, 1L), (1L, 4L, 1L),
      (2L, 3L, 1L), (2L, 4L, 1L), (3L, 4L, 1L), (3L, 5L, 1L),
      (4L, 5L, 1L)))
  }

  test("FuzzyJoin candidate generation contains no non-equi join") {
    val df = Seq((1L, "aa"), (2L, "ab")).toDF("id", "s")
    val plan = FuzzyJoin.editDistancePairs(df, "id", "s")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }

  // ------------------------------------------------------- plan shapes

  test("SeqPack.pack plans no single-partition exchange") {
    val docs = (1L to 500L).map(i => (i, 1L + i % 17)).toDF("doc_id", "nt")
    val out = SeqPack.pack(docs, "doc_id", "nt", seqLen = 64)
    out.collect() // resolve AQE so the final plan is the executed one
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      "global token offsets must not serialise onto one partition")
  }

  test("Outliers.flag probes via broadcast join, no per-group window") {
    val df = (1L to 300L).map(i => ("g" + i % 3, i, i % 50))
      .toDF("g", "id", "v")
    val out = Outliers.flag(df, Seq("g"), "v", z = 2)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("Window"),
      "group stats must broadcast back, not window over the groups")
  }

  // ------------------------------------------------- kmeans assignments

  test("KMeans.fitAssign sizes agree with fit's n_points") {
    val rnd = new scala.util.Random(7)
    val pts = (0L until 60L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2 - 1))).toDF("vec_id", "v")
    val asg = graft.similarity.KMeans
      .fitAssign(pts, "vec_id", "v", k = 4, iterations = 2)
    val sizes = asg.groupBy("cid").agg(count(lit(1)).as("n"))
      .orderBy("cid").collect().map(r => (r.getLong(0), r.getLong(1)))
    val fromFit = graft.similarity.KMeans
      .fit(pts, "vec_id", "v", k = 4, iterations = 2)
      .select("cid", "n_points").distinct()
      .orderBy("cid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(sizes.toSeq === fromFit.toSeq)
  }
}
