package graft

import graft.functions.HllSketch
import graft.operators.{PerKey, Profile, Quantiles, Sampling, Sessionize,
  TemporalJoins, TimeSeries}
import graft.queries.Q
import graft.similarity.Centroids
import graft.text.Chunker
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Round-4 analytics operators: temporal joins, quantiles, HLL,
  * sampling, chunking, centroids — ground-truth values + plan-shape
  * assertions (the scale claims, checked against the executed plan).
  */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------------- asof

  private def asofFixture = {
    val left = Seq((1L, 10L, 100L), (1L, 20L, 200L), (2L, 5L, 500L))
      .toDF("k", "t", "lv")
    val right = Seq((1L, 10L, "a"), (1L, 15L, "b"), (2L, 9L, "c"))
      .toDF("k", "t", "rv")
      .select(col("k"), col("t"), col("rv"), col("t").as("rt"))
    (left, right)
  }

  test("asofJoin picks the latest right row at-or-before each left row") {
    val (left, right) = asofFixture
    val out = TemporalJoins.asofJoin(left, right, Seq("k"), "t", "t",
      Seq("rt", "rv")).orderBy("k", "t").collect()
    assert(out.toSeq === Seq(
      Row(1L, 10L, 100L, 10L, "a"),   // equal ts matches (inclusive)
      Row(1L, 20L, 200L, 15L, "b"),   // latest of the two priors
      Row(2L, 5L, 500L, null, null))) // no prior → nulls
  }

  test("asofJoin strict mode excludes equal timestamps") {
    val (left, right) = asofFixture
    val out = TemporalJoins.asofJoin(left, right, Seq("k"), "t", "t",
      Seq("rv"), inclusive = false).orderBy("k", "t").collect()
    assert(out.map(_.get(3)).toSeq === Seq(null, "b", null))
  }

  test("asofJoin null equi-keys match nothing (SQL join semantics)") {
    val left = Seq[(java.lang.Long, Long, Long)](
      (null, 10L, 100L), (1L, 10L, 200L)).toDF("k", "t", "lv")
    val right = Seq[(java.lang.Long, Long, String)](
      (null, 5L, "x"), (1L, 5L, "y")).toDF("k", "t", "rv")
      .select(col("k"), col("t"), col("rv"))
    val out = TemporalJoins.asofJoin(left, right, Seq("k"), "t", "t",
      Seq("rv")).orderBy("t", "lv").collect()
    // the null-keyed left row must NOT pick up the null-keyed right payload
    assert(out.toSeq === Seq(Row(null, 10L, 100L, null),
      Row(1L, 10L, 200L, "y")))
  }

  test("asofJoin plans exactly one shuffle (union trick, no join node)") {
    val (left, right) = asofFixture
    val out = TemporalJoins.asofJoin(left, right, Seq("k"), "t", "t",
      Seq("rv"))
    out.count() // materialise so the adaptive plan is final
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert("Exchange hashpartitioning".r.findAllMatchIn(plan).size === 1,
      s"expected exactly one shuffle:\n$plan")
    assert(!plan.contains("Join"), s"expected no join node:\n$plan")
  }

  // --------------------------------------------------------------- range

  test("rangeJoin matches points to containing ranges across bins") {
    val points = Seq((1L, 5L, 100L), (1L, 25L, 101L), (2L, 5L, 102L))
      .toDF("k", "t", "pid")
    // range spanning several bins; end exclusive
    val ranges = Seq((1L, 0L, 30L, 900L), (1L, 25L, 26L, 901L),
      (2L, 6L, 30L, 902L)).toDF("k", "s", "e", "rid")
    val out = TemporalJoins.rangeJoin(points, ranges, Seq("k"),
      "t", "s", "e", binWidth = 10L)
      .select("pid", "rid").as[(Long, Long)].collect().sorted
    assert(out.toSeq === Seq((100L, 900L), (101L, 900L), (101L, 901L)))
  }

  test("rangeJoin point on exclusive end is excluded, on start included") {
    val points = Seq((1L, 10L, 1L), (1L, 20L, 2L)).toDF("k", "t", "pid")
    val ranges = Seq((1L, 10L, 20L, 9L)).toDF("k", "s", "e", "rid")
    val out = TemporalJoins.rangeJoin(points, ranges, Seq("k"),
      "t", "s", "e", 7L).select("pid").as[Long].collect()
    assert(out.toSeq === Seq(1L))
  }

  test("rangeJoin plans a hash/merge equi-join, never a nested loop") {
    val points = Seq((1L, 5L, 100L)).toDF("k", "t", "pid")
    val ranges = Seq((1L, 0L, 30L, 900L)).toDF("k", "s", "e", "rid")
    val out = TemporalJoins.rangeJoin(points, ranges, Seq("k"),
      "t", "s", "e", 10L)
    out.count()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.toLowerCase.contains("cartesian"),
      s"range join must stay an equi-join:\n$plan")
  }

  // ----------------------------------------------------------- quantiles

  test("groupQuantiles reads exact discrete quantiles off the histogram") {
    // group a: values 1..4 once each; group b: heavy repeats
    val df = (Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0)) ++
      Seq.fill(9)(("b", 5.0)) :+ ("b", 7.0)).toDF("g", "x")
    val out = Quantiles.groupQuantiles(df, Seq("g"), "x",
      Seq(0.25, 0.5, 1.0)).orderBy("g", "q").collect()
    assert(out.toSeq === Seq(
      Row("a", 0.25, 1.0, 4L), Row("a", 0.5, 2.0, 4L),
      Row("a", 1.0, 4.0, 4L),
      Row("b", 0.25, 5.0, 10L), Row("b", 0.5, 5.0, 10L),
      Row("b", 1.0, 7.0, 10L)))
  }

  test("groupQuantiles ignores null values like SQL percentile functions") {
    val df = Seq[(String, java.lang.Double)](
      ("a", null), ("a", 1.0), ("a", 2.0), ("a", 3.0)).toDF("g", "x")
    val out = Quantiles.groupQuantiles(df, Seq("g"), "x",
      Seq(0.25, 1.0)).orderBy("q").collect()
    // n=3 (null excluded), p25 → first value, max → 3.0
    assert(out.toSeq === Seq(Row("a", 0.25, 1.0, 3L), Row("a", 1.0, 3.0, 3L)))
  }

  // ----------------------------------------------------------------- hll

  test("hll rho column matches a leading-zero kernel bit-for-bit") {
    val hashes = Seq(0L, 1L, 63L, 64L, 65L, 1L << 59, (1L << 60) - 1,
      123456789012345L)
    val df = hashes.toDF("h")
    val got = df.select(HllSketch.rhoCol(col("h"))).as[Int].collect()
    val want = hashes.map { h =>
      val rest = h >>> HllSketch.BucketBits
      val rho =
        if (rest == 0) HllSketch.RestBits + 1
        else HllSketch.RestBits - (63 - java.lang.Long.numberOfLeadingZeros(rest))
      math.min(rho, HllSketch.MaxRho)
    }
    assert(got.toSeq === want)
  }

  test("hll registers merge by max and the estimate tracks exact count") {
    val n = 5000
    val df = spark.range(n).toDF("v")
    val regs = HllSketch.registers(spark, df, "v")
    assert(regs.count() === HllSketch.M)
    // mergeability: registers of two halves max-merge to the full set
    val a = HllSketch.registers(spark, spark.range(0, n / 2).toDF("v"), "v")
    val b = HllSketch.registers(spark, spark.range(n / 2, n).toDF("v"), "v")
    val merged = a.union(b).groupBy("bucket").agg(max("m").as("m"))
    val full = regs.orderBy("bucket").as[(Long, Int)].collect()
    assert(merged.orderBy("bucket").as[(Long, Int)].collect().toSeq
      === full.toSeq)
    // 64 registers → ~13% stderr; 4σ bound keeps this deterministic-safe
    val est = HllSketch.estimate(regs).select("estimate").as[Double].head()
    assert(math.abs(est - n) / n < 0.52, s"estimate $est vs exact $n")
  }

  // ------------------------------------------------------------ sampling

  test("hash sampling is deterministic, salted, and roughly proportional") {
    val df = spark.range(2000).toDF("id")
    val s1 = Sampling.hashSample(df, "id", 30).as[Long].collect().sorted
    val s2 = Sampling.hashSample(df, "id", 30).as[Long].collect().sorted
    assert(s1.toSeq === s2.toSeq)
    assert(math.abs(s1.length - 600) < 120)
    val other = Sampling.hashSample(df, "id", 30, salt = "other:")
      .as[Long].collect().sorted
    assert(other.toSeq !== s1.toSeq)
    // nested rates: a 20% sample is a subset of a 50% one (same salt)
    val small = Sampling.hashSample(df, "id", 20).as[Long].collect().toSet
    val big = Sampling.hashSample(df, "id", 50).as[Long].collect().toSet
    assert(small.subsetOf(big))
  }

  test("stratified sampling applies per-stratum rates") {
    val df = (0 until 1000).map(i => (i.toLong, if (i % 2 == 0) "en" else "de"))
      .toDF("id", "lang")
    val out = Sampling.stratifiedSample(df, "id", "lang",
      Map("en" -> 100), defaultPct = 0)
    assert(out.select("lang").distinct().as[String].collect().toSeq
      === Seq("en"))
    assert(out.count() === 500)
  }

  test("temperatureMix upsamples rare sources toward sqrt-flattened shares") {
    // 9:1 corpus: big source 2700 docs, rare source 300
    val df = (0 until 3000).map(i =>
      (i.toLong, if (i % 10 == 0) "rare" else "big")).toDF("id", "src")
    val out = Sampling.temperatureMix(df, "id", "src", k = 600)
      .groupBy("src").count().as[(String, Long)].collect().toMap
    // corpus shares are 90/10; sqrt-flattened targets are
    // sqrt(2700):sqrt(300) = 75/25 — the rare share must rise well above
    // its corpus share while the big one falls (rates are exact, the
    // hash draw adds sampling noise only)
    val total = out.values.sum.toDouble
    assert(out("rare") / total > 0.18, s"rare share too low: $out")
    assert(out("big") / total < 0.82, s"big share too high: $out")
    // deterministic: the same rows on a second evaluation
    val a = Sampling.temperatureMix(df, "id", "src", k = 600)
      .select("id").as[Long].collect().toSet
    val b = Sampling.temperatureMix(df, "id", "src", k = 600)
      .select("id").as[Long].collect().toSet
    assert(a == b)
  }

  // ------------------------------------------------------------ chunking

  test("chunker windows cover every token with the configured overlap") {
    val text = (1 to 95).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val out = Chunker.chunk(df, "doc_id", "text", chunkSize = 40, stride = 30)
      .orderBy("chunk_id").collect()
    assert(out.map(r => (r.getLong(1), r.getInt(2), r.getInt(3))).toSeq
      === Seq((0L, 1, 40), (1L, 31, 40), (2L, 61, 35), (3L, 91, 5)))
    // overlap: chunk k starts 10 tokens before chunk k-1 ends
    val texts = out.map(_.getString(4))
    assert(texts(0).split(" ").drop(30).toSeq
      === texts(1).split(" ").take(10).toSeq)
    // full coverage: union of chunk tokens = original tokens
    assert(texts.flatMap(_.split(" ")).distinct.length === 95)
  }

  test("chunker yields one short chunk for short and empty docs") {
    val df = Seq((1L, "a b c"), (2L, "   ")).toDF("doc_id", "text")
    val out = Chunker.chunk(df, "doc_id", "text", 40, 30)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getInt(3), r.getString(4))).toSeq
      === Seq((1L, 3, "a b c"), (2L, 0, "")))
  }

  // --------------------------------------------------------------- bloom

  test("bloom kernel is bit-identical to the declarative membership test") {
    import graft.functions.BloomFilter
    val keys = (0 until 50).map(i => (i * 7).toString)
    val dim = keys.toDF("k")
    val words = BloomFilter.build(dim, "k", numBits = 1 << 10, numHashes = 5)
    val probes = (0 until 3000).map(_.toString).toDF("v")
    val declarative = probes
      .withColumn("__bh", BloomFilter.hashCol(col("v")))
      .withColumn("hit", BloomFilter.mightContain(col("__bh"), words, 5))
      .select("v", "hit").as[(String, Boolean)].collect().toMap
    val kernel = probes
      .withColumn("hit", BloomFilter.mightContainUdf(words, 5)(col("v")))
      .select("v", "hit").as[(String, Boolean)].collect().toMap
    assert(kernel === declarative)
    // no false negatives; false-positive rate sane for m=1024, n=50, k=5
    assert(keys.forall(kernel(_)))
    val fps = kernel.count { case (v, hit) => hit && !keys.contains(v) }
    assert(fps < 3000 * 0.05, s"fp rate too high: $fps/3000")
  }

  test("bloom build ignores null dim keys (a semi-join would too)") {
    import graft.functions.BloomFilter
    val dim = Seq[java.lang.Long](3L, null, 5L).toDF("dk")
    val words = BloomFilter.build(dim, "dk", numBits = 1 << 10, numHashes = 5)
    val fact = spark.range(10).toDF("fk")
    val got = BloomFilter.semiJoin(fact, "fk", dim, "dk")
      .orderBy("fk").as[Long].collect()
    assert(got.toSeq === Seq(3L, 5L))
  }

  test("bloom semiJoin equals the plain semi-join and actually prunes") {
    import graft.functions.BloomFilter
    val dim = Seq(3L, 5L, 8L).toDF("dk")
    val fact = spark.range(1000).toDF("fk")
      .withColumn("payload", col("fk") * 2)
    val got = BloomFilter.semiJoin(fact, "fk", dim, "dk")
      .orderBy("fk").as[(Long, Long)].collect()
    assert(got.toSeq === Seq((3L, 6L), (5L, 10L), (8L, 16L)))
    val pruned = fact.where(
      BloomFilter.mightContainUdf(
        BloomFilter.build(dim, "dk", 1 << 14, 5), 5)(
        col("fk").cast("string"))).count()
    assert(pruned < 100, s"bloom should prune most of 1000 rows: $pruned")
  }

  // ----------------------------------------------------------- centroids

  test("centroids are exact fixed-point means, order-independent") {
    val df = Seq(
      (0, Seq(1.0f, -2.0f)), (0, Seq(3.0f, 4.0f)), (1, Seq(0.5f, 0.25f)))
      .toDF("label", "embedding")
    val out = Centroids.centroids(df, "label", "embedding")
      .orderBy("label", "dim")
      .select("label", "dim", "n_vectors", "centroid").collect()
    assert(out.toSeq === Seq(
      Row(0, 1L, 2L, 2.0), Row(0, 2L, 2L, 1.0),
      Row(1, 1L, 1L, 0.5), Row(1, 2L, 1L, 0.25)))
    // order independence: reversed input, single partition vs many
    val rev = Centroids.centroids(
      df.orderBy(col("label").desc).repartition(7), "label", "embedding")
      .orderBy("label", "dim")
      .select("label", "dim", "n_vectors", "centroid").collect()
    assert(rev.toSeq === out.toSeq)
  }

  // ---------------------------------------------------------- sessionize

  test("sessionize splits on gaps and aggregates per session") {
    // user 1: events at 0, 10, 100 (gap 50 splits before 100); user 2: one
    val ev = Seq((1L, 0L, 1L), (1L, 10L, 2L), (1L, 100L, 3L),
      (2L, 7L, 4L)).toDF("u", "t", "id")
    val out = Sessionize.sessionize(ev, "u", "t", gap = 50,
      tieBreak = Seq("id")).orderBy("u", "session_seq").collect()
    assert(out.toSeq === Seq(
      Row(1L, 1L, 2L, 0L, 10L, 10L),
      Row(1L, 2L, 1L, 100L, 100L, 0L),
      Row(2L, 1L, 1L, 7L, 7L, 0L)))
  }

  test("sessionize ties at a timestamp never open a session mid-tie") {
    val ev = Seq((1L, 5L, 9L), (1L, 5L, 1L), (1L, 5L, 4L))
      .toDF("u", "t", "id")
    val out = Sessionize.sessionize(ev, "u", "t", gap = 1,
      tieBreak = Seq("id")).collect()
    assert(out.toSeq === Seq(Row(1L, 1L, 3L, 5L, 5L, 0L)))
  }

  test("sessionize plans ONE exchange (agg reuses the window partitioning)") {
    val ev = Seq((1L, 0L, 1L)).toDF("u", "t", "id")
    val plan = Sessionize.sessionize(ev, "u", "t", gap = 50,
      tieBreak = Seq("id")).queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllMatchIn(plan).size === 1,
      s"expected a single exchange:\n$plan")
  }

  // -------------------------------------------------------------- argMax

  test("argMax keeps the row with the greatest ordering tuple per key") {
    val df = Seq(
      (1L, 10L, 2L, "a"), (1L, 10L, 5L, "b"), (1L, 9L, 9L, "c"),
      (2L, 1L, 1L, "d")).toDF("k", "t", "seq", "v")
    val out = PerKey.argMax(df, Seq("k"), Seq("t", "seq"), Seq("v"))
      .orderBy("k").collect()
    assert(out.toSeq === Seq(
      Row(1L, 10L, 5L, "b"), // tie on t broken by seq
      Row(2L, 1L, 1L, "d")))
  }

  test("argMax equals the window row_number formulation") {
    val r = new scala.util.Random(7)
    val df = (1 to 500).map(i =>
      (r.nextInt(20).toLong, r.nextInt(50).toLong, i.toLong, r.nextInt(9)))
      .toDF("k", "t", "seq", "v")
    val viaAgg = PerKey.argMax(df, Seq("k"), Seq("t", "seq"), Seq("v"))
      .orderBy("k").collect()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy(col("t").desc, col("seq").desc)
    val viaWindow = df.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1).select("k", "t", "seq", "v")
      .orderBy("k").collect()
    assert(viaAgg.toSeq === viaWindow.toSeq)
  }

  // ------------------------------------------------------------- gapFill

  test("gapFill produces a dense axis with zero-filled measures") {
    val df = Seq(("a", 1L, 5.0), ("a", 3L, 2.0), ("b", 2L, 1.0))
      .toDF("g", "d", "v")
    val out = TimeSeries.gapFill(df, "g", col("d"), "day",
      Seq(count(lit(1)).as("n"), Q.dsum(col("v"), 2).as("tv")))
      .orderBy("g", "day").collect()
    assert(out.toSeq === Seq(
      Row("a", 1L, 1L, 5.0), Row("a", 2L, 0L, 0.0), Row("a", 3L, 1L, 2.0),
      Row("b", 1L, 0L, 0.0), Row("b", 2L, 1L, 1.0), Row("b", 3L, 0L, 0.0)))
  }

  // ---------------------------------------------------- approx quantiles

  test("approxGroupQuantiles stay within the grid width of exact") {
    val r = new scala.util.Random(11)
    val df = (1 to 2000).map(_ => ("g", r.nextDouble() * 10000))
      .toDF("g", "v")
    val exact = Quantiles.groupQuantiles(df, Seq("g"), "v",
      Seq(0.5, 0.9)).orderBy("q").collect().map(_.getDouble(2))
    val approx = Quantiles.approxGroupQuantiles(df, Seq("g"), "v",
      width = 64, qs = Seq(0.5, 0.9)).orderBy("q").collect()
      .map(_.getLong(2).toDouble)
    exact.zip(approx).foreach { case (e, a) =>
      assert(math.abs(e - a) <= 64.0, s"exact=$e approx=$a")
    }
  }

  // ----------------------------------------------------------- histogram

  test("histogram buckets are fixed-width with an open-ended last bucket") {
    val df = (Seq(0L, 5L, 19L, 20L, 45L, 1000L) :+ -1L).toDF("v")
    val out = Quantiles.histogram(df.where(col("v") >= 0), col("v"),
      width = 20, nBuckets = 3).orderBy("bucket").collect()
    assert(out.toSeq === Seq(
      Row(0L, 3L, 0L, 19L),   // [0, 20)
      Row(1L, 1L, 20L, 20L),  // [20, 40)
      Row(2L, 2L, 45L, 1000L))) // open-ended
  }

  // ------------------------------------------------------------- profile

  test("profile computes nulls/distincts/bounds in one aggregation") {
    val df = Seq(("x", java.lang.Long.valueOf(3L)),
      ("y", java.lang.Long.valueOf(1L)), ("x", null))
      .toDF("s", "n")
    val out = Profile.profile(df, Seq("s", "n")).orderBy("col_name")
      .collect()
    assert(out.toSeq === Seq(
      Row("n", 3L, 1L, 2L, "1", "3"),
      Row("s", 3L, 0L, 2L, "x", "y")))
    val plan = Profile.profile(df, Seq("s", "n"))
      .queryExecution.optimizedPlan.toString
    // one source scan feeds all statistics
    assert("LocalRelation".r.findAllMatchIn(plan).size <= 1,
      s"profile must not re-scan per column:\n$plan")
  }

  // --------------------------------------------------------- groupSample

  test("groupSample keeps exactly k rows per group, deterministically") {
    val df = (1 to 200).map(i => (i.toLong, if (i % 3 == 0) "a" else "b"))
      .toDF("id", "g")
    val s1 = Sampling.groupSample(df, "g", "id", k = 7)
      .orderBy("id").collect()
    assert(s1.groupBy(_.getString(1)).view.mapValues(_.length).toMap
      === Map("a" -> 7, "b" -> 7))
    // rerun over different partitioning selects the same rows
    val s2 = Sampling.groupSample(df.repartition(13), "g", "id", k = 7)
      .orderBy("id").collect()
    assert(s1.toSeq === s2.toSeq)
    // a group smaller than k survives whole
    val tiny = Seq((1L, "z"), (2L, "z")).toDF("id", "g")
    assert(Sampling.groupSample(tiny, "g", "id", k = 7).count() === 2)
  }

  // ------------------------------------------------------------ pagerank

  test("pagerank: a cycle is an exact fixed point at the initial rank") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val out = operators.PageRank.run(edges, 5).orderBy("id").collect()
    // outdeg 1 everywhere: r' = 150000 + (17 * 1000000) div 20 = 1000000
    assert(out.toSeq === Seq(Row(1L, 1000000L), Row(2L, 1000000L),
      Row(3L, 1000000L)))
  }

  test("pagerank: hub of an undirected star outranks leaves, mass kept") {
    val leaves = (2L to 6L)
    val edges = (leaves.map(l => (1L, l)) ++ leaves.map(l => (l, 1L)))
      .toDF("src", "dst")
    val out = operators.PageRank.run(edges, 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(leaves.forall(l => out(1L) > out(l)),
      s"hub must outrank leaves: $out")
    val total = out.values.sum
    // floor dust only: within 6 * iterations of n * Scale
    assert(math.abs(total - 6L * operators.PageRank.Scale) < 30L,
      s"rank mass should be conserved: $total")
  }

  // -------------------------------------------------------------- kmeans

  test("kmeans separates two blobs and is partitioning-independent") {
    import graft.similarity.KMeans
    // two tight 2-d blobs around (0.1, 0.1) and (-0.4, -0.4); seeds are
    // the two smallest ids, one in each blob
    val pts = Seq(
      (1L, Seq(0.10f, 0.12f)), (3L, Seq(0.11f, 0.09f)),
      (5L, Seq(0.09f, 0.10f)),
      (2L, Seq(-0.40f, -0.41f)), (4L, Seq(-0.39f, -0.42f)))
      .toDF("vec_id", "embedding")
    val out = KMeans.fit(pts, "vec_id", "embedding", k = 2, iterations = 3)
      .orderBy("cid", "dim").collect()
    val sizes = out.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(sizes === Map(1L -> 3L, 2L -> 2L))
    // centroid of cluster 2 ≈ (-0.395 - 0.415 means) in offset space:
    // cfp/2^20 - 2 recovers the mean within the fixed-point grid
    val c2d1 = out.find(r => r.getLong(0) == 2L && r.getLong(1) == 1L).get
      .getLong(3) / KMeans.Scale.toDouble - KMeans.Offset
    assert(math.abs(c2d1 - (-0.395)) < 1e-2, s"got $c2d1")
    val reshuffled = KMeans.fit(pts.repartition(7), "vec_id", "embedding",
      k = 2, iterations = 3).orderBy("cid", "dim").collect()
    assert(reshuffled.toSeq === out.toSeq)
  }

  test("kmeans assign kernel is bit-identical to the declarative rendering") {
    import graft.similarity.KMeans
    // adversarial layout: duplicated points (exact distance ties between
    // centroids), centroids with identical coordinates (cid tie-break),
    // and a wide value range stressing the integer fixed-point math
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 64L).map { i =>
      i -> Seq.fill(8)((rnd.nextInt(4001) - 2000) / 1000.0f)
    }
    val withDups = vecs ++ vecs.take(8).map { case (i, v) => (i + 100L, v) }
    val df = withDups.toDF("vec_id", "embedding")
    val pts = KMeans.pointsFp(df, "vec_id", "embedding")
    // centroid frame: first 5 points' coordinates, TWO of them identical
    // (cids 0 and 1 share coords -> every point ties between them)
    val cent = pts.orderBy("vec_id").limit(5)
      .collect().zipWithIndex.map { case (r, i) =>
        (i.toLong, if (i == 1) pts.orderBy("vec_id").limit(1)
          .collect()(0).getSeq[Long](1) else r.getSeq[Long](1))
      }
    val centDf = spark.createDataFrame(cent.toSeq.map {
      case (cid, c) => (cid, c)
    }).toDF("cid", "c")
    val kernel = KMeans.assign(pts, centDf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val decl = KMeans.assignDeclarative(pts, centDf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kernel === decl)
    // the engineered coordinate tie resolves to the smaller cid
    assert(kernel.values.forall(_ != 1L),
      "cid 1 duplicates cid 0's coordinates and must never win a tie")
  }

  // ---------------------------------------------------- pivotRowsToCols

  test("pivotRowsToCols is the inverse of pivotColsToRows on sums") {
    implicit val c: GraftConf = tmpConf()
    val dfl = DataFlow(spark, "pivot_spec")
    dfl.createDataset("t", Seq(("r1", "F", 2.0), ("r1", "O", 3.0),
      ("r2", "F", 5.0), ("r1", "F", 4.0)).toDF("k", "st", "qty"))
    dfl.pivotRowsToCols("t", Seq("k"), "st", Seq("F", "O"),
      sum(col("qty").cast(org.apache.spark.sql.types.DecimalType(28, 4))),
      prefix = "qty_")
    val wide = dfl.get("t")
      .select(col("k"), col("qty_F").cast("double"),
        col("qty_O").cast("double"))
      .orderBy("k").collect()
    assert(wide.toSeq === Seq(Row("r1", 6.0, 3.0), Row("r2", 5.0, null)))
  }

  test("hll register merge law: merge(regs(A), regs(B)) == regs(A ∪ B)") {
    import spark.implicits._
    val a = (1 to 400).map(i => s"u$i").toDF("v")
    val b = (200 to 600).map(i => s"u$i").toDF("v") // overlapping slice
    val ra = HllSketch.registers(spark, a, "v")
    val rb = HllSketch.registers(spark, b, "v")
    val direct = HllSketch.registers(spark, a.union(b), "v")
    def regs(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("bucket").collect()
        .map(r => (r.getLong(0), r.get(1).toString.toInt)).toSeq
    val want = regs(direct)
    assert(want.size == HllSketch.M)
    // lossless under union, and commutative — the properties that make
    // the sketch mergeable across batches/executors/sites
    assert(regs(HllSketch.mergeRegisters(ra, rb)) == want)
    assert(regs(HllSketch.mergeRegisters(rb, ra)) == want)
    // idempotent: re-merging a side changes nothing
    assert(regs(HllSketch.mergeRegisters(direct, ra)) == want)
  }

  test("cms applyBatch: additive merge equals batch sketch, replay is a no-op") {
    import graft.functions.CountMinSketch
    import spark.implicits._
    val a = Seq("x", "x", "y", "z").toDF("term")
    val b = Seq("x", "y", "w").toDF("term")
    val base = java.nio.file.Files
      .createTempDirectory("cms_replay").toString + "/state"
    CountMinSketch.applyBatch(spark, a, "term", 0L, base)
    val afterA = spark.read.parquet(base).drop("last_batch")
      .orderBy("j", "cell").collect().toSeq
    // replayed batch id: counters must NOT double
    CountMinSketch.applyBatch(spark, a, "term", 0L, base)
    assert(spark.read.parquet(base).drop("last_batch")
      .orderBy("j", "cell").collect().toSeq == afterA)
    // a genuinely new batch folds in; the union grid equals the batch
    // sketch over A ∪ B (cell-wise addition is the sketch's merge)
    CountMinSketch.applyBatch(spark, b, "term", 1L, base)
    val streamed = spark.read.parquet(base).drop("last_batch")
      .orderBy("j", "cell").collect().toSeq
    val direct = CountMinSketch.sketch(a.union(b), "term")
      .orderBy("j", "cell").collect().toSeq
    assert(streamed == direct)
  }

  test("mini-batch kmeans: replayed batch is a no-op (batch-id watermark)") {
    import graft.similarity.{KMeans, MiniBatchKMeans}
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val emb = (0 until 60).map { i =>
      (i.toLong, Array.fill(4)(rnd.nextFloat() * 2 - 1))
    }.toDF("id", "v")
    val base = java.nio.file.Files
      .createTempDirectory("skm_replay").toString
    val result = MiniBatchKMeans.fitStream(
      spark, emb, "id", "v", k = 4, nBatches = 3, baseDir = base)
    val before = result.orderBy("cid", "dim").collect().toSeq
    // re-deliver the whole corpus under already-applied batch ids —
    // sums would double without the watermark; state must not move
    val replay = KMeans.pointsFp(emb, "id", "v")
    MiniBatchKMeans.applyBatch(spark, replay, 2L, 4, base + "/state")
    MiniBatchKMeans.applyBatch(spark, replay, 0L, 4, base + "/state")
    val after = spark.read.parquet(base + "/state")
      .select(col("cid"), col("dim"), col("n").as("n_points"),
        expr("s div n").as("centroid_fp"))
      .orderBy("cid", "dim").collect().toSeq
    assert(after == before)
  }
}
