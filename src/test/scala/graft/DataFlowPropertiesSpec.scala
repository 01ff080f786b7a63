package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck properties over the row operators (SURVEY §5: filter
  * partition, union counts, dedupe idempotence). Driven programmatically
  * (the scalatest-scalacheck bridge artifact is not in the offline
  * cache).
  */
class DataFlowPropertiesSpec extends SparkSpec {

  private val values = Gen.listOfN(30, Gen.oneOf("a", "b", "c", "d"))

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: filter(Eq) and filter(Ne) partition the rows") {
    implicit val c: GraftConf = tmpConf()
    check(Prop.forAll(values, Gen.oneOf("a", "b", "c", "d")) {
      (vs, pivot) =>
        vs.isEmpty || {
          val dfl = flow("prop")
          dfl.createDataset("t", Map("v" -> vs))
          dfl.filter("t", Map("v" -> FilterSpec.Eq(pivot)),
            targetDataset = Some("eq"))
          dfl.filter("t", Map("v" -> FilterSpec.Ne(pivot)),
            targetDataset = Some("ne"))
          dfl.get("eq").count() + dfl.get("ne").count() == vs.size
        }
    })
  }

  test("property: union row count is the sum of the inputs") {
    implicit val c: GraftConf = tmpConf()
    check(Prop.forAll(values, values) { (l, r) =>
      l.isEmpty || r.isEmpty || {
        val dfl = flow("prop")
        dfl.createDataset("l", Map("v" -> l))
        dfl.createDataset("r", Map("v" -> r))
        dfl.union(Seq("l", "r"), "u")
        dfl.get("u").count() == l.size + r.size
      }
    })
  }

  test("property: dedupe is idempotent and bounded by distinct values") {
    implicit val c: GraftConf = tmpConf()
    check(Prop.forAll(values) { vs =>
      vs.isEmpty || {
        val dfl = flow("prop")
        dfl.createDataset("t", Map("v" -> vs))
        dfl.dedupe("t")
        val once = dfl.get("t").count()
        dfl.dedupe("t")
        dfl.get("t").count() == once && once == vs.distinct.size
      }
    })
  }

  test("property: saltedJoin equals the plain join for any salt factor") {
    import spark.implicits._
    check(Prop.forAll(
      Gen.listOfN(25, Gen.zip(Gen.oneOf("a", "b", "c"), Gen.choose(0, 9))),
      Gen.listOfN(6, Gen.zip(Gen.oneOf("a", "b", "d"), Gen.choose(0, 9))),
      Gen.choose(2, 6),
      Gen.oneOf("inner", "left")) { (pl, bl, saltFactor, how) =>
      pl.isEmpty || bl.isEmpty || {
        val probe = pl.toDF("k", "v")
        val build = bl.toDF("k", "w")
        def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
          .map(r => (r.getString(0), r.getInt(1), Option(r.get(2))))
          .sortBy(t => (t._1, t._2, t._3.map(_.toString).getOrElse("")))
          .toSeq
        canon(graft.operators.SkewJoin.saltedJoin(
          probe, build, Seq("k"), how, saltFactor)) ==
          canon(probe.join(build, Seq("k"), how))
      }
    })
  }

  test("property: adaptiveSaltedJoin equals the plain join on skewed " +
      "and uniform keys") {
    import spark.implicits._
    // skewed generator: ~70% of probe keys are 'hot' — crosses the 0.2
    // share threshold; uniform generator spreads over 10 keys
    val hotKeys = Gen.listOfN(40, Gen.frequency(
      7 -> Gen.const("hot"), 3 -> Gen.oneOf("a", "b", "c")))
    val coldKeys = Gen.listOfN(40,
      Gen.oneOf((0 until 10).map(i => s"k$i")))
    check(Prop.forAll(
      Gen.oneOf(hotKeys, coldKeys).flatMap(g => g),
      Gen.listOfN(6, Gen.zip(Gen.oneOf("hot", "a", "k1", "k2"),
        Gen.choose(0, 9))),
      Gen.oneOf("inner", "left")) { (pks, bl, how) =>
      bl.isEmpty || {
        val probe = pks.zipWithIndex.map { case (k, i) => (k, i) }
          .toDF("k", "v")
        val build = bl.toDF("k", "w")
        def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
          .map(r => (r.getString(0), r.getInt(1), Option(r.get(2))))
          .sortBy(t => (t._1, t._2, t._3.map(_.toString).getOrElse("")))
          .toSeq
        canon(graft.operators.SkewJoin.adaptiveSaltedJoin(
          probe, build, Seq("k"), how, saltFactor = 4,
          sampleFraction = 1.0)) ==
          canon(probe.join(build, Seq("k"), how))
      }
    })
  }

  test("adaptiveSaltedJoin salts only under real skew") {
    import spark.implicits._
    import graft.operators.SkewJoin
    def planOf(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.analyzed.toString
    // 200 rows, one key holding 60% → salted plan (salt col present)
    val hot = (0 until 200)
      .map(i => (if (i % 10 < 6) "hot" else s"k${i % 10}", i))
      .toDF("k", "v")
    val build = Seq(("hot", 1), ("k7", 2)).toDF("k", "w")
    val salted = SkewJoin.adaptiveSaltedJoin(hot, build, Seq("k"),
      saltFactor = 4, sampleFraction = 1.0)
    assert(planOf(salted).contains("__salt"),
      "skewed probe must take the salted branch")
    // 200 uniform rows → plain join, no salt, no build replication
    val uniform = (0 until 200).map(i => (s"k${i % 10}", i)).toDF("k", "v")
    val plain = SkewJoin.adaptiveSaltedJoin(uniform, build, Seq("k"),
      saltFactor = 4, sampleFraction = 1.0)
    assert(!planOf(plain).contains("__salt"),
      "uniform probe must take the plain branch")
    // tiny probes never salt, however skewed
    val tiny = Seq(("hot", 1), ("hot", 2), ("hot", 3)).toDF("k", "v")
    assert(!planOf(SkewJoin.adaptiveSaltedJoin(tiny, build, Seq("k"),
      saltFactor = 4, sampleFraction = 1.0)).contains("__salt"))
  }

  test("property: Scd2Load equals a naive per-member history replay") {
    import graft.catalog.Layer
    import graft.warehouse.{DimensionSpec, Scd2Load}
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // model of one version row; dates are day numbers
    case class V(sk: Long, attr: String, from: Int, to: Option[Int],
      current: Boolean)
    def naiveApply(state: Map[String, List[V]],
        snap: Map[String, String], day: Int): Map[String, List[V]] = {
      val maxSk = state.values.flatten.map(_.sk).maxOption.getOrElse(0L)
      val currentOf = state.view.mapValues(_.find(_.current)).toMap
      def cur(nk: String) = currentOf.getOrElse(nk, None)
      val openedNks = snap.keys.filter(nk =>
        cur(nk).forall(_.attr != snap(nk))).toSeq.sorted
      val skOf = openedNks.zipWithIndex
        .map { case (nk, i) => nk -> (maxSk + i + 1) }.toMap
      val allNks = state.keySet ++ snap.keySet
      allNks.map { nk =>
        val closedOrKept = state.getOrElse(nk, Nil).map { v =>
          // a current version closes if its member changed or vanished
          if (v.current &&
              (!snap.contains(nk) || snap(nk) != v.attr))
            v.copy(to = Some(day), current = false)
          else v
        }
        val opened =
          if (skOf.contains(nk))
            List(V(skOf(nk), snap(nk), day, None, current = true))
          else Nil
        nk -> (closedOrKept ++ opened)
      }.toMap
    }
    def naiveInit(snap: Map[String, String]): Map[String, List[V]] =
      snap.keys.toSeq.sorted.zipWithIndex.map { case (nk, i) =>
        nk -> List(V(i + 1L, snap(nk), 1, None, current = true))
      }.toMap
    def dateOf(day: Int) = f"2024-01-$day%02d 00:00:00"
    val snapGen = Gen.mapOf(Gen.zip(
      Gen.oneOf("A", "B", "C", "D"), Gen.oneOf("x", "y", "z")))
    val seqGen = Gen.choose(2, 4).flatMap(n =>
      Gen.listOfN(n, snapGen)).suchThat(_.headOption.exists(_.nonEmpty))
    val prop = Prop.forAll(seqGen) { snaps =>
      implicit val c: GraftConf = tmpConf()
      val spec = DimensionSpec("dm_m", Seq("nk"), Seq("attr"))
      def writeLod(snap: Map[String, String]): Unit =
        snap.toSeq.toDF("nk", "attr").write.mode("overwrite")
          .parquet(c.tablePath(Layer.LOD, "dm_m"))
      writeLod(snaps.head)
      Scd2Load.load(spark, c, spec, dateOf(1), initial = true)
      var model = naiveInit(snaps.head)
      snaps.tail.zipWithIndex.foreach { case (snap, i) =>
        writeLod(snap)
        Scd2Load.load(spark, c, spec, dateOf(i + 2))
        model = naiveApply(model, snap, i + 2)
      }
      val got = spark.read.parquet(c.tablePath(Layer.BSE, "dm_m"))
        .select(col("nk"), col("sk_m"), col("attr"),
          org.apache.spark.sql.functions
            .dayofmonth(col(Scd2Load.ValidFrom)).as("from_d"),
          org.apache.spark.sql.functions
            .dayofmonth(col(Scd2Load.ValidTo)).as("to_d"),
          col(Scd2Load.IsCurrent))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2),
          r.getInt(3), if (r.isNullAt(4)) None else Some(r.getInt(4)),
          r.getBoolean(5)))
        .sortBy(t => (t._1, t._2))
      val want = model.toSeq.flatMap { case (nk, vs) =>
        vs.map(v => (nk, v.sk, v.attr, v.from, v.to, v.current))
      }.sortBy(t => (t._1, t._2))
      if (got.toSeq != want) {
        println(s"snaps=$snaps\ngot =${got.toSeq}\nwant=$want")
      }
      got.toSeq == want
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: asofJoin matches the naive latest-at-or-before scan") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rows = Gen.listOfN(25, Gen.zip(Gen.choose(1L, 4L), Gen.choose(0L, 20L)))
    check(Prop.forAll(rows, rows, Gen.oneOf(true, false)) {
      (ls, rs0, inclusive) =>
        ls.isEmpty || rs0.isEmpty || {
          // right side unique per (key, ts): as-of target must be
          val rs = rs0.distinct
          val left = ls.zipWithIndex
            .map { case ((k, t), i) => (k, t, i.toLong) }
            .toDF("k", "t", "lid")
          val right = rs.zipWithIndex
            .map { case ((k, t), i) => (k, t, i.toLong) }
            .toDF("k", "t", "rid0")
            .select(col("k"), col("t"), col("rid0").as("rid"))
          val got = graft.operators.TemporalJoins
            .asofJoin(left, right, Seq("k"), "t", "t", Seq("rid"),
              inclusive = inclusive)
            .select("lid", "rid").collect()
            .map(r => r.getLong(0) ->
              (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
          val want = ls.zipWithIndex.map { case ((k, t), i) =>
            val cands = rs.zipWithIndex.filter { case ((rk, rt), _) =>
              rk == k && (if (inclusive) rt <= t else rt < t)
            }
            i.toLong -> (if (cands.isEmpty) -1L
              else cands.maxBy { case ((_, rt), ri) => (rt, ri) }
                match { case ((rk2, rt2), _) =>
                  // latest ts; among equal ts the single unique row
                  cands.filter(_._1._2 == rt2).map(_._2.toLong).max
                })
          }.toMap
          got == want
        }
    })
  }

  test("property: rangeJoin equals the naive inequality join at any bin width") {
    import spark.implicits._
    val pts = Gen.listOfN(20, Gen.zip(Gen.choose(1L, 3L), Gen.choose(0L, 50L)))
    val rng = Gen.listOfN(10, Gen.zip(Gen.choose(1L, 3L),
      Gen.zip(Gen.choose(0L, 50L), Gen.choose(1L, 25L))))
    check(Prop.forAll(pts, rng, Gen.choose(1L, 40L)) { (ps, rg, w) =>
      ps.isEmpty || rg.isEmpty || {
        val points = ps.zipWithIndex
          .map { case ((k, t), i) => (k, t, i.toLong) }.toDF("k", "t", "pid")
        val ranges = rg.zipWithIndex
          .map { case ((k, (s0, len)), i) => (k, s0, s0 + len, i.toLong) }
          .toDF("k", "s", "e", "rid")
        val got = graft.operators.TemporalJoins
          .rangeJoin(points, ranges, Seq("k"), "t", "s", "e", w)
          .select("pid", "rid").as[(Long, Long)].collect().sorted.toSeq
        val want = (for {
          ((pk, pt), pi) <- ps.zipWithIndex
          ((rk, (s0, len)), ri) <- rg.zipWithIndex
          if pk == rk && pt >= s0 && pt < s0 + len
        } yield (pi.toLong, ri.toLong)).sorted
        got == want
      }
    })
  }

  test("property: connectedComponents matches driver-side union-find") {
    import spark.implicits._
    // keep Spark rounds cheap: few checks, larger random graphs
    val edges = Gen.listOfN(18,
      Gen.zip(Gen.choose(0L, 14L), Gen.choose(0L, 14L)))
    val prop = Prop.forAll(edges) { es0 =>
      val es = es0.filter { case (a, b) => a != b }
      es.isEmpty || {
        val got = graft.dedup.Dedup
          .connectedComponents(es.toDF("doc_a", "doc_b"), "doc_a", "doc_b")
          .as[(Long, Long)].collect().sorted.toSeq
        // reference: classic union-find with min-id canonicalisation
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        es.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val want = parent.keys.toSeq.map(x => (x, find(x))).sorted
        got == want
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: Outliers.flag equals the naive rational z-test") {
    import spark.implicits._
    val vals = Gen.listOfN(25, Gen.choose(-50L, 50L))
    val prop = Prop.forAll(vals) { vs =>
      vs.isEmpty || {
        val df = vs.zipWithIndex.map { case (v, i) => ("g", i.toLong, v) }
          .toDF("g", "id", "v")
        val got = graft.operators.Outliers.flag(df, Seq("g"), "v", z = 2)
          .select("id").as[Long].collect().toSet
        // naive with exact rational arithmetic via BigInt
        val n = BigInt(vs.size)
        val s = vs.map(BigInt(_)).sum
        val ssq = vs.map(v => BigInt(v) * v).sum
        val want = vs.zipWithIndex.collect {
          case (v, i) if {
            val d = n * v - s
            d * d > 4 * (n * ssq - s * s)
          } => i.toLong
        }.toSet
        got == want
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: SeqPack conserves tokens and fills every sequence") {
    import spark.implicits._
    val sizes = Gen.listOfN(20, Gen.choose(0L, 40L))
    val prop = Prop.forAll(sizes, Gen.choose(8L, 64L)) { (ns, seqLen) =>
      ns.forall(_ <= 0) || {
        val df = ns.zipWithIndex.map { case (n, i) => (i.toLong, n) }
          .toDF("doc_id", "nt")
        val out = graft.text.SeqPack.pack(df, "doc_id", "nt", seqLen)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3)))
        val total = ns.filter(_ > 0).sum
        val perDoc = out.groupBy(_._2).view.mapValues(_.map(_._4).sum)
        val perSeq = out.groupBy(_._1).view.mapValues(_.map(_._4).sum)
          .toSeq.sortBy(_._1)
        ns.zipWithIndex.filter(_._1 > 0).forall { case (n, i) =>
          perDoc.getOrElse(i.toLong, 0L) == n } &&
          perSeq.map(_._2).sum == total &&
          perSeq.init.forall(_._2 == seqLen) &&
          (perSeq.isEmpty || perSeq.last._2 <= seqLen) &&
          perSeq.map(_._1) == (0L until perSeq.size.toLong)
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: Transitions.matrix equals the naive sequential count") {
    import spark.implicits._
    val events = Gen.listOfN(40,
      Gen.zip(Gen.choose(0L, 4L), Gen.choose(0L, 30L), Gen.choose(0, 3)))
    val prop = Prop.forAll(events) { evs0 =>
      // unique (user, t) so the window order is total
      val evs = evs0.groupBy(e => (e._1, e._2)).values.map(_.head).toSeq
      evs.size < 2 || {
        val df = evs.map { case (u, t, s) => (u, t, "s" + s) }
          .toDF("u", "t", "s")
        val got = graft.operators.Transitions
          .matrix(df, "u", "s", Seq("t"))
          .collect()
          .map(r => ((r.getString(0), r.getString(1)),
            (r.getLong(2), r.getDouble(3)))).toMap
        val pairs = evs.groupBy(_._1).values.flatMap { es =>
          es.sortBy(_._2).map(e => "s" + e._3).sliding(2)
            .collect { case Seq(a, b) => (a, b) }
        }.toSeq
        val counts = pairs.groupBy(identity).view.mapValues(_.size.toLong)
        val margins = counts.toSeq.groupBy(_._1._1).view
          .mapValues(_.map(_._2).sum)
        counts.forall { case (k, n) =>
          got.get(k).exists { case (gn, gp) =>
            gn == n && gp == n.toDouble / margins(k._1).toDouble }
        } && got.size == counts.size
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: editDistancePairs matches brute-force levenshtein") {
    import spark.implicits._
    // short strings over a tiny alphabet maximise near-collisions
    val strs = Gen.listOfN(12,
      Gen.choose(0, 4).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf('a', 'b')).map(_.mkString)))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val prop = Prop.forAll(strs) { ss =>
      ss.isEmpty || {
        val df = ss.zipWithIndex.map { case (s, i) => (i.toLong, s) }
          .toDF("id", "s")
        val got = graft.operators.FuzzyJoin.editDistancePairs(df, "id", "s")
          .as[(Long, Long, Long)].collect().sorted.toSeq
        val want = (for {
          i <- ss.indices; j <- (i + 1) until ss.size
          if lev(ss(i), ss(j)) <= 1
        } yield (i.toLong, j.toLong, lev(ss(i), ss(j)).toLong)).sorted
        got == want
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: hammingPairs banding equals brute force on random hashes") {
    import spark.implicits._
    // hash clouds around a few centers maximise near-pairs: each hash is
    // a center XOR 0-6 random bit flips, so distances straddle the
    // banding's recall guarantee boundary (<= 3) in both directions
    val hashes = for {
      centers <- Gen.listOfN(3, Gen.choose(0L, (1L << 60) - 1))
      picks <- Gen.listOfN(16, for {
        c <- Gen.oneOf(centers)
        nFlips <- Gen.choose(0, 6)
        bits <- Gen.listOfN(nFlips, Gen.choose(0, 59))
      } yield bits.foldLeft(c)((h, b) => h ^ (1L << b)))
    } yield picks
    val prop = Prop.forAll(hashes) { hs =>
      val df = hs.zipWithIndex.map { case (h, i) => (i.toLong, h) }
        .toDF("doc", "h")
      val got = graft.dedup.Dedup.hammingPairs(df, "doc", "h")
        .as[(Long, Long, Int)].collect().sorted.toSeq
      val want = (for {
        i <- hs.indices; j <- (i + 1) until hs.size
        d = java.lang.Long.bitCount(hs(i) ^ hs(j))
        if d <= 3
      } yield (i.toLong, j.toLong, d)).sorted
      got == want
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }
}
