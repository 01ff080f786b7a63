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
}
