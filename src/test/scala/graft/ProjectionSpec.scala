package graft

import graft.similarity.VectorFunctions
import org.apache.spark.sql.functions._

/** Pins the JL projection: the Column rendering equals a plain-Scala
  * strict left fold over the same 3-decimal plane literals, and the
  * projection preserves exact duplicates.
  */
class ProjectionSpec extends SparkSpec {
  import spark.implicits._

  private def vec(i: Long): Seq[Float] =
    (0 until VectorFunctions.Dim).map(d =>
      (((i * 37 + d * 11) % 19).toInt - 9) / 10.0f)

  test("project equals the strict-left-fold replay over plane literals") {
    val df = (0L until 8L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    val got = df.select(col("vec_id"),
      VectorFunctions.project(col("embedding")).as("pv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toMap
    (0L until 8L).foreach { i =>
      val v = vec(i)
      val expect = (0 until VectorFunctions.NumPlanes).map { p =>
        val plane = VectorFunctions.planeSqlLiterals(p)
          .map(_.toDouble)
        var acc = 0.0
        var d = 0
        while (d < VectorFunctions.Dim) {
          acc += v(d).toDouble * plane(d); d += 1
        }
        acc
      }
      assert(got(i) == expect, s"vec $i")
    }
  }

  test("duplicates project identically; distinct vectors do not collapse") {
    val df = Seq((0L, vec(3L)), (1L, vec(3L)), (2L, vec(4L)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"),
        VectorFunctions.project(col("embedding")).as("pv"))
    val rows = df.orderBy("vec_id").collect()
      .map(_.getSeq[Double](1).toSeq)
    assert(rows(0) == rows(1))
    assert(rows(0) != rows(2))
  }
}
