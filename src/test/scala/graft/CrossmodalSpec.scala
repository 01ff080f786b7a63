package graft

import graft.multimodal.Crossmodal
import org.apache.spark.sql.functions._

/** Cross-modal towers (multimodal/Crossmodal.scala): plane determinism
  * and grid discipline, projection linear-map semantics, and the text
  * tower's exact feature quartet.
  */
class CrossmodalSpec extends SparkSpec {
  import spark.implicits._

  test("modality plane families are distinct, deterministic, 3-decimal") {
    val t = Crossmodal.planeComponents(Crossmodal.TextSalt, 0,
      Crossmodal.TextFeatDim)
    val m = Crossmodal.planeComponents(Crossmodal.MediaSalt, 0,
      Crossmodal.MediaFeatDim)
    assert(t != m, "towers must not share planes")
    assert(t == Crossmodal.planeComponents(Crossmodal.TextSalt, 0,
      Crossmodal.TextFeatDim))
    (t ++ m).foreach { v =>
      assert(v >= -1.0 && v <= 1.0)
      assert(math.rint(v * 1000) / 1000.0 == v, s"off-grid component $v")
    }
    // SQL literals parse back to the identical doubles
    assert(Crossmodal.planeSqlLiterals(Crossmodal.TextSalt, 0,
      Crossmodal.TextFeatDim).map(_.toDouble) == t)
  }

  test("projection is the linear map: unit vector e_d selects the " +
      "planes' d-th components") {
    for (d <- 0 until Crossmodal.TextFeatDim) {
      val e = (0 until Crossmodal.TextFeatDim)
        .map(i => if (i == d) 1.0 else 0.0)
      val got = spark.range(1)
        .select(Crossmodal.projectText(
          array(e.map(lit): _*)).as("v"))
        .head.getSeq[Double](0)
      val want = (0 until Crossmodal.SharedDim).map(p =>
        Crossmodal.planeComponents(Crossmodal.TextSalt, p,
          Crossmodal.TextFeatDim)(d))
      assert(got == want, s"d=$d")
    }
  }

  test("textFeatures: exact char/token/e/vowel counts") {
    val got = spark.range(1)
      .select(Crossmodal.textFeatures(lit("The bee sees  me")).as("f"))
      .head.getSeq[Double](0)
    // 16 chars; 4 tokens (double space collapses under \s+); 6
    // lowercase 'e' (ThE=1, bEE=2, sEEs=2, mE=1); 6 vowels in the
    // lowercased string (the same six e's, no a/i/o/u)
    assert(got == Seq(16.0, 4.0, 6.0, 6.0), s"got $got")
  }
}
