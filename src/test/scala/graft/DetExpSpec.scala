package graft

import graft.functions.DetExp
import org.scalatest.funsuite.AnyFunSuite

/** The deterministic fixed-point exp kernel (functions/DetExp.scala):
  * exactness conventions, inversion, monotonicity, and closeness to
  * libm exp (the kernel DEFINES the engine's exp — libm is the sanity
  * reference, not the target).
  */
class DetExpSpec extends AnyFunSuite {

  test("exp(0) = 1, exp(1 nat) = EFp-quantized e") {
    assert(DetExp.expFp(0L) == DetExp.Scale)
    // one whole nat: the Taylor sum at r=0 is exactly 2^20, then one
    // EFp multiply: 2^20 · EFp / 2^20 = EFp
    assert(DetExp.expFp(DetExp.Scale) == DetExp.EFp)
  }

  test("tracks libm exp within the stage-wise quantization error") {
    for (x <- Seq(0.001, 0.1, 0.5, 0.9999, 1.5, 2.0, 3.7, 7.0, 14.9)) {
      val xFp = math.floor(x * DetExp.Scale).toLong
      val got = DetExp.expFp(xFp).toDouble / DetExp.Scale
      val want = math.exp(xFp.toDouble / DetExp.Scale)
      val rel = math.abs(got - want) / want
      // one floor per Taylor term + one per nat: relative error stays
      // well under 1e-4 across the domain
      assert(rel < 1e-4, s"x=$x got=$got want=$want rel=$rel")
    }
  }

  test("negative inputs invert: expFp(-x) = 2^40 div expFp(x)") {
    for (x <- Seq(1L, 1000L, DetExp.Scale, 3L * DetExp.Scale)) {
      assert(DetExp.expFp(-x) == (1L << 40) / DetExp.expFp(x))
    }
  }

  test("strictly monotone on the fixed-point grid (sampled)") {
    val xs = (0L until (14L << 20) by 99991L).toVector
    val ys = xs.map(DetExp.expFp)
    assert(ys == ys.sorted)
    // distinct at nat granularity
    assert(ys.distinct.size > xs.size / 2)
  }

  test("domain bound is enforced") {
    intercept[IllegalArgumentException] {
      DetExp.expFp(DetExp.MaxAbsX)
    }
    // just inside is fine and fits Long
    assert(DetExp.expFp(DetExp.MaxAbsX - 1) > 0)
  }

  test("EG weights: higher excess upweights relative to token share") {
    // three domains, equal token counts, excess 0 / 1 / 2 nats
    val n = 1000L
    val doms = Seq(0L, DetExp.Scale, 2 * DetExp.Scale)
      .map(x => (n, DetExp.expFp(x)))
    val tot = doms.map(d => BigInt(d._1) * d._2).sum
    val ws = doms.map(d => (BigInt(d._1) * d._2).toDouble / tot.toDouble)
    assert(math.abs(ws.sum - 1.0) < 1e-12)
    assert(ws(0) < ws(1) && ws(1) < ws(2))
    // ratio ≈ e per nat of excess
    assert(math.abs(ws(1) / ws(0) - math.E) < 1e-3)
  }
}
