package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual fallback when AQE's
  * skew-join split (which only rebalances sort-merge partitions after the
  * fact) is not enough, e.g. one hot key holding >> a partition's worth
  * of rows on the probe side.
  *
  * Mechanics: each probe-side row gets a deterministic-in-run salt in
  * `[0, saltFactor)`; the build side is exploded ×saltFactor so every
  * (key, salt) bucket finds its match. The join key becomes
  * (keys…, salt), so one hot key fans out across `saltFactor` shuffle
  * partitions instead of one. Result is EXACTLY the plain join: each
  * probe row matches precisely the one salted copy of its build row.
  *
  * Correct for `inner` and `left` joins (the build side is replicated, so
  * right/full-outer would emit unmatched build rows saltFactor times —
  * rejected). At 100 TB this is the standard recipe when the build side
  * is too big to broadcast but small enough to replicate saltFactor-fold
  * through the shuffle.
  */
object SkewJoin {

  def saltedJoin(
      probe: DataFrame,
      build: DataFrame,
      keys: Seq[String],
      how: String = "inner",
      saltFactor: Int = 8): DataFrame = {
    require(Seq("inner", "left", "left_outer").contains(how),
      s"saltedJoin supports inner/left joins only (got '$how'): " +
        "the replicated build side would duplicate outer rows")
    require(saltFactor > 1, "saltFactor must be > 1")
    val salt = "__salt"
    // row-varying, key-independent salt: spreads a hot key uniformly.
    // monotonically_increasing_id is deterministic within a run, which is
    // all a join key needs.
    val probeS = probe.withColumn(
      salt, pmod(monotonically_increasing_id(), lit(saltFactor.toLong))
        .cast("int"))
    val buildS = build.withColumn(
      salt, explode(array((0 until saltFactor).map(lit): _*)))
    probeS.join(buildS, keys :+ salt, how).drop(salt)
  }
}
