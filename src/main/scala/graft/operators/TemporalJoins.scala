package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark's built-ins don't express directly:
  * as-of joins (latest right row at-or-before each left row's time) and
  * interval/range joins (points against time ranges). Extension category
  * beyond the reference surface (its join verb is pandas `merge` on equal
  * keys only, betl/dataflow/dfl_alterNew.py `join`); these are the two
  * temporal shapes every event/feature pipeline needs.
  *
  * Scale stance: neither operator uses a broadcast-nested-loop or
  * cartesian plan. The as-of join is ONE hash shuffle on the equi-keys +
  * one per-partition sort (the union trick); the range join turns the
  * inequality predicate into an equi-join on (key, time bin) so Spark
  * shards it like any other hash join. Both survive 1000-executor inputs
  * because work is keyed by (join key [, bin]), never all-pairs.
  */
object TemporalJoins {

  /** As-of join: for each left row, attach the payload of the LATEST
    * right row with the same `on` keys and `rightTs <= leftTs`
    * (`inclusive = false` for strictly-before). Left rows with no prior
    * right row keep null payloads (left-outer semantics).
    *
    * Implementation is the classic union trick — tag both sides, union,
    * and take `last(payload, ignoreNulls)` over a window ordered by
    * (time, side): a SINGLE shuffle on the equi-keys and one sort,
    * streaming through each key group. No join node at all, so there is
    * nothing to degenerate into a nested-loop at scale; heavily-skewed
    * keys cost one sorted pass, not a quadratic probe.
    *
    * The right side must be unique per (`on`, `rightTs`) — pre-aggregate
    * it otherwise, or "latest" is ambiguous.
    *
    * @param rightCols right columns to attach; must not clash with left
    *                  column names (alias on the right side first)
    */
  def asofJoin(
      left: DataFrame, right: DataFrame, on: Seq[String],
      leftTs: String, rightTs: String, rightCols: Seq[String],
      inclusive: Boolean = true): DataFrame = {
    val leftCols = left.columns.toSeq
    require(rightCols.intersect(leftCols).isEmpty,
      s"alias right columns first: ${rightCols.intersect(leftCols)}")
    val payloadT = org.apache.spark.sql.types.StructType(
      rightCols.map(c => right.schema(c)))
    val l2 = left.select(
      leftCols.map(col) ++ Seq(
        col(leftTs).as("__ts"), lit(0).as("__side"),
        lit(null).cast(payloadT).as("__p")): _*)
    // SQL join semantics: a NULL equi-key matches nothing. The window
    // trick would otherwise group null keys TOGETHER (partitionBy treats
    // null as a value), silently attaching payloads a real join (or a
    // DuckDB ASOF JOIN oracle) would not. Dropping null-keyed right rows
    // restores parity: null-keyed left rows share a partition containing
    // only left rows, so their payload stays null.
    val r2 = right
      .where(on.map(col(_).isNotNull).reduce(_ && _))
      .select(
      on.map(col) ++
        leftCols.filterNot(on.contains).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) ++ Seq(
        col(rightTs).as("__ts"), lit(1).as("__side"),
        struct(rightCols.map(col): _*).as("__p")): _*)
    // at equal ts: inclusive → right sorts first (visible to the left
    // row's frame); strict → right sorts after (not visible)
    val sideOrd = if (inclusive) col("__side").desc else col("__side").asc
    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col("__ts").asc, sideOrd)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l2.unionByName(r2)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__side") === 0)
      .select(leftCols.map(col) ++
        rightCols.map(c => col("__m").getField(c).as(c)): _*)
  }

  /** Range (interval) join: all (point, range) pairs with equal `on` keys
    * and `startCol <= tsCol < endCol`. Times are integral (e.g. epoch
    * micros) so binning stays in exact 64-bit arithmetic.
    *
    * The inequality is turned into an equi-join on (keys, bin): each
    * range explodes to the bins it overlaps, each point lands in exactly
    * ONE bin, and the exact containment filter runs on bin-collided
    * candidates only. Because a point has one bin, every qualifying pair
    * surfaces exactly once — no dedup shuffle needed. Pick `binWidth`
    * near the typical range length: fanout stays O(1) per range while
    * the join shards by (key, bin) across executors.
    */
  def rangeJoin(
      points: DataFrame, ranges: DataFrame, on: Seq[String],
      tsCol: String, startCol: String, endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("__bin", binOf(tsCol, binWidth))
    val r = ranges.withColumn("__bin", explode(sequence(
      binOf(startCol, binWidth), binOf(endCol, binWidth))))
    p.join(r, on :+ "__bin")
      .where(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bin")
  }

  /** Integral floor-division bin (`x div w` — never a double detour:
    * epoch-nano/micro magnitudes exceed 2^53).
    */
  private def binOf(c: String, w: Long): Column =
    expr(s"`$c` div ${w}L")
}
