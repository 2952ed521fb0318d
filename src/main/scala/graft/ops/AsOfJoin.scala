package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for every left row, attach the single LATEST right
  * row with the same key whose time is at-or-before the left row's time
  * (optionally within a tolerance). The classic "state at event time"
  * operator — attribute a purchase to the last click, price a trade with
  * the last quote.
  *
  * Spark-first plan: a naive formulation (`left JOIN right ON key AND
  * rt <= lt`, then arg-max per left row) explodes to |L_k|·|R_k| rows per
  * key before the reduction — quadratic in the hot keys, the exact shape
  * that dies at 100 TB. This implementation instead UNIONS the two sides,
  * shuffles ONCE on the key, sorts each partition by (time, side,
  * tie-break), and sweeps with a running `last(_, ignoreNulls)` window —
  * O(|L_k|+|R_k|) per key, the same cost envelope as a sort-merge join,
  * with no join blow-up and no range-condition BroadcastNestedLoop.
  * Matching right rows that tie on time resolve deterministically to the
  * greatest `rightTieBreak` value.
  *
  * Column pruning is the caller's lever: every right column you keep rides
  * the one shuffle. Project both sides down before calling.
  */
object AsOfJoin {

  /** @param keys          equality key columns (present on both sides)
    * @param leftTime      left event-time column (orderable; use exact µs
    *                      longs, not floats)
    * @param rightTime     right event-time column; must be a DIFFERENT name
    *                      from every left column
    * @param rightTieBreak right column breaking equal-time ties (greatest
    *                      value wins); must not collide with left columns
    * @param toleranceUs   max allowed leftTime − rightTime; matches farther
    *                      in the past resolve to null (same units as the
    *                      time columns)
    * @return left.* plus right's non-key columns (null where no match)
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightTieBreak: String,
      toleranceUs: Option[Long] = None): DataFrame = {
    val rightPayload = right.columns.filterNot(keys.contains).toSeq
    val leftCols = left.columns.toSeq
    require(rightPayload.intersect(leftCols).isEmpty,
      s"right payload columns ${rightPayload.mkString(",")} must not collide " +
        s"with left columns — rename before joining")
    require(rightPayload.contains(rightTime) && rightPayload.contains(rightTieBreak),
      "rightTime/rightTieBreak must be non-key right columns")

    val leftOnly = leftCols.filterNot(keys.contains)
    val lsel = left.select(
      keys.map(col) ++
        Seq(col(leftTime).as("_asof_t"), lit(1).as("_asof_side")) ++
        leftOnly.map(col) ++
        rightPayload.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val rsel = right.select(
      keys.map(col) ++
        Seq(col(rightTime).as("_asof_t"), lit(0).as("_asof_side")) ++
        leftOnly.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightPayload.map(col): _*)

    // right rows sort BEFORE left rows at equal time (side 0 < 1), so an
    // exactly-simultaneous right row is visible to the left row (rt <= lt);
    // among equal-time right rows the greatest tie-break sorts last and wins.
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("_asof_t").asc, col("_asof_side").asc, col(rightTieBreak).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // sweep ONE struct per right row (not per-column lasts, which would mix
    // fields from different right rows when a payload column is null)
    val swept = lsel.unionByName(rsel)
      .withColumn("_asof_p",
        when(col("_asof_side") === 0, struct(rightPayload.map(col): _*)))
      .withColumn("_asof_m", last(col("_asof_p"), ignoreNulls = true).over(w))

    val matched = swept
      .where(col("_asof_side") === 1)
      .select(leftCols.map(col) ++
        rightPayload.map(c => col("_asof_m").getField(c).as(c)): _*)

    toleranceUs match {
      case None => matched
      case Some(tol) =>
        val ok = col(rightTime).isNotNull &&
          col(leftTime).cast("long") - col(rightTime).cast("long") <= tol
        matched.select(leftCols.map(col) ++
          rightPayload.map(c => when(ok, col(c)).otherwise(lit(null)).as(c)): _*)
    }
  }
}
