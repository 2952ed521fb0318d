package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyless point-in-interval range join. Spark plans `p.t BETWEEN i.s AND
  * i.e` with no equality key as a BroadcastNestedLoopJoin — every point
  * against every interval, the shape that dies first at 100 TB. The
  * standard fix is to MANUFACTURE an equality key: quantize time into
  * buckets of `bucketWidth`, explode each interval onto every bucket it
  * overlaps, and hash-join points (which land in exactly ONE bucket) to
  * the exploded intervals, re-checking the precise range after the join.
  *
  * A point matches an interval in precisely the point's own bucket, so the
  * join emits no duplicates — no distinct needed. Cost: the interval side
  * replicates by ceil(span/bucketWidth)+1; pick bucketWidth near the
  * typical interval span so replication stays O(1) and buckets stay
  * skew-free (a width far below the span explodes replicas; far above it
  * degrades bucket selectivity toward the quadratic join).
  */
object RangeJoin {

  /** @param points    (pointTime, …) — each row joins intervals covering it
    * @param intervals (startCol, endCol, …) — half-open [start, end)
    * @return points ⋈ intervals rows (all columns of both sides); column
    *         names must not collide */
  /** Exact floor division for BIGINT times: `floor(x / w)` routes through
    * double division, which silently misrounds past 2^53 (nanosecond-epoch
    * keys are ~2^60) — a point and an interval edge could then land in
    * different buckets and MISS. pmod keeps everything in exact integer
    * arithmetic for any long. */
  private def floorDiv(x: Column, w: Long): Column =
    ((x - pmod(x, lit(w))).cast("decimal(38,0)") / lit(w)).cast("long")

  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointTime: String, startCol: String, endCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // Empty intervals (end <= start) contain no point; drop them before the
    // explode (sequence() would descend across their buckets otherwise —
    // the membership predicate below already rejects the pairs, this just
    // avoids manufacturing them).
    val ib = intervals.where(col(startCol) < col(endCol)).withColumn("_rj_bucket",
      explode(sequence(floorDiv(col(startCol), bucketWidth),
        floorDiv(col(endCol) - 1, bucketWidth))))
    val pb = points.withColumn("_rj_bucket",
      floorDiv(col(pointTime), bucketWidth))
    pb.join(ib, "_rj_bucket")
      .where(col(pointTime) >= col(startCol) && col(pointTime) < col(endCol))
      .drop("_rj_bucket")
  }

  /** Interval–interval OVERLAP join: pairs with [ls, le) ∩ [rs, re) ≠ ∅,
    * i.e. ls < re AND rs < le — both half-open. Both sides explode onto
    * their covered buckets and hash-join on the bucket; an overlapping
    * pair shares every bucket its overlap spans, so to stay
    * duplicate-free WITHOUT a distinct (which would shuffle the joined
    * payloads again) each pair is emitted only in its CANONICAL bucket:
    * the one containing max(ls, rs), the overlap's first instant. That
    * bucket is covered by both sides by construction, so exactly one
    * replica survives. */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      leftStart: String, leftEnd: String,
                      rightStart: String, rightEnd: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // Empty intervals (end <= start) overlap nothing by definition, but the
    // ls < re AND rs < le predicate is only a correct overlap test for
    // NONEMPTY intervals — an empty [t, t) would still pair with any
    // interval strictly containing t (and sequence() would DESCEND across
    // its buckets). Drop them before the explode.
    def exploded(df: DataFrame, s: String, e: String) =
      df.where(col(s) < col(e)).withColumn("_rj_bucket",
        explode(sequence(floorDiv(col(s), bucketWidth),
          floorDiv(col(e) - 1, bucketWidth))))
    exploded(left, leftStart, leftEnd)
      .join(exploded(right, rightStart, rightEnd), "_rj_bucket")
      .where(col(leftStart) < col(rightEnd) && col(rightStart) < col(leftEnd))
      .where(col("_rj_bucket") ===
        floorDiv(greatest(col(leftStart), col(rightStart)), bucketWidth))
      .drop("_rj_bucket")
  }
}
