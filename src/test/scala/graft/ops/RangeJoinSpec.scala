package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def points = Seq((1L, 5L), (2L, 10L), (3L, 19L), (4L, 20L), (5L, 100L))
    .toDF("pid", "t")
  private def intervals = Seq((10L, 10L, 20L), (11L, 0L, 6L), (12L, 18L, 40L))
    .toDF("iid", "s", "e")

  test("matches the naive BETWEEN join exactly (half-open), no duplicates") {
    for (w <- Seq(1L, 3L, 10L, 1000L)) { // bucket width must not change results
      val got = RangeJoin.pointInInterval(points, intervals, "t", "s", "e", w)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      val naive = points.crossJoin(intervals)
        .where($"t" >= $"s" && $"t" < $"e")
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(got.toSeq === naive.toSeq, s"width $w")
      assert(got.length === got.distinct.length)
    }
    // pin the expected pairs once: 5∈[0,6), 10∈[10,20), 19∈[10,20)+[18,40),
    // 20∉[10,20) (half-open) but ∈[18,40)
    val expect = Seq((1L, 11L), (2L, 10L), (3L, 10L), (3L, 12L), (4L, 12L))
    val got = RangeJoin.pointInInterval(points, intervals, "t", "s", "e", 8L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.toSeq === expect)
  }

  test("plans as a hash join on the manufactured bucket — no nested loop") {
    val p = RangeJoin.pointInInterval(points, intervals, "t", "s", "e", 8L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(500))
    assert(p.contains("_rj_bucket"), p.take(500))
  }

  test("negative times bucket correctly (floor, not truncate-toward-zero)") {
    val pts = Seq((1L, -5L), (2L, -16L)).toDF("pid", "t")
    val ivs = Seq((10L, -20L, -10L), (11L, -8L, 2L)).toDF("iid", "s", "e")
    val got = RangeJoin.pointInInterval(pts, ivs, "t", "s", "e", 8L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.toSeq === Seq((1L, 11L), (2L, 10L)))
  }

  test("interval overlap ≡ naive overlap join for every bucket width, no duplicates") {
    val lhs = Seq((1L, 0L, 10L), (2L, 5L, 25L), (3L, 30L, 31L), (4L, -7L, 3L))
      .toDF("lid", "ls", "le")
    val rhs = Seq((10L, 8L, 12L), (11L, 24L, 40L), (12L, -100L, 100L))
      .toDF("rid", "rs", "re")
    val naive = lhs.crossJoin(rhs)
      .where($"ls" < $"re" && $"rs" < $"le")
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    for (w <- Seq(1L, 4L, 16L, 1000L)) {
      val got = RangeJoin.intervalOverlap(lhs, rhs, "ls", "le", "rs", "re", w)
        .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(got.toSeq === naive.toSeq, s"width $w")
      assert(got.length === got.distinct.length, s"width $w produced duplicates")
    }
    // adjacency is NOT overlap under half-open semantics: [0,10) ∩ [10,20) = ∅
    val adj = RangeJoin.intervalOverlap(
      Seq((1L, 0L, 10L)).toDF("lid", "ls", "le"),
      Seq((2L, 10L, 20L)).toDF("rid", "rs", "re"), "ls", "le", "rs", "re", 4L)
    assert(adj.count() === 0)
  }

  test("interval overlap plans as a hash join — no nested loop") {
    val lhs = Seq((1L, 0L, 10L)).toDF("lid", "ls", "le")
    val rhs = Seq((10L, 8L, 12L)).toDF("rid", "rs", "re")
    val p = RangeJoin.intervalOverlap(lhs, rhs, "ls", "le", "rs", "re", 8L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(500))
  }

  test("non-positive bucket widths are rejected on both join variants") {
    val lhs = Seq((1L, 0L, 10L)).toDF("lid", "ls", "le")
    val rhs = Seq((10L, 8L, 12L)).toDF("rid", "rs", "re")
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, intervals, "t", "s", "e", 0L)
    }
    intercept[IllegalArgumentException] {
      RangeJoin.intervalOverlap(lhs, rhs, "ls", "le", "rs", "re", -5L)
    }
  }

  test("empty intervals (end <= start) match nothing on either variant") {
    // [t, t) strictly inside a covering interval: the bare ls<re && rs<le
    // predicate would pair it; the degenerate-row guard must not.
    val lhs = Seq((1L, 5L, 5L), (2L, 9L, 3L), (3L, 0L, 10L)).toDF("lid", "ls", "le")
    val rhs = Seq((10L, -100L, 100L), (11L, 7L, 7L)).toDF("rid", "rs", "re")
    val got = RangeJoin.intervalOverlap(lhs, rhs, "ls", "le", "rs", "re", 4L)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.toSeq === Seq((3L, 10L))) // only the nonempty × nonempty pair
    val pts = Seq((1L, 5L)).toDF("pid", "t")
    val ivs = Seq((10L, 5L, 5L), (11L, 8L, 2L)).toDF("iid", "s", "e")
    assert(RangeJoin.pointInInterval(pts, ivs, "t", "s", "e", 4L).count() === 0)
  }

  test("nanosecond-epoch keys past 2^53 bucket exactly (no double rounding)") {
    // 2024 epoch-nanos ≈ 1.7e18 ≫ 2^53: a double-division bucket would
    // misround near edges and silently miss matches
    val base = 1704067200000000000L // 2024-01-01 in ns
    val pts = Seq((1L, base + 999L), (2L, base + 1000L)).toDF("pid", "t")
    val ivs = Seq((10L, base, base + 1000L), (11L, base + 1000L, base + 2000L))
      .toDF("iid", "s", "e")
    val got = RangeJoin.pointInInterval(pts, ivs, "t", "s", "e", 1000L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.toSeq === Seq((1L, 10L), (2L, 11L)))
  }
}
