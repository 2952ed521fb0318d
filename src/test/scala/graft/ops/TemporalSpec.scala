package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  // (key, ts, tie, state) change log exercising: compression (k1 restates
  // A at t=20), real changes, an equal-time tie (k2 at t=10: tie 1 → B is
  // zero-width, tie 2 → C wins the instant), and a single-row key (k3)
  private def log = Seq(
    ("k1", 10L, 1L, "A"), ("k1", 20L, 2L, "A"), ("k1", 30L, 3L, "B"),
    ("k2", 10L, 1L, "B"), ("k2", 10L, 2L, "C"), ("k2", 40L, 3L, "B"),
    ("k3", 5L, 1L, "Z"))
    .toDF("k", "t", "tie", "state")

  private def build = Temporal.scd2(log, Seq("k"), "t", "tie", Seq("state"))

  test("versions, compression, tie handling, current flags") {
    val rows = build.orderBy("k", "version")
      .select("k", "state", "valid_from", "valid_to", "version", "is_current")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getInt(4), r.getBoolean(5)))
    assert(rows.toSeq === Seq(
      // k1: the t=20 restatement of A is compressed away, so A runs [10,30)
      ("k1", "A", 10L, 30L, 1, false),
      ("k1", "B", 30L, -1L, 2, true),
      // k2: B at (10, tie 1) is a zero-width [10,10) version — dropped;
      // C wins the instant and the renumbering is gapless
      ("k2", "C", 10L, 40L, 1, false),
      ("k2", "B", 40L, -1L, 2, true),
      ("k3", "Z", 5L, -1L, 1, true)))
  }

  test("intervals chain per key and exactly one is_current") {
    val d = build.cache()
    try {
      assert(d.groupBy("k").agg(sum(when($"is_current", 1).otherwise(0)).as("c"))
        .where($"c" =!= 1).isEmpty)
      // every non-current version's valid_to equals the next version's
      // valid_from: the timeline has no gaps and no overlaps
      val seams = d.selectExpr("k", "valid_to",
        "lead(valid_from) over (partition by k order by version) as next_from")
        .where($"valid_to".isNotNull)
      assert(seams.where($"valid_to" =!= $"next_from").isEmpty)
      assert(d.where($"valid_to".isNotNull && $"valid_from" >= $"valid_to").isEmpty)
    } finally d.unpersist()
  }

  test("null attribute value is a legal state, distinct from non-null") {
    val withNull = Seq(
      ("k", 1L, 1L, Some("A")), ("k", 2L, 2L, None),
      ("k", 3L, 3L, None), ("k", 4L, 4L, Some("A")))
      .toDF("k", "t", "tie", "state")
    val rows = Temporal.scd2(withNull, Seq("k"), "t", "tie", Seq("state"))
      .orderBy("version")
      .collect().map(r => (Option(r.getString(1)), r.getLong(2)))
    // A → null (t=3 restatement of null compressed) → A
    assert(rows.toSeq === Seq((Some("A"), 1L), (None, 2L), (Some("A"), 4L)))
  }

  test("rejects tieBreak == tsCol and reserved-name collisions; drops null change times") {
    intercept[IllegalArgumentException] {
      Temporal.scd2(log, Seq("k"), "t", tieBreak = "t", Seq("state"))
    }
    intercept[IllegalArgumentException] { // re-versioning an SCD2 output
      Temporal.scd2(log.withColumnRenamed("state", "is_current"),
        Seq("k"), "t", "tie", Seq("is_current"))
    }
    intercept[IllegalArgumentException] { // internal names are reserved too
      Temporal.scd2(log.withColumnRenamed("state", "_scd_next_ts"),
        Seq("k"), "t", "tie", Seq("_scd_next_ts"))
    }
    intercept[IllegalArgumentException] { // _scd_tie reserved by scd2Apply
      Temporal.scd2Apply(build,
        Seq(("k1", 99L, 50L, "Z")).toDF("k", "t", "_scd_tie", "state"),
        Seq("k"), "t", "_scd_tie", Seq("state"))
    }
    // a null change time must not swallow a NEIGHBORING version via the
    // three-valued zero-width filter — the null row itself is dropped
    val withNullTs = Seq((1L, "k", 1L, "A"), (2L, "k", 10L, "B"))
      .toDF("tie", "k", "t", "state")
      .union(Seq(("x", "k", "C")).toDF("tie2", "k2", "state2")
        .select(lit(3L).as("tie"), $"k2".as("k"),
          lit(null).cast("long").as("t"), $"state2".as("state")))
    val rows = Temporal.scd2(withNullTs, Seq("k"), "t", "tie", Seq("state"))
      .orderBy("version").select("state", "valid_from").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.toSeq === Seq(("A", 1L), ("B", 10L)))
  }

  test("all three windows ride ONE key Exchange") {
    val plan = build.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, plan.take(800))
  }

  test("output is maximally compressed and idempotent as a change log") {
    val dim = build
    assert(dim.selectExpr("k", "state",
      "lag(state) over (partition by k order by version) as prev")
      .where($"prev".isNotNull && $"state" === $"prev").isEmpty)
    // rebuild from the dimension's own rows — must reproduce it exactly
    val relog = dim.select($"k", $"valid_from".as("t"),
      $"version".cast("long").as("tie"), $"state")
    val rebuilt = Temporal.scd2(relog, Seq("k"), "t", "tie", Seq("state"))
    assert(rebuilt.exceptAll(dim).isEmpty && dim.exceptAll(rebuilt).isEmpty)
  }

  test("scd2Apply(scd2(A), B) ≡ scd2(A ∪ B) when B appends at-or-after A") {
    val a = log // ts ≤ 40
    // B: a restatement (compressed), real changes, a new key, and a
    // same-instant REPLACEMENT of k2's t=40 version (new knowledge wins)
    val b = Seq(
      ("k1", 50L, 10L, "B"), ("k1", 60L, 11L, "C"),
      ("k2", 40L, 12L, "D"), ("k4", 7L, 13L, "Q"))
      .toDF("k", "t", "tie", "state")
    val applied = Temporal.scd2Apply(Temporal.scd2(a, Seq("k"), "t", "tie",
        Seq("state")), b, Seq("k"), "t", "tie", Seq("state"))
    val rebuilt = Temporal.scd2(a.unionByName(b), Seq("k"), "t", "tie", Seq("state"))
    assert(applied.exceptAll(rebuilt).isEmpty && rebuilt.exceptAll(applied).isEmpty)
    // the replacement took: k2@40 is D (not the dimension's old B)
    val k2 = applied.where($"k" === "k2").orderBy("version")
      .select("state", "valid_from").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(k2.toSeq === Seq(("C", 10L), ("D", 40L)))
  }

  test("scd2Apply leaves untouched keys byte-identical and never reshuffles them") {
    val b = Seq(("k1", 99L, 50L, "Z")).toDF("k", "t", "tie", "state")
    val dim = build
    val applied = Temporal.scd2Apply(dim, b, Seq("k"), "t", "tie", Seq("state"))
    val untouched = applied.where($"k" =!= "k1")
    val orig = dim.where($"k" =!= "k1")
    assert(untouched.exceptAll(orig).isEmpty && orig.exceptAll(untouched).isEmpty)
    // scale shape: the touched-key routing joins are broadcasts — the
    // untouched branch must not hash-Exchange the dimension
    val plan = applied.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 2, plan.take(800))
  }

  test("point-in-time lookup via as-of join on valid_from sees the right version") {
    val facts = Seq((100L, "k1", 15L), (101L, "k1", 30L), (102L, "k2", 10L),
      (103L, "k2", 9L), (104L, "k3", 999L))
      .toDF("fact_id", "k", "ft")
    val dim = build.select($"k", $"valid_from".as("dim_t"),
      $"version".as("dim_version"), $"state".as("dim_state"))
    val got = AsOfJoin.backward(facts, dim, Seq("k"),
        leftTime = "ft", rightTime = "dim_t", rightTieBreak = "dim_version")
      .orderBy("fact_id")
      .collect().map(r => (r.getLong(0), Option(r.getAs[String]("dim_state"))))
    assert(got.toSeq === Seq(
      (100L, Some("A")),  // 15 ∈ [10,30)
      (101L, Some("B")),  // boundary: 30 sees the NEW version
      (102L, Some("C")),  // the tie winner, not the zero-width B
      (103L, None),       // before the first version
      (104L, Some("Z"))))
  }
}
