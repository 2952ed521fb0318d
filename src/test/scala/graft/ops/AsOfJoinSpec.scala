package graft.ops

import org.apache.spark.sql.Row

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def trades = Seq(
    // (key, t, trade_id)
    ("a", 100L, 1L), ("a", 200L, 2L), ("a", 300L, 3L),
    ("b", 50L, 4L), ("b", 400L, 5L),
    ("c", 10L, 6L) // key with no quotes at all
  ).toDF("sym", "t", "trade_id")

  private def quotes = Seq(
    // (key, qt, quote_id, px) — includes an equal-time tie at ("a", 200)
    ("a", 90L, 10L, 1.0), ("a", 200L, 11L, 2.0), ("a", 200L, 12L, 3.0),
    ("a", 250L, 13L, 4.0),
    ("b", 60L, 14L, 5.0)
  ).toDF("sym", "qt", "quote_id", "px")

  private def joined = AsOfJoin.backward(trades, quotes, Seq("sym"),
    leftTime = "t", rightTime = "qt", rightTieBreak = "quote_id")

  test("backward as-of picks the latest at-or-before right row") {
    val got = joined.orderBy("trade_id")
      .select("trade_id", "quote_id", "qt", "px")
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Long]), Option(r.get(2)), Option(r.get(3))))
    assert(got.toSeq === Seq(
      (1L, Some(10L), Some(90L), Some(1.0)),  // 100 → quote at 90
      (2L, Some(12L), Some(200L), Some(3.0)), // equal time included; id-tie → 12
      (3L, Some(13L), Some(250L), Some(4.0)),
      (4L, None, None, None),                 // 50 < first quote at 60
      (5L, Some(14L), Some(60L), Some(5.0)),
      (6L, None, None, None)                  // key with no quotes
    ))
  }

  test("equal-time tie resolves to greatest tie-break as ONE row, not a mix") {
    // trade at exactly 200 must take quote_id=12 AND its px (3.0) — fields
    // may never mix across the two tied quote rows
    val r = joined.where($"trade_id" === 2L).select("quote_id", "px").head()
    assert(r === Row(12L, 3.0))
  }

  test("tolerance nulls out matches farther back than the bound") {
    val got = AsOfJoin.backward(trades, quotes, Seq("sym"),
        "t", "qt", "quote_id", toleranceUs = Some(20L))
      .orderBy("trade_id").select("trade_id", "quote_id").collect()
      .map(r => (r.getLong(0), Option(r.get(1))))
    // trade 1: gap 10 ≤ 20 keeps; trade 3: gap 50 > 20 drops; trade 5: gap 340 drops
    assert(got.toSeq === Seq((1L, Some(10L)), (2L, Some(12L)), (3L, None),
      (4L, None), (5L, None), (6L, None)))
  }

  test("plan shuffles once on the key — no join explosion, no cartesian") {
    val p = joined.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("NestedLoop"))
    // exactly one hash-partition exchange (the key shuffle feeding the
    // window sweep); union sides land in it without a pre-shuffle
    val shuffles = "Exchange [a-z]+partitioning".r.findAllIn(p).toList
    assert(shuffles.size === 1, s"expected 1 shuffle, got $shuffles in:\n$p")
  }

  test("null right payload columns do not bleed earlier rows' values") {
    val q = Seq(("a", 90L, 10L, Some(1.0)), ("a", 150L, 11L, None))
      .toDF("sym", "qt", "quote_id", "px")
    val got = AsOfJoin.backward(
        trades.where($"trade_id" === 2L), q, Seq("sym"), "t", "qt", "quote_id")
      .select("quote_id", "px").head()
    // latest quote (id 11) has null px; the sweep must return (11, null),
    // never (11, 1.0) stitched from the older row
    assert(got === Row(11L, null))
  }
}
