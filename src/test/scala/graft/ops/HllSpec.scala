package graft.ops

import graft.SparkSpec
import graft.functions.Hll

class HllSpec extends SparkSpec {
  import spark.implicits._

  private def sketchOf(keys: Seq[Long]): Array[Int] =
    keys.toDF("key").agg(Hll.hll($"key").as("regs"))
      .head().getSeq[Int](0).toArray

  private def estimateOf(regs: Array[Int]): Double = {
    val ind = regs.map(r => 1L << (Hll.RankCap - r)).sum
    Hll.EstNum / ind.toDouble
  }

  test("register: bucket in range, rank in [1, cap], deterministic") {
    (-1000L to 1000L).foreach { k =>
      val (b, r) = Hll.register(k)
      assert(b >= 0 && b < Hll.M)
      assert(r >= 1 && r <= Hll.RankCap)
      assert(Hll.register(k) === (b, r))
    }
  }

  test("agg ≡ sequential fold; duplicates and order are free") {
    val keys = (1L to 5000L).map(k => k * 37 % 1213)
    val seq = new Array[Int](Hll.M)
    keys.foreach(Hll.add(seq, _))
    assert(sketchOf(keys) === seq)
    assert(sketchOf(keys.reverse) === seq)
    assert(sketchOf(keys ++ keys) === seq, "duplicate keys must not move registers")
  }

  test("sketch is invariant to partitioning (merge path ≡ single partition)") {
    val base = (1L to 5000L).toDF("key")
    val one = base.coalesce(1).agg(Hll.hll($"key")).head().getSeq[Int](0)
    val many = base.repartition(16).agg(Hll.hll($"key")).head().getSeq[Int](0)
    assert(one === many)
  }

  test("merge of two sketches = sketch of the union") {
    val a = (1L to 3000L).map(_ * 7)
    val b = (2000L to 6000L).map(_ * 7)
    val sa = new Array[Int](Hll.M); a.foreach(Hll.add(sa, _))
    val sb = new Array[Int](Hll.M); b.foreach(Hll.add(sb, _))
    Hll.merge(sa, sb)
    val su = new Array[Int](Hll.M); (a ++ b).foreach(Hll.add(su, _))
    assert(sa === su)
  }

  test("estimate within 3σ (≈39% at m=64) for n ≫ m") {
    // the raw estimator's validity range; n ≲ 5m is the documented
    // small-range zone a consumer corrects via n_zero (next test)
    Seq(2000, 20000, 100000).foreach { n =>
      val keys = (1L to n.toLong).map(k => k * 2654435761L)
      val est = estimateOf(sketchOf(keys))
      val rel = math.abs(est - n) / n
      assert(rel < 0.39, s"n=$n est=$est rel=$rel")
    }
  }

  test("small range: linear counting over emitted n_zero recovers n") {
    Seq(50, 100, 200).foreach { n =>
      val regs = sketchOf((1L to n.toLong).map(k => k * 2654435761L))
      val nZero = regs.count(_ == 0)
      assert(nZero > 0, s"n=$n: expected empty registers at n ≲ 5m")
      val lc = Hll.M * math.log(Hll.M.toDouble / nZero)
      val rel = math.abs(lc - n) / n
      assert(rel < 0.3, s"n=$n lc=$lc rel=$rel")
    }
  }

  test("per-group sketches roll up to the direct global sketch (q110 shape)") {
    val df = Seq(("a", 1L), ("a", 2L), ("b", 2L), ("b", 3L), ("c", 9L))
      .toDF("g", "key")
    val perGroup = df.groupBy("g").agg(Hll.hll($"key").as("regs"))
      .collect().map(_.getSeq[Int](1).toArray)
    val merged = new Array[Int](Hll.M)
    perGroup.foreach(Hll.merge(merged, _))
    val direct = df.agg(Hll.hll($"key")).head().getSeq[Int](0).toArray
    assert(merged === direct)
  }

  test("nulls are ignored") {
    val regs = Seq[Option[Long]](Some(1L), None, Some(2L)).toDF("key")
      .agg(Hll.hll($"key")).head().getSeq[Int](0)
    val want = new Array[Int](Hll.M)
    Hll.add(want, 1L); Hll.add(want, 2L)
    assert(regs.toArray === want)
  }

  test("SQL-callable via GraftExtensions") {
    graft.GraftExtensions.registerTemp(spark)
    Seq(1L, 2L, 3L).toDF("k").createOrReplaceTempView("hll_probe")
    val regs = spark.sql("SELECT hll(k) FROM hll_probe").head().getSeq[Int](0)
    assert(regs.length === Hll.M && regs.count(_ > 0) >= 1)
  }

  test("indicator stays within Long: worst case all-empty registers") {
    // empty register contributes 2^RankCap; m of them must not overflow
    val worst = Hll.M.toLong * (1L << Hll.RankCap)
    assert(worst > 0 && worst < Long.MaxValue)
  }
}
