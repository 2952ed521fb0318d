package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Kmv

class KmvSpec extends SparkSpec {
  import spark.implicits._

  test("unsaturated sketch is the exact distinct count, kth_min null") {
    val df = (1L to 40L).map(i => i % 10).toDF("k")
      .agg(Kmv.kmvDistinct($"k", 64).as("s")).select("s.*")
    assert(df.head() === Row(10, null, 10.0))
  }

  test("saturated estimate lands within the bottom-k error envelope") {
    // 10_000 distinct keys, k=64 → typical relative error 1/sqrt(k-1) ≈ 13%
    val n = 10000
    val Row(kept: Int, _, est: Double) = (1L to n.toLong).toDF("k")
      .agg(Kmv.kmvDistinct($"k", 64).as("s")).select("s.*").head()
    assert(kept === 64)
    assert(math.abs(est - n) / n < 0.4, s"estimate $est too far from $n")
  }

  test("sketch is invariant to partitioning (merge path ≡ single partition)") {
    val base = (1L to 5000L).toDF("k")
    val one = base.coalesce(1).agg(Kmv.kmvDistinct($"k", 64)).head()
    val many = base.repartition(16).agg(Kmv.kmvDistinct($"k", 64)).head()
    assert(one === many)
  }

  test("duplicates and nulls do not move the sketch") {
    val withDups = ((1L to 100L) ++ (1L to 100L)).toDF("k")
      .union(Seq[Option[Long]](None).toDF("k"))
      .agg(Kmv.kmvDistinct($"k", 64).as("s")).select("s.*").head()
    val plain = (1L to 100L).toDF("k")
      .agg(Kmv.kmvDistinct($"k", 64).as("s")).select("s.*").head()
    assert(withDups === plain)
  }

  test("estimate matches the closed form on the kept hashes") {
    val n = 3000
    val Row(_, kth: Long, est: Double) = (1L to n.toLong).toDF("k")
      .agg(Kmv.kmvDistinct($"k", 64).as("s")).select("s.*").head()
    val expectKth = (1L to n.toLong).map(Kmv.hash63).sorted.apply(63)
    assert(kth === expectKth)
    assert(est === Kmv.estimate(64, expectKth))
  }
}
