package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Bloom

class BloomSpec extends SparkSpec {
  import spark.implicits._

  private val K = 4
  private val Bits = 1 << 14

  private def bloomOf(keys: Seq[Long]) =
    keys.toDF("k").agg(Bloom.buildAgg($"k", Bits, K).as("bf"))

  test("no false negatives: every inserted key probes true") {
    val keys = (0L until 500L).map(_ * 37 + 5)
    val probed = keys.toDF("k").crossJoin(broadcast(bloomOf(keys)))
      .where(Bloom.mightContain($"bf", $"k", K))
    assert(probed.count() === keys.length.toLong)
  }

  test("selective: disjoint keys are mostly rejected") {
    val inserted = (0L until 150L)
    val disjoint = (1000000L until 1010000L).toDF("k")
    val passed = disjoint.crossJoin(broadcast(bloomOf(inserted)))
      .where(Bloom.mightContain($"bf", $"k", K)).count()
    // fpp at n=150, m=16384, k=4 is ~1e-4; allow 100× headroom
    assert(passed <= 100, s"$passed of 10000 disjoint keys passed")
  }

  test("bitset merge is partition-invariant") {
    val keys = (0L until 2000L).map(_ * 13 + 1)
    val one = keys.toDF("k").coalesce(1)
      .agg(Bloom.buildAgg($"k", Bits, K)).head().getSeq[Long](0)
    val many = keys.toDF("k").repartition(16)
      .agg(Bloom.buildAgg($"k", Bits, K)).head().getSeq[Long](0)
    assert(one === many)
  }

  test("q69's bloom-pruned semi join ≡ the plain semi join") {
    val cust = spark.read.parquet(sf("customer"))
      .where($"c_acctbal" > 9000).select($"c_custkey")
    val orders = spark.read.parquet(sf("orders"))
      .select($"o_custkey", $"o_orderkey")
    val bits = Bloom.build(cust, $"c_custkey", Bits, K)
    val viaBloom = orders
      .where(Bloom.mightContain(lit(bits), $"o_custkey", K))
      .join(broadcast(cust), $"o_custkey" === $"c_custkey", "left_semi")
      .select("o_orderkey").collect().map(_.getLong(0)).sorted
    val plain = orders
      .join(broadcast(cust), $"o_custkey" === $"c_custkey", "left_semi")
      .select("o_orderkey").collect().map(_.getLong(0)).sorted
    assert(viaBloom.toSeq === plain.toSeq && plain.nonEmpty)
  }

  test("the literal-bitset probe compiles into whole-stage codegen") {
    val cust = spark.read.parquet(sf("customer")).select($"c_custkey")
    val bits = Bloom.build(cust, $"c_custkey", Bits, K)
    val pruned = spark.read.parquet(sf("orders"))
      .where(Bloom.mightContain(lit(bits), $"o_custkey", K))
    val gen = pruned.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    // the generated Java must call the static probe — not fall back to
    // interpreted eval in the scan-side filter
    assert(gen.contains("Bloom.mightContainEval"), gen.take(600))
    assert(pruned.count() > 0)
  }
}
