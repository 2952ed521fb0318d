package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregation equals direct aggregation") {
    val li = spark.read.parquet(sf("lineitem"))
    val direct = li.groupBy("l_returnflag")
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("s"), count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getDecimal(1), r.getLong(2))).toSet
    val salted = Skew.saltedAgg(li, Seq(col("l_returnflag")), 16)(
      partials = Seq(sum(col("l_quantity").cast("decimal(18,2)")).as("s"), count(lit(1)).as("c")),
      merged = Seq(sum(col("s")).as("s"), sum(col("c")).as("c")))
      .collect().map(r => (r.getString(0), r.getDecimal(1), r.getLong(2))).toSet
    assert(salted == direct)
  }

  test("salted broadcast join equals plain join") {
    val probe = Seq.tabulate(1000)(i => (i % 3, i)).toDF("key", "v") // key 0/1/2 hot
    val build = Seq((0, "a"), (1, "b"), (2, "c"), (3, "unmatched")).toDF("key", "name")
    val plain = probe.join(build, Seq("key"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSet
    val salted = Skew.saltedBroadcastJoin(probe, build, "key", buckets = 8)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSet
    assert(salted == plain)
    assert(plain.size == 1000)
  }
}
