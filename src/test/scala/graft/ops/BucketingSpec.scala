package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketed-table join: the shuffle is paid at write time, so the join
  * plan must contain NO hash-partitioning Exchange — the co-location
  * property that matters for recurring fact⋈fact joins at 100 TB. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("same-key bucketed tables join without any Exchange") {
    val autoBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val orders = spark.read.parquet(sf("orders"))
      val li = spark.read.parquet(sf("lineitem"))
        .groupBy(col("l_orderkey").as("o_orderkey"))
        .agg(count(lit(1)).as("n_lines"))
      Bucketing.writeBucketed(orders, "orders_b", "o_orderkey", 8)
      Bucketing.writeBucketed(li, "lines_b", "o_orderkey", 8)
      val joined = Bucketing.joinBucketed(spark, "orders_b", "lines_b", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n${plan.take(800)}")
      // and it is still correct
      val direct = spark.read.parquet(sf("orders"))
        .join(spark.read.parquet(sf("lineitem"))
          .groupBy(col("l_orderkey").as("o_orderkey")).agg(count(lit(1)).as("n_lines")),
          Seq("o_orderkey"))
        .count()
      assert(joined.count() == direct)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", autoBroadcast)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lines_b")
    }
  }
}
