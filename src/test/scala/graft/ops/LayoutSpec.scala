package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Partitioned layout: a filter on the partition column must become a
  * PartitionFilter (directory pruning) — no data files outside the
  * matching partition are read. */
class LayoutSpec extends SparkSpec {

  test("partition-column filter prunes at the directory level") {
    val events = spark.read.parquet(sf("events"))
      .select(col("event_id"), col("event_type"), col("user_id"))
    val out = Files.createTempDirectory("layout").toString
    Layout.writePartitioned(events, out, Seq("event_type"))

    val filtered = spark.read.parquet(out).where(col("event_type") === "purchase")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("event_type"),
      s"expected partition pruning in:\n${plan.take(500)}")
    // pruning must not change results
    val expected = events.where(col("event_type") === "purchase").count()
    assert(filtered.count() == expected && expected > 0)
    // and each partition directory holds ONE file (repartitionFirst)
    val purchaseDir = new java.io.File(s"$out/event_type=purchase")
    val dataFiles = purchaseDir.listFiles().count(_.getName.endsWith(".parquet"))
    assert(dataFiles == 1, s"small-files guard: $dataFiles files")
  }
}
