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
    val out = tempDir("layout").toString
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

  test("z-ordered layout skips files on the NON-leading dimension too") {
    import spark.implicits._
    // a shuffled 64×64 grid: plain x-sort gives every file the full y range
    // (no y-skipping); the z-curve gives each file a tight (x, y) box
    val grid = (for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong))
      .toDF("x", "y").repartition(8) // destroy any incidental order
    val zDir = tempDir("zorder").toString
    val xDir = tempDir("xsort").toString
    Layout.writeZOrdered(grid, zDir, $"x", $"y", numFiles = 16)
    grid.repartitionByRange(16, $"x").sortWithinPartitions("x")
      .write.mode("overwrite").parquet(xDir)

    // files whose [min_y, max_y] overlaps the filter y < 8 — the file count
    // a stats-based reader must open
    def overlapping(dir: String): Int = {
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.toString)
      files.count { f =>
        val r = spark.read.parquet(f).agg(min($"y"), max($"y")).head()
        r.getLong(0) < 8
      }
    }
    val zHit = overlapping(zDir)
    val xHit = overlapping(xDir)
    assert(xHit >= 12, s"x-sorted layout should leave ~every file y-unselective, got $xHit")
    assert(zHit <= xHit / 2, s"z-order should halve touched files at worst: z=$zHit x=$xHit")
    // layout must not change the data
    assert(spark.read.parquet(zDir).count() === 64L * 64)
  }

  test("compaction collapses small files without changing the data") {
    import spark.implicits._
    val dir = tempDir("compact").toString + "/t"
    val df = (1 to 5000).map(i => (i.toLong, s"row $i payload")).toDF("id", "s")
    df.repartition(64).write.parquet(dir) // 64 tiny files — ingest debris
    val before = spark.read.parquet(dir).inputFiles.length
    val sum0 = spark.read.parquet(dir).agg(sum($"id")).head().getLong(0)
    val (nBefore, nAfter) = Layout.compact(spark, dir,
      targetFileBytes = 1L << 20, tmpPath = dir + "_tmp")
    assert(nBefore === before && nBefore >= 60)
    assert(nAfter <= 2, s"still $nAfter files")
    assert(spark.read.parquet(dir).agg(sum($"id")).head().getLong(0) === sum0)
    assert(spark.read.parquet(dir).count() === 5000L)
  }

  test("upsert: updates win on collision, inserts land, untouched rows survive") {
    import spark.implicits._
    val snap = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val upd = Seq((2L, "B2"), (9L, "NEW")).toDF("k", "v")
    val got = Layout.upsert(snap, upd, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(got.toSeq === Seq((1L, "a"), (2L, "B2"), (3L, "c"), (9L, "NEW")))
    // schema drift is an error, not a silent column mangle
    intercept[IllegalArgumentException] {
      Layout.upsert(snap, Seq((2L, "x", 1)).toDF("k", "v", "extra"), Seq("k"))
    }
  }
}
