package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

import graft.functions.ZOrder

/** Write-layout helpers for the 100 TB path. Partitioning the physical
  * layout by the columns queries filter on turns those filters into
  * directory pruning (`PartitionFilters` in the scan) — entire partitions
  * are never listed, opened or read. Complements [[Bucketing]] (which
  * co-locates JOIN keys); partition columns should be low-cardinality
  * (sensor, event type, date) or the file count explodes.
  */
object Layout {

  /** Hive-style partitioned parquet write. `repartitionFirst` shuffles on
    * the partition columns before writing so each partition directory gets
    * few large files instead of one small file per task — the small-files
    * problem is the usual failure mode of naive partitioned writes. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       repartitionFirst: Boolean = true): Unit = {
    val out =
      if (repartitionFirst)
        df.repartition(partitionCols.map(org.apache.spark.sql.functions.col): _*)
      else df
    out.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
  }

  /** Z-ordered parquet write: range-partition + sort on the Morton value of
    * two layout keys, so every file covers a tight bounding BOX in (x, y) —
    * parquet min/max stats then skip files for filters on EITHER dimension
    * (plain sorting only tightens the leading column). This is the
    * high-cardinality complement to [[writePartitioned]]: no directory
    * explosion, locality comes from the curve, not the path. `numFiles`
    * bounds output file count (at 100 TB, size so files land 128 MB–1 GB).
    */
  def writeZOrdered(df: DataFrame, path: String, xCol: Column, yCol: Column,
                    numFiles: Int): Unit =
    df.withColumn("_zval", ZOrder.zval(xCol.cast("long"), yCol.cast("long")))
      .repartitionByRange(numFiles, col("_zval"))
      .sortWithinPartitions("_zval")
      .drop("_zval")
      .write.mode("overwrite").parquet(path)

  /** Keyed UPSERT (merge-into semantics without a table format): the new
    * batch's rows win on key collision, snapshot rows without a collision
    * survive, new keys insert. One anti-join keyed on the merge keys —
    * the updates side is the (small) batch, so at 100 TB it broadcasts
    * and the snapshot never shuffles; write the result partition-wise to
    * swap in atomically (compact's temp-dir pattern). Column sets must
    * match by name.
    *
    * PRECONDITION: `updates` must be key-unique on `keys` — a batch with
    * duplicate keys would keep EVERY duplicate (each suppresses the
    * snapshot row; real MERGE INTO errors on multiple source matches).
    * Callers with possibly-duplicated batches dedupe first, e.g. keep the
    * newest row per key with max_by/row_number. */
  def upsert(snapshot: DataFrame, updates: DataFrame,
             keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty)
    require(snapshot.columns.sorted.sameElements(updates.columns.sorted),
      s"snapshot/updates schemas differ: ${snapshot.columns.toSeq} vs ${updates.columns.toSeq}")
    updates.unionByName(
      snapshot.join(
        org.apache.spark.sql.functions.broadcast(
          updates.select(keys.map(org.apache.spark.sql.functions.col): _*)),
        keys, "left_anti"))
  }

  /** Compact a small-files parquet directory (the debris of streaming /
    * per-task ingest — every downstream scan pays a task and a footer read
    * PER FILE) into ceil(bytes / targetFileBytes) files. Sizing comes from
    * the actual on-disk bytes, not a row-count guess, so output files land
    * near the target regardless of row width. Writes to `tmpPath` first and
    * swaps only after success — a crashed compaction leaves the original
    * intact. Returns (filesBefore, filesAfter). */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
              targetFileBytes: Long, tmpPath: String): (Int, Int) = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataFiles = fs.listStatus(hPath)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val totalBytes = dataFiles.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    spark.read.parquet(path).repartition(nOut)
      .write.mode("overwrite").parquet(tmpPath)
    val tmp = new org.apache.hadoop.fs.Path(tmpPath)
    fs.delete(hPath, true)
    fs.rename(tmp, hPath)
    val after = fs.listStatus(hPath)
      .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    (dataFiles.length, after)
  }
}
