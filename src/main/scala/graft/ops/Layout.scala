package graft.ops

import org.apache.spark.sql.DataFrame

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
}
