package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier

/** Bucketed-table helpers for the 100 TB path: persisting both sides of a
  * recurring equi-join bucketed (and sorted) by the join key lets Spark
  * plan a SortMergeJoin with NO Exchange on either side — the shuffle is
  * paid once at write time and amortized over every subsequent join,
  * which is the single biggest lever for repeated fact⋈fact joins at
  * cluster scale (e.g. re-joining the pair table to tile metadata every
  * training refresh).
  *
  * Bucketing requires the session catalog (`saveAsTable`); plain
  * `parquet(path)` writes cannot carry bucket metadata.
  */
object Bucketing {

  /** Persist `df` as a bucketed, sorted managed table (overwrite).
    *
    * Overwrite must also cover the stale-location case: the session
    * metastore is in-memory (fresh per JVM) while `spark-warehouse/`
    * persists on disk, so a managed-table directory left by a PREVIOUS
    * process is invisible to the catalog and `saveAsTable` fails with
    * LOCATION_ALREADY_EXISTS. If the table is not in the catalog but its
    * default location exists, remove the orphaned directory first. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    nBuckets: Int): Unit = {
    val spark = df.sparkSession
    if (!spark.catalog.tableExists(table)) {
      val loc = new Path(
        spark.sessionState.catalog.defaultTablePath(TableIdentifier(table)))
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    df.write
      .mode("overwrite")
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two same-key bucketed tables — with matching bucket counts the
    * planner elides both Exchanges (verify with
    * `df.queryExecution.executedPlan`: no `Exchange hashpartitioning`).
    * Callers should disable auto-broadcast or use tables above the
    * threshold to see the SortMergeJoin path. */
  def joinBucketed(spark: SparkSession, left: String, right: String,
                   key: String): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key))
}
