package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Global row numbering over a total order WITHOUT the single-partition
  * window (`row_number() over (order by …)` with no partition moves EVERY
  * row through one task — the canonical scale-killer, and exactly what
  * Spark's own WindowExec warns about). The scalable shape: range-
  * repartition on the sort key (boundaries from Spark's reservoir
  * sample, so partitions stay balanced under skewed keys), sort within
  * partitions, then convert local positions to global ranks by adding
  * per-partition offsets — `zipWithIndex`'s count job moves ONE long per
  * partition through the driver, and the second pass re-reads shuffle
  * files, not the source.
  *
  * The caller must pass a TOTAL order (include a unique tiebreaker
  * column): ranks are then deterministic and equal to
  * `row_number() over (order by …)` at any partition count or cluster
  * size — whatever range boundaries the sample picks, ranks only depend
  * on the global order.
  */
object Ranking {

  def globalRank(df: DataFrame, rankName: String, order: Column*): DataFrame = {
    require(order.nonEmpty, "globalRank needs at least one order column")
    require(!df.columns.contains(rankName),
      s"globalRank: output column '$rankName' already exists in the input")
    val spark = df.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions.max(1)
    val ranged = df.repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
    val schema = StructType(
      ranged.schema.fields :+ StructField(rankName, LongType, nullable = false))
    val ranked = ranged.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(ranked, schema)
  }
}
