package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Next-fit sequence packing — grouping documents into fixed token-budget
  * packs (training-batch construction: concatenate short documents up to a
  * context-length budget instead of padding each one).
  *
  * Packing is inherently sequential, so the scalable unit is the SHARD:
  * within each shard documents are walked in id order and assigned
  * next-fit (a document that would overflow the running pack starts a new
  * one; a document alone longer than the budget gets its own pack). The
  * plan is one hash repartition by shard + an in-partition sort — the
  * sequential walk runs executor-side per shard, exactly the sessionize
  * shape, and parallelism scales with shard count, not corpus size.
  *
  * Deterministic: (shard, id) totally orders the walk, so the assignment
  * is reproducible and a recursive-CTE oracle can replay it row by row.
  */
object Packing {

  /** One row per document: (shard, doc_id, n_tok, pack_idx) with pack_idx
    * counting from 0 within each shard. */
  def packNextFit(df: DataFrame, shardCol: Column, idCol: Column,
                  nTokCol: Column, budget: Long): DataFrame = {
    require(budget > 0, s"budget $budget must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(shardCol.cast("string").as("shard"),
        idCol.cast("long").as("doc_id"), nTokCol.cast("long").as("n_tok"))
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "doc_id")
      .as[(String, Long, Long)]
      .mapPartitions { it =>
        // several shards may share a partition; the sort keeps each shard
        // contiguous, so a shard change resets the running pack
        var cur: String = null
        var pack = 0L
        var acc = 0L
        it.map { case (shard, id, nTok) =>
          if (shard != cur) { cur = shard; pack = 0L; acc = 0L }
          if (acc > 0 && acc + nTok > budget) { pack += 1; acc = 0L }
          acc += nTok
          (shard, id, nTok, pack)
        }
      }
      .toDF("shard", "doc_id", "n_tok", "pack_idx")
  }
}
