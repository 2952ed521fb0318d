package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for the 100 TB path. AQE's skew-join splitting
  * handles join-side skew at runtime; these cover aggregation-side skew
  * (a handful of hot keys drowning single reducers) and salted broadcast
  * joins when a dimension is just over the broadcast threshold.
  */
object Skew {

  /** Two-phase salted aggregation: phase 1 aggregates on (key, salt) —
    * spreading a hot key over `buckets` reducers — phase 2 merges the
    * partials on the key alone. Correct for algebraic aggregates; callers
    * pass both the partial and the merge form.
    *
    * Example:
    * {{{
    * saltedAgg(df, Seq(col("k")), 16)(
    *   partials = Seq(sum(col("v")).as("s"), count(lit(1)).as("c")),
    *   merged   = Seq(sum(col("s")).as("s"), sum(col("c")).as("c")))
    * }}}
    */
  def saltedAgg(df: DataFrame, keys: Seq[Column], buckets: Int)(
      partials: Seq[Column], merged: Seq[Column]): DataFrame = {
    require(buckets > 0)
    val salted = df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
    val phase1 = salted.groupBy(keys :+ col("_salt"): _*)
      .agg(partials.head, partials.tail: _*)
    phase1.groupBy(keys: _*).agg(merged.head, merged.tail: _*)
  }

  /** Salted broadcast join for a hot probe side: replicate the build side
    * `buckets` times (explode) and salt the probe side, so one hot key's
    * rows spread across `buckets` tasks. Equi-join on `key` only. */
  def saltedBroadcastJoin(probe: DataFrame, build: DataFrame, key: String,
                          buckets: Int): DataFrame = {
    val saltedProbe = probe.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(buckets)))
    val replicatedBuild = build.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1)).cast("array<bigint>")))
    saltedProbe.join(broadcast(replicatedBuild), Seq(key, "_salt")).drop("_salt")
  }
}
