package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Mix64

/** Deterministic hash-threshold sampling — the downsampling primitive of a
  * training-data pipeline (per-source/per-quality-bucket rates over a
  * corpus). Row membership is a pure function of the row's KEY, not of
  * partitioning, task order or RNG state:
  *
  *   keep ⇔ Mix64.sampleCoord(key) < floor(rate · 2^32)
  *
  * so a sample is reproducible across runs, engines and cluster layouts,
  * and samples NEST (rate 0.1 ⊂ rate 0.2 for the same key column) — which
  * is what makes ablation subsets comparable. A narrow filter with no
  * shuffle: it composes with scan pruning and survives any scale-up.
  */
object Sampling {

  /** Rows whose key lands under the stratum's rate threshold. `rates` maps
    * stratum value → rate in [0, 1]; strata absent from the map use
    * `defaultRate`. */
  def stratifiedSample(df: DataFrame, keyCol: Column, strataCol: Column,
                       rates: Map[String, Double],
                       defaultRate: Double): DataFrame = {
    val coord = Mix64.sampleCoord(keyCol.cast("long"))
    val thr = rates.foldLeft(lit(threshold(defaultRate))) {
      case (acc, (stratum, rate)) =>
        when(strataCol === stratum, lit(threshold(rate))).otherwise(acc)
    }
    df.where(coord < thr)
  }

  /** Uniform variant: one rate for every row. */
  def sample(df: DataFrame, keyCol: Column, rate: Double): DataFrame =
    df.where(Mix64.sampleCoord(keyCol.cast("long")) < lit(threshold(rate)))

  /** floor(rate · 2^32) — rate 1.0 exceeds every coordinate (≤ 2^32−1),
    * keeping all rows. Shared with the oracle-SQL generation so the two
    * sides can never round differently. */
  def threshold(rate: Double): Long = {
    require(rate >= 0.0 && rate <= 1.0, s"rate $rate outside [0, 1]")
    (rate * 4294967296.0).toLong
  }

  /** Deterministic weighted sample WITHOUT replacement (priority sampling,
    * Duffield–Lund–Thorup): each row gets priority w/u with u the key's
    * uniform coordinate, and the n highest priorities win — rows with twice
    * the weight are (stochastically) twice as likely to make the cut, yet
    * the outcome is a pure function of (key, weight). Computed as
    * w·2^32/(coord+1): one exact power-of-two scale + one division, both
    * IEEE-exact-rounded → bit-identical in DuckDB. Plans as top-k
    * (TakeOrdered): per-partition heaps then a single merge — no full sort,
    * no shuffle of the corpus. Requires weights > 0 (non-positive rows are
    * dropped). */
  def weightedTopK(df: DataFrame, keyCol: Column, weightCol: Column,
                   n: Int): DataFrame = {
    val u32 = Mix64.sampleCoord(keyCol.cast("long")) + lit(1L) // (0, 2^32]
    val priority = weightCol * lit(4294967296.0) / u32.cast("double")
    df.where(weightCol > 0)
      .withColumn("priority", priority)
      .orderBy(col("priority").desc, keyCol)
      .limit(n)
  }

  /** QUOTA sampling: exactly min(|stratum|, quota) rows per stratum — the
    * balanced-mixture construction a training run needs when sources must
    * contribute fixed counts, not fixed rates (rate sampling keeps a share;
    * quota sampling caps a count, whatever each stratum's size). The kept
    * rows are the stratum's `quota` smallest Mix64 coordinates — a uniform
    * draw without replacement that is a pure function of the keys, so it
    * reproduces across engines/layouts AND nests across quotas (quota 5 ⊂
    * quota 10 for the same keys). The rank<=quota predicate compiles to
    * WindowGroupLimit: per-partition top-quota heaps run BEFORE the
    * stratum shuffle, so at 100 TB each map task forwards at most `quota`
    * rows per stratum instead of its whole slice (pinned in PlanSpec). */
  def quotaSample(df: DataFrame, keyCol: Column, strataCol: Column,
                  quota: Int): DataFrame = {
    require(quota >= 1, s"quota $quota must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCol).orderBy(Mix64.sampleCoord(keyCol.cast("long")), keyCol)
    df.withColumn("rank", row_number().over(w))
      .where(col("rank") <= quota)
  }
}
