package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixed-bin histogram quantile sketch — the bounded-state answer to
  * "p95 per group over 100 TB": one min/max pass, then a binning pass whose
  * per-(group, bin) counts ARE the mergeable sketch (map-side combined, at
  * most nBins rows per group ever shuffle), then quantiles read off the
  * cumulative histogram. The exact alternative sorts the whole corpus per
  * group; the sketch's error is bounded by one bin width
  * ((max−min)/nBins).
  *
  * Every float step is a fixed two-operand tree (subtract, divide, scale by
  * the integer nBins, floor), so a DuckDB oracle reproduces estimates
  * bit-for-bit (q71) — the approximation, like q59's, is a checked
  * quantity.
  */
object Quantiles {

  /** Per-group histogram quantile estimates.
    * @return group, n, vmin, vmax, and one `p<q*100>_est` per requested
    *         quantile (right bin edge of the first bin whose cumulative
    *         count reaches ceil(q·n)). */
  def histogramEstimates(df: DataFrame, groupCol: String, valueCol: String,
                         nBins: Int, qs: Seq[Double]): DataFrame = {
    require(nBins >= 2 && qs.nonEmpty && qs.forall(q => q > 0 && q <= 1))
    val v = col(valueCol)
    val g = df.groupBy(groupCol).agg(
      count(lit(1)).as("n"), min(v).as("vmin"), max(v).as("vmax"))
    val binned = df.join(broadcast(g), groupCol)
      .withColumn("bin",
        when(col("vmax") === col("vmin"), lit(0L))
          .otherwise(least(
            floor(((v - col("vmin")) / (col("vmax") - col("vmin"))) * lit(nBins)),
            lit(nBins - 1L))))
    val hist = binned.groupBy(col(groupCol), col("bin"))
      .agg(count(lit(1)).as("c"))
    val cum = hist.withColumn("cc",
      sum(col("c")).over(Window.partitionBy(groupCol).orderBy("bin")))
      .join(broadcast(g), groupCol)

    qs.foldLeft(g) { (acc, q) =>
      val name = s"p${math.round(q * 100)}_est"
      val qbin = cum
        .where(col("cc") >= ceil(lit(q) * col("n")))
        .groupBy(groupCol).agg(min(col("bin")).as("qbin"))
      acc.join(qbin, Seq(groupCol))
        .withColumn(name,
          col("vmin") +
            ((col("qbin") + lit(1L)).cast("double") * (col("vmax") - col("vmin"))) /
              lit(nBins))
        .drop("qbin")
    }
  }
}
