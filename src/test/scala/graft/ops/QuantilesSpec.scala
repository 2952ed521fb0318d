package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  test("estimates land within one bin width of the exact quantile") {
    val df = (1 to 10000).map(i => ("g", i.toDouble)).toDF("grp", "v")
    val r = Quantiles.histogramEstimates(df, "grp", "v", nBins = 256, qs = Seq(0.5, 0.95))
      .head()
    val binW = (10000.0 - 1.0) / 256
    val p50 = r.getAs[Double]("p50_est")
    val p95 = r.getAs[Double]("p95_est")
    assert(math.abs(p50 - 5000.0) <= binW, s"p50=$p50")
    assert(math.abs(p95 - 9500.0) <= binW, s"p95=$p95")
  }

  test("result is partition-invariant (the histogram is mergeable)") {
    val base = (1 to 5000).map(i => (s"g${i % 3}", (i * 7 % 997).toDouble)).toDF("grp", "v")
    val one = Quantiles.histogramEstimates(base.coalesce(1), "grp", "v", 64, Seq(0.5))
      .orderBy("grp").collect().toSeq
    val many = Quantiles.histogramEstimates(base.repartition(16), "grp", "v", 64, Seq(0.5))
      .orderBy("grp").collect().toSeq
    assert(one === many)
  }

  test("constant-valued group degenerates safely to bin 0") {
    val df = Seq(("g", 7.0), ("g", 7.0), ("g", 7.0)).toDF("grp", "v")
    val r = Quantiles.histogramEstimates(df, "grp", "v", 256, Seq(0.5)).head()
    assert(r.getAs[Double]("vmin") === 7.0 && r.getAs[Double]("vmax") === 7.0)
    assert(r.getAs[Double]("p50_est") === 7.0) // vmin + (0+1)·0/256
  }
}
