package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.CountMin

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private val depth = 4
  private val width = 32

  private def estimates(terms: Seq[Long], d: Int = depth, w: Int = width) = {
    val df = terms.toDF("term")
    val cm = df.agg(CountMin.countMin($"term", d, w).as("cm"))
    df.distinct().crossJoin(broadcast(cm))
      .select($"term", CountMin.estimateCol($"cm", $"term", d, w).as("est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("estimates never underestimate and are exact without collisions") {
    // 8 terms into 32 buckets across 4 rows: collisions possible per row
    // but min-over-rows recovers exact counts with high probability; the
    // invariant is est >= exact for EVERY term
    val terms = (0L until 8L).flatMap(t => Seq.fill((t + 1).toInt)(t))
    val exact = terms.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val est = estimates(terms)
    exact.foreach { case (t, c) =>
      assert(est(t) >= c, s"term $t: est ${est(t)} < exact $c")
    }
    // with 256 terms forced into 32 buckets, collisions are guaranteed:
    // at least one term must overestimate (the sketch is genuinely lossy)
    val dense = (0L until 256L).flatMap(t => Seq.fill(((t % 5) + 1).toInt)(t))
    val denseExact = dense.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val denseEst = estimates(dense)
    assert(denseExact.forall { case (t, c) => denseEst(t) >= c })
    assert(denseExact.exists { case (t, c) => denseEst(t) > c },
      "256 terms in 32 buckets produced zero collisions — bucketing broken?")
  }

  test("sketch is invariant to partitioning (merge path ≡ single partition)") {
    val base = (1L to 5000L).map(_ % 97).toDF("term")
    val one = base.coalesce(1).agg(CountMin.countMin($"term", depth, width)).head()
    val many = base.repartition(16).agg(CountMin.countMin($"term", depth, width)).head()
    assert(one === many)
  }

  test("nulls are ignored; matrix mass = depth * non-null rows") {
    val cm = Seq[Option[Long]](Some(1L), Some(2L), None, Some(3L)).toDF("term")
      .agg(CountMin.countMin($"term", depth, width).as("cm"))
      .select(expr("aggregate(cm, 0L, (a, x) -> a + x)")).head().getLong(0)
    assert(cm === depth.toLong * 3)
  }

  test("rejects non-power-of-two width and non-BIGINT terms") {
    intercept[IllegalArgumentException] {
      Seq(1L).toDF("t").agg(CountMin.countMin($"t", 4, 33)).head()
    }
    intercept[Exception] { // analysis failure: INT term
      Seq(1).toDF("t").agg(CountMin.countMin($"t", 4, 32)).head()
    }
  }

  test("SQL-callable via GraftExtensions") {
    graft.GraftExtensions.registerTemp(spark)
    Seq((1L, 2L)).toDF("a", "b").createOrReplaceTempView("cm_probe")
    val arr = spark.sql("SELECT count_min(a, 2, 4) FROM cm_probe")
      .head().getSeq[Long](0)
    assert(arr.length === 8 && arr.sum === 2L)
  }
}
