package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val keys = spark.range(0, 20000).toDF("id")

  test("uniform sample: rate accuracy within binomial noise") {
    val n = Sampling.sample(keys, col("id"), 0.25).count()
    // 20000 trials at p=0.25: 3σ ≈ ±184
    assert(math.abs(n - 5000) < 600, s"sampled $n of 20000 at rate 0.25")
  }

  test("samples nest: lower rate is a subset of higher rate") {
    val lo = Sampling.sample(keys, col("id"), 0.1).select("id").collect().map(_.getLong(0)).toSet
    val hi = Sampling.sample(keys, col("id"), 0.3).select("id").collect().map(_.getLong(0)).toSet
    assert(lo.subsetOf(hi), s"${(lo -- hi).size} keys in the 10% sample missing from 30%")
  }

  test("membership is a pure function of the key (repartition-invariant)") {
    val a = Sampling.sample(keys, col("id"), 0.2).collect().map(_.getLong(0)).toSet
    val b = Sampling.sample(keys.repartition(13), col("id"), 0.2)
      .collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("q95 split assignment: 80/10/10 fractions, deterministic, growth-stable") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.SparkEntry.queries("q95_split_assign")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val n = got.size.toDouble
    val frac = got.values.groupBy(identity).view.mapValues(_.size / n).toMap
    assert(math.abs(frac("train") - 0.8) < 0.06, s"train ${frac("train")}")
    assert(math.abs(frac.getOrElse("val", 0.0) - 0.1) < 0.05)
    assert(math.abs(frac.getOrElse("test", 0.0) - 0.1) < 0.05)
    // a document's split is a pure function of its id: assigning over a
    // SHRUNK corpus (half the docs) gives every surviving doc the same
    // split — ingest order and corpus growth can never move a document
    val c = graft.functions.Mix64.sampleCoord(col("doc_id"))
    val sub = spark.read.parquet(s"$dir/documents.parquet")
      .where(col("doc_id") % 2 === 0)
      .select(col("doc_id"),
        when(c < lit(Sampling.threshold(0.8)), "train")
          .when(c < lit(Sampling.threshold(0.9)), "val")
          .otherwise("test").as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    sub.foreach { case (id, s) => assert(got(id) == s, s"doc $id moved") }
  }

  test("stratified: per-stratum rates and default rate both apply") {
    val df = keys.withColumn("s",
      when(col("id") % 3 === 0, "a").when(col("id") % 3 === 1, "b").otherwise("c"))
    val out = Sampling.stratifiedSample(df, col("id"), col("s"),
        Map("a" -> 1.0, "b" -> 0.0), defaultRate = 0.5)
      .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("a") == 6667L)            // rate 1.0 keeps every row
    assert(!out.contains("b"))           // rate 0.0 keeps none
    assert(math.abs(out("c") - 3333L) < 500) // default 0.5 of 6666
  }

  test("rate 1.0 threshold exceeds every coordinate; rate bounds enforced") {
    assert(Sampling.threshold(1.0) == 4294967296L)
    assert(Sampling.threshold(0.0) == 0L)
    intercept[IllegalArgumentException](Sampling.threshold(1.5))
  }

  test("weighted top-k matches the driver-side closed form; drops w <= 0") {
    import graft.functions.Mix64
    val df = keys.withColumn("w",
      when(col("id") % 7 === 0, -1.0).otherwise((col("id") % 13 + 1).cast("double")))
    val got = Sampling.weightedTopK(df, col("id"), col("w"), n = 25)
      .select("id", "priority").collect().map(r => (r.getLong(0), r.getDouble(1)))
    val expect = df.select("id", "w").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .filter(_._2 > 0)
      .map { case (id, w) => (id, w * 4294967296.0 / (Mix64.hash(id) + 1).toDouble) }
      .sortBy { case (id, p) => (-p, id) }
      .take(25)
    assert(got.toSeq === expect.toSeq)
    assert(!got.exists { case (id, _) => id % 7 == 0 })
  }

  test("weighted top-k plans as TakeOrdered — no global sort exchange") {
    val df = keys.withColumn("w", (col("id") % 13 + 1).cast("double"))
    val plan = Sampling.weightedTopK(df, col("id"), col("w"), 25)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan:\n${plan.take(400)}")
  }

  test("quota sample: exact counts per stratum, nests across quotas, layout-invariant") {
    val df = keys.withColumn("src", (col("id") % 7).cast("string"))
    def ids(quota: Int, parts: Int): Set[Long] =
      Sampling.quotaSample(df.repartition(parts), col("id"), col("src"), quota)
        .select("id").collect().map(_.getLong(0)).toSet
    val q5 = ids(5, 4)
    val q10 = ids(10, 4)
    assert(q5.size === 5 * 7 && q10.size === 10 * 7)
    assert(q5.subsetOf(q10), "quota 5 sample not nested in quota 10")
    assert(ids(5, 13) === q5, "sample depends on partition layout")
    // a stratum smaller than the quota keeps all its rows
    val small = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("src", "id")
    assert(Sampling.quotaSample(small, col("id"), col("src"), 5).count() === 3)
  }
}
