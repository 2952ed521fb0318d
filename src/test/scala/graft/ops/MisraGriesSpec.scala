package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.MisraGries

class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  /** Zipf-ish corpus: term t_i appears n/i times (i = 1..80), n = 400. */
  private def zipfTerms: Seq[String] =
    (1 to 80).flatMap(i => Seq.fill(400 / i)(s"t$i"))

  private def candidates(df: org.apache.spark.sql.DataFrame, k: Int): Map[String, Long] =
    df.agg(MisraGries.misraGries($"term", k).as("cs"))
      .select(explode($"cs").as("c")).select($"c.term", $"c.cnt_lower")
      .as[(String, Long)].collect().toMap

  test("guarantee: every term above n/(k+1) survives, under any partitioning") {
    val terms = zipfTerms
    val n = terms.size
    val exact = terms.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (k <- Seq(10, 25); parts <- Seq(1, 7, 32)) {
      val cand = candidates(terms.toDF("term").repartition(parts), k)
      val mustSurvive = exact.filter(_._2 > n.toLong / (k + 1)).keySet
      assert(mustSurvive.subsetOf(cand.keySet),
        s"k=$k parts=$parts missing: ${mustSurvive -- cand.keySet}")
      assert(cand.size <= k, s"k=$k parts=$parts kept ${cand.size} counters")
    }
  }

  test("sketch counts are lower bounds with deficit at most n/(k+1)") {
    val terms = zipfTerms
    val n = terms.size
    val exact = terms.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val k = 25
    val cand = candidates(terms.toDF("term").repartition(8), k)
    cand.foreach { case (t, lower) =>
      assert(lower <= exact(t), s"$t: lower $lower exceeds exact ${exact(t)}")
      assert(exact(t) - lower <= n.toLong / (k + 1),
        s"$t: deficit ${exact(t) - lower} exceeds ${n / (k + 1)}")
    }
  }

  test("nulls are skipped; k wider than the vocabulary keeps exact counts") {
    val df = (Seq.fill(5)(Some("a")) ++ Seq.fill(3)(Some("b")) ++ Seq(None))
      .toDF("term")
    val cand = candidates(df, 10)
    assert(cand === Map("a" -> 5L, "b" -> 3L))
  }

  test("merge is the Agarwal rule: offsets cancel, no term below zero sneaks back") {
    // two disjoint partitions each saturating k=2 — the merged sketch must
    // still contain the global majority item
    val heavy = Seq.fill(60)("x") ++ (1 to 20).map(i => s"a$i") ++
      (1 to 20).map(i => s"b$i")
    val cand = candidates(heavy.toDF("term").repartition(4), 2)
    assert(cand.contains("x"), s"majority item lost: $cand")
  }

  test("SQL surface: misra_gries aggregates via the extension registry") {
    graft.GraftExtensions.registerTemp(spark)
    zipfTerms.toDF("term").createOrReplaceTempView("mg_terms")
    val rows = spark.sql(
      "SELECT explode(misra_gries(term, 25)) AS c FROM mg_terms")
      .select("c.term").as[String].collect()
    assert(rows.contains("t1"))
  }
}
