package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RankingSpec extends SparkSpec {
  import spark.implicits._

  test("globalRank ≡ row_number over the total order, at any input partitioning") {
    val n = 5000
    // skewed scores (many ties) force the doc_id tiebreaker to matter
    val df = (1 to n).map(i => (i.toLong, (i % 7).toLong)).toDF("id", "score")
    val expected = (1 to n)
      .sortBy(i => (i % 7, i)).map(_.toLong).zipWithIndex
      .map { case (id, r) => id -> (r + 1L) }.toMap
    for (parts <- Seq(1, 3, 16)) {
      val got = Ranking.globalRank(df.repartition(parts), "rank",
          col("score"), col("id"))
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got == expected, s"input partitions = $parts")
    }
  }

  test("globalRank: ranks are 1..n with no gaps; empty and single-row inputs") {
    val df = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("id", "v")
    val ranks = Ranking.globalRank(df, "rank", col("v").desc)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(ranks == Set((30L, 1L), (20L, 2L), (10L, 3L)))
    assert(Ranking.globalRank(Seq.empty[(Long, Long)].toDF("id", "v"),
      "rank", col("v")).count() == 0)
    intercept[IllegalArgumentException] {
      Ranking.globalRank(df, "rank")
    }
    // output-name collision is rejected up front, not at first downstream use
    intercept[IllegalArgumentException] {
      Ranking.globalRank(df, "v", col("v"))
    }
  }
}
