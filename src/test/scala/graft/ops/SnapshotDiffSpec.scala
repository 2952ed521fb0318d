package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  private def fp(c: org.apache.spark.sql.Column) =
    graft.text.TextAnalysis.contentFingerprint(c)

  test("diff classifies added/removed/changed and skips identical rows") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("k", "v").withColumn("fp", fp(col("v")))
    val cur = Seq((1L, "a"), (2L, "B"), (4L, "d"), (5L, "e"))
      .toDF("k", "v").withColumn("fp", fp(col("v")))
    val got = SnapshotDiff.diff(base, cur, "k", "fp", nBuckets = 8)
      .as[(Long, String)].collect().toSet
    assert(got == Set((2L, "changed"), (3L, "removed"), (5L, "added")))
  }

  test("identical snapshots diff to empty — every bucket is clean") {
    val df = (1L to 200L).map(i => (i, s"doc $i")).toDF("k", "v")
      .withColumn("fp", fp(col("v")))
    assert(SnapshotDiff.diff(df, df, "k", "fp", nBuckets = 16).count() == 0L)
  }

  test("two-phase result equals the direct diff at any bucket count") {
    val base = (1L to 300L).map(i => (i, s"text $i")).toDF("k", "v")
    val cur = (1L to 300L).filter(_ % 13 != 0) // removed
      .map(i => (i, if (i % 17 == 0) s"text $i!" else s"text $i")) // changed
      .toDF("k", "v")
      .unionByName(Seq((999L, "new")).toDF("k", "v")) // added
    def withFp(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("fp", fp(col("v")))
    val direct = withFp(base).select(col("k"), col("v").as("bv"))
      .join(withFp(cur).select(col("k"), col("v").as("cv")), Seq("k"), "full_outer")
      .select(col("k"), when(col("bv").isNull, "added")
        .when(col("cv").isNull, "removed")
        .when(col("bv") =!= col("cv"), "changed").as("status"))
      .where(col("status").isNotNull)
      .as[(Long, String)].collect().toSet
    for (n <- Seq(1, 4, 64)) {
      val got = SnapshotDiff.diff(withFp(base), withFp(cur), "k", "fp", n)
        .as[(Long, String)].collect().toSet
      assert(got == direct, s"nBuckets=$n")
    }
  }

  test("nBuckets must be positive") {
    val df = Seq((1L, 1L)).toDF("k", "fp")
    intercept[IllegalArgumentException] {
      SnapshotDiff.diff(df, df, "k", "fp", nBuckets = 0)
    }
  }
}
