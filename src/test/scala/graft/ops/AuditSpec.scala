package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AuditSpec extends SparkSpec {
  import Audit.Check
  import spark.implicits._

  test("audit: violations counted exactly, pass flags follow the predicates") {
    val df = Seq(
      (1L, Some("A"), 10.0),
      (2L, Some("X"), -5.0), // domain + range violation
      (2L, None, 60.0),      // dup key + null + range violation
      (3L, Some("N"), 25.0)
    ).toDF("k", "flag", "qty")
    val got = Audit.verify(df, Seq(
      Check("rowcount", count(lit(1)), _ > 0),
      Check("nulls", sum(when(col("flag").isNull, 1L).otherwise(0L)), _ === 0),
      Check("domain_viol",
        sum(when(!coalesce(col("flag"), lit("A")).isin("A", "N", "R"), 1L)
          .otherwise(0L)), _ === 0),
      Check("range_viol",
        sum(when(col("qty") < 1 || col("qty") > 50, 1L).otherwise(0L)), _ === 0),
      Check("pk_dups", count(lit(1)) - countDistinct(col("k")), _ === 0)
    )).collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got("rowcount") == ((4L, true)))
    assert(got("nulls") == ((1L, false)))
    assert(got("domain_viol") == ((1L, false)))
    assert(got("range_viol") == ((2L, false)))
    assert(got("pk_dups") == ((1L, false)))
  }

  test("audit: check order preserved, duplicate names rejected, empty rejected") {
    val df = Seq(1L).toDF("k")
    val names = Audit.verify(df, Seq(
      Check("z_first", count(lit(1)), _ > 0),
      Check("a_second", count(lit(1)), _ > 0)
    )).collect().map(_.getString(0)).toSeq
    assert(names == Seq("z_first", "a_second"))
    intercept[IllegalArgumentException] {
      Audit.verify(df, Seq(
        Check("dup", count(lit(1)), _ > 0),
        Check("dup", count(lit(1)), _ > 0)))
    }
    intercept[IllegalArgumentException] { Audit.verify(df, Seq.empty) }
  }

  test("audit: a dotted check name reads as one column, not a field path") {
    val df = Seq(1L, 2L).toDF("k")
    val got = Audit.verify(df, Seq(
      Check("li.qty_range", count(lit(1)), _ === 2)
    )).collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(got.toSeq == Seq(("li.qty_range", 2L, true)))
  }

  test("audit: N checks cost ONE scan of the input") {
    val df = spark.read.parquet(sf("lineitem"))
    val plan = Audit.verify(df, Seq(
      Check("c1", count(lit(1)), _ > 0),
      Check("c2", sum(when(col("l_quantity") > 50, 1L).otherwise(0L)), _ === 0),
      Check("c3", sum(when(col("l_shipdate").isNull, 1L).otherwise(0L)), _ === 0)
    )).queryExecution.executedPlan.toString
    val scans = "FileScan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected one scan, plan:\n$plan")
  }
}
