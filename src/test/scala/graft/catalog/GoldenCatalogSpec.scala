package graft.catalog

import java.nio.file.{Files, Paths}
import java.time.LocalDate

import scala.jdk.CollectionConverters._

import graft.SparkSpec

/** Golden-catalog round-trip (SURVEY.md §5.1): the `data` columns of the
  * reference's committed outputs ARE the input fixture. Feeding those names
  * through our E1 build must reproduce both golden CSVs row-for-row
  * (class, path, data — including `"0"` placeholder rows and row order).
  *
  * The goldens are read from the read-only reference checkout; suites skip
  * (pending) if it is absent.
  */
class GoldenCatalogSpec extends SparkSpec {
  import spark.implicits._

  private val refDir = "/root/reference/data_pair"
  private def gold(f: String): Option[Seq[(String, String, String)]] = {
    val p = Paths.get(refDir, f)
    if (!Files.exists(p)) None
    else Some {
      Files.readAllLines(p).asScala.toSeq.drop(1).filter(_.nonEmpty).map { line =>
        val Array(c, pa, d) = line.split(",", 3)
        (c, pa, d)
      }
    }
  }

  private val (firstEdge, nBins) = WeekBins.Ref2023

  test("numpy week range: 53 Thursday-anchored bins from 2022-12-29") {
    assert(firstEdge == LocalDate.parse("2022-12-29"))
    assert(nBins == 53)
    assert(firstEdge.getDayOfWeek == java.time.DayOfWeek.THURSDAY)
  }

  private def rebuild(goldRows: Seq[(String, String, String)],
                      dateOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
  : Seq[(String, String, String)] = {
    val names = goldRows.collect { case (_, _, d) if d != "0" => d }
    val path = goldRows.head._2
    val df = names.toDF("data")
    CatalogBuilder.build(df, dateOf, path, firstEdge, nBins)
      .select("class", "path", "data")
      .collect().toSeq.map(r => (r.getString(0), r.getString(1), r.getString(2)))
  }

  test("S_out.csv reproduced exactly (110 names + 4 placeholders)") {
    gold("S_out.csv") match {
      case None => pending
      case Some(rows) =>
        val got = rebuild(rows, DateParse.s2AcqDate)
        assert(got.size == rows.size)
        assert(got == rows)
    }
  }

  test("L_out.csv reproduced exactly (85 names + 3 placeholders)") {
    gold("L_out.csv") match {
      case None => pending
      case Some(rows) =>
        val got = rebuild(rows, DateParse.hlsAcqDate)
        assert(got.size == rows.size)
        assert(got == rows)
    }
  }

  test("golden metrics: faithful pairs 386; join cardinality 202/190") {
    (gold("L_out.csv"), gold("S_out.csv")) match {
      case (Some(lRows), Some(sRows)) =>
        val l = lRows.toDF("class", "path", "data")
        val s = sRows.toDF("class", "path", "data")
        assert(CatalogBuilder.pairsMetricFaithful(l, s) == 386L)
        assert(CatalogBuilder.joinCardinality(l, s, includePlaceholders = true) == 202L)
        assert(CatalogBuilder.joinCardinality(l, s, includePlaceholders = false) == 190L)
      case _ => pending
    }
  }
}
