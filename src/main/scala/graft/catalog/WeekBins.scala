package graft.catalog

import java.time.LocalDate

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Thursday-anchored weekly binning, reproducing NumPy `datetime64[W]`
  * semantics (reference: main_function_original.py:19,31–32; SURVEY.md §0.2).
  *
  * NumPy weeks are epoch-anchored: 1970-01-01 was a Thursday, so every week
  * runs [Thursday, next Thursday). `np.histogram(dates, edges)` uses half-open
  * bins except the LAST bin, which is right-closed; dates outside
  * [first, last] edges are dropped.
  */
object WeekBins {

  /** Epoch day of a date; day 0 = 1970-01-01 (a Thursday). */
  private def epochDay(d: LocalDate): Long = d.toEpochDay

  /** Floor a date to its epoch-anchored (Thursday-started) week start —
    * exactly `np.datetime64(d, 'W')`. */
  def thursdayFloor(d: LocalDate): LocalDate =
    d.minusDays(Math.floorMod(epochDay(d), 7))

  /** Reproduce `np.arange(start, stop, dtype='datetime64[W]')`: week starts
    * from thursdayFloor(start) (inclusive) while strictly before
    * thursdayFloor(stop). Returns (firstEdge, nBins) where the histogram over
    * the edge list has nBins = #edges - 1 bins. */
  def numpyWeekRange(start: LocalDate, stop: LocalDate): (LocalDate, Int) = {
    val first = thursdayFloor(start)
    val last = thursdayFloor(stop) // exclusive bound on edges
    val nEdges = ((epochDay(last) - epochDay(first)) / 7).toInt // edges strictly before `last`
    (first, nEdges - 1)
  }

  /** Histogram bin index of `date` over `nBins` weekly bins starting at
    * `firstEdge` (a Thursday). NULL when out of range; the last bin is
    * right-closed (numpy histogram semantics). */
  def weekIndex(date: Column, firstEdge: LocalDate, nBins: Int): Column = {
    val d = datediff(date, lit(java.sql.Date.valueOf(firstEdge)))
    when(d < 0 || d > nBins * 7, lit(null))
      .when(d === nBins * 7, lit(nBins - 1)) // right edge of last bin is closed
      .otherwise((d / 7).cast("int"))
  }

  /** Epoch-anchored absolute week index (no fixed range) — the scalable form
    * used when a bin table is not needed: `floor(epochDay / 7)`. Matches
    * Spark's own `window(col, "7 days")` anchor. */
  def epochWeek(date: Column): Column =
    floor(datediff(date, lit(java.sql.Date.valueOf(LocalDate.ofEpochDay(0)))) / 7).cast("long")

  /** The 53-bin 2023 range the reference pins: np.arange('2023-01-01',
    * '2024-01-15') → first edge 2022-12-29, 53 bins (SURVEY.md §0.2). */
  val Ref2023: (LocalDate, Int) =
    numpyWeekRange(LocalDate.parse("2023-01-01"), LocalDate.parse("2024-01-15"))

  /** Bin dimension table: (bin INT, bin_start DATE, bin_end DATE). Generated
    * with `sequence` on the driver side of the plan — tiny, broadcast-able. */
  def binTable(spark: SparkSession, firstEdge: LocalDate, nBins: Int): DataFrame = {
    spark.range(nBins.toLong)
      .select(
        col("id").cast("int").as("bin"),
        date_add(lit(java.sql.Date.valueOf(firstEdge)), (col("id") * 7).cast("int")).as("bin_start"),
        date_add(lit(java.sql.Date.valueOf(firstEdge)), (col("id") * 7 + 7).cast("int")).as("bin_end"))
  }

  /** `np.histogram(dates, weekly_edges)` with empty bins retained:
    * (bin, bin_start, cnt). `dates` must expose a date column named by
    * `dateCol`. One shuffle (the groupBy); the bin table join is a broadcast.
    */
  def histogram(dates: DataFrame, dateCol: String, firstEdge: LocalDate, nBins: Int): DataFrame = {
    val spark = dates.sparkSession
    val counts = dates
      .select(weekIndex(col(dateCol), firstEdge, nBins).as("bin"))
      .where(col("bin").isNotNull)
      .groupBy("bin").agg(count(lit(1)).as("cnt"))
    binTable(spark, firstEdge, nBins)
      .join(counts, Seq("bin"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      .select("bin", "bin_start", "cnt")
  }
}
