package graft.catalog

import java.time.LocalDate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Base26

/** E1 — the catalog build (reference: `main_fct.SL_create_csv`,
  * main_function_original.py:14–80; SURVEY.md §3 E1).
  *
  * Given a file-name listing for one sensor, produce the weekly-class catalog
  * `(class, path, data)`:
  *   - parse the acquisition date from each name (O10),
  *   - histogram dates into Thursday-anchored weekly bins, keeping empty bins
  *     (O16, SURVEY.md §0.2),
  *   - label bins with bijective base-26 letters where the letter counter
  *     advances only on NON-empty bins; an empty bin gets the literal class
  *     `"0"` and one placeholder row with data `"0"` (O17/O18, SURVEY.md §0.1),
  *   - order rows by (bin, name) — reproducing the reference's sorted-name
  *     row order exactly (main_function_original.py:38–48).
  *
  * Scale note: the catalog is a per-sensor file listing (thousands–millions of
  * rows at most). The only shuffle is the groupBy(bin) histogram; the bin/label
  * dimension (53 rows here, bounded by #weeks in the range) is broadcast back
  * onto the listing, so the labeling window function runs on the tiny bin
  * table, never on the full listing.
  */
object CatalogBuilder {

  /** Labeled bin dimension: (bin, bin_start, cnt, class). */
  def labeledBins(dates: DataFrame, dateCol: String, firstEdge: LocalDate, nBins: Int): DataFrame = {
    val hist = WeekBins.histogram(dates, dateCol, firstEdge, nBins)
    // Rank of each non-empty bin among non-empty bins, in bin order, via the
    // bounded no-window rank over the ≤ nBins dimension (never an
    // unpartitioned WindowExec), broadcast-joined back onto the bin table.
    val ranked = graft.ops.Ranking.boundedRank(
      hist.where(col("cnt") > 0).select("bin"), "nonEmptyRank", col("bin"))
    hist.join(broadcast(ranked), Seq("bin"), "left")
      .withColumn("class",
        when(col("cnt") > 0, Base26.base26(col("nonEmptyRank"))).otherwise(lit("0")))
      .select("bin", "bin_start", "cnt", "class")
  }

  /** Build one sensor catalog.
    *
    * @param names   DataFrame with a string column `data` (bare entry names)
    * @param dateOf  expression deriving the acquisition date from `data`
    * @param path    the constant parent-dir column value
    * @param firstEdge,nBins  weekly bin range (see WeekBins.numpyWeekRange)
    * @return columns (class, path, data, date, bin) ordered like the golden
    *         CSVs; project (class, path, data) for byte parity.
    */
  def build(names: DataFrame, dateOf: Column => Column, path: String,
            firstEdge: LocalDate, nBins: Int): DataFrame = {
    val dated = names
      .withColumn("date", dateOf(col("data")))
      .withColumn("bin", WeekBins.weekIndex(col("date"), firstEdge, nBins))
      .where(col("bin").isNotNull) // np.histogram drops out-of-range dates

    val bins = labeledBins(dated, "date", firstEdge, nBins)

    val filled = dated.join(broadcast(bins.select("bin", "class")), Seq("bin"))
      .select(col("class"), lit(path).as("path"), col("data"), col("date"), col("bin"))

    val placeholders = bins.where(col("cnt") === 0)
      .select(lit("0").as("class"), lit(path).as("path"), lit("0").as("data"),
        lit(null).cast("date").as("date"), col("bin"))

    filled.unionByName(placeholders).orderBy("bin", "data")
  }

  /** O15 — the reference's "pairs" metric, faithful mode (quirk Q1,
    * main_function_original.py:64–70): Σ over L *rows* of
    * count_L(class) × count_S(class) = Σ_c L_c² · S_c, `"0"` classes included.
    * Golden catalogs give 386. */
  def pairsMetricFaithful(l: DataFrame, s: DataFrame): Long =
    scalar(pairsMetricFaithfulDF(l, s))

  /** Lazy one-row form of [[pairsMetricFaithful]] (column `pairs`, null →
    * 0 folded in) — composable into a larger plan with no driver action. */
  def pairsMetricFaithfulDF(l: DataFrame, s: DataFrame): DataFrame = {
    val lc = l.groupBy("class").agg(count(lit(1)).as("lcnt"))
    val sc = s.groupBy("class").agg(count(lit(1)).as("scnt"))
    lc.join(sc, Seq("class"))
      .agg(coalesce(sum(col("lcnt") * col("lcnt") * col("scnt")), lit(0L)).as("pairs"))
  }

  /** Honest class-join cardinality: Σ_c L_c · S_c; optionally excluding the
    * `"0"` placeholder class (quirk Q2). Golden: 202 with, 190 without. */
  def joinCardinality(l: DataFrame, s: DataFrame, includePlaceholders: Boolean): Long =
    scalar(joinCardinalityDF(l, s, includePlaceholders))

  /** Lazy one-row form of [[joinCardinality]] (column `pairs`). */
  def joinCardinalityDF(l: DataFrame, s: DataFrame, includePlaceholders: Boolean): DataFrame = {
    val filt: DataFrame => DataFrame =
      df => if (includePlaceholders) df else df.where(col("class") =!= "0")
    val lc = filt(l).groupBy("class").agg(count(lit(1)).as("lcnt"))
    val sc = filt(s).groupBy("class").agg(count(lit(1)).as("scnt"))
    lc.join(sc, Seq("class"))
      .agg(coalesce(sum(col("lcnt") * col("scnt")), lit(0L)).as("pairs"))
  }

  private def scalar(df: DataFrame): Long = df.collect()(0).getLong(0)
}
