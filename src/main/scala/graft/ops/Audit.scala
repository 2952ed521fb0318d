package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality constraint verification (the Deequ/dbt-tests shape): N
  * metrics over a table computed in ONE scan — a single `agg` of
  * map-side-combinable aggregates — then unpivoted to `(check_name,
  * metric, passed)` rows. The whole audit of a 100 TB table costs one
  * pass whatever the number of checks; the alternative (one query per
  * constraint) costs N scans, which is why audit frameworks batch
  * metrics exactly this way.
  *
  * Each [[Check]] is an aggregate metric (count, null count, domain /
  * range violation count, `count - countDistinct` for key uniqueness …)
  * plus a pass predicate over the resulting scalar. Cross-table
  * constraints (referential integrity) are expressed by auditing the
  * violation frame itself — e.g. `verify(fact.join(dim, key, "left_anti"),
  * Check("orphans", count(lit(1)), _ === 0))` — and unioning the row in;
  * the anti-join side decides its own strategy (broadcast when the dim
  * fits, shuffle otherwise).
  *
  * Metrics are cast to LONG: every supported constraint is a count-like
  * integer, which keeps the rows engine-portable (a DuckDB oracle
  * replays them exactly — no float thresholds).
  */
object Audit {

  /** One constraint: an aggregate `metric` and a `pass` predicate applied
    * to the computed scalar. `name` must be unique within a verify call. */
  final case class Check(name: String, metric: Column, pass: Column => Column)

  /** All checks in one scan → one row per check: (check_name, metric,
    * passed), in the caller-given check order. */
  def verify(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "audit needs at least one check")
    require(checks.map(_.name).distinct.size == checks.size,
      s"duplicate check names: ${checks.map(_.name).mkString(", ")}")
    val agged = df.agg(
      checks.head.metric.cast("long").as(checks.head.name),
      checks.tail.map(c => c.metric.cast("long").as(c.name)): _*)
    // backtick-quote when re-resolving: a check name with a '.' must read
    // as one column, not a struct-field path
    def quoted(name: String): Column = col("`" + name.replace("`", "``") + "`")
    // unpivot the 1×N aggregate row to N rows; the explode is over an
    // N-element literal-shaped array — driver-free and codegen-friendly
    val rows = agged.select(explode(array(checks.map(c =>
      struct(lit(c.name).as("check_name"), quoted(c.name).as("metric"))): _*)).as("c"))
      .select(col("c.check_name").as("check_name"), col("c.metric").as("metric"))
    val passed = checks.tail.foldLeft(
        when(col("check_name") === checks.head.name,
          checks.head.pass(col("metric")))) { (acc, c) =>
      acc.when(col("check_name") === c.name, c.pass(col("metric")))
    }
    rows.withColumn("passed", passed)
  }
}
