package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Mix64

/** Right-to-be-forgotten propagation — the compliance primitive of a
  * training-data pipeline. A deletion-request list (subject keys: user ids,
  * document ids) must be scrubbed not just from the fact table but from
  * EVERY derived table built from it (rollups, profiles, attribution
  * pairs), and the operation must produce an auditable record proving each
  * table was swept.
  *
  * Scale design: the request list is small by nature (requests, not the
  * corpus), so both paths are broadcast hash joins against it — the corpus
  * side never shuffles, scans stay single-pass, and the audit's counts and
  * checksum are map-side partial aggregates. At 100 TB per table this costs
  * one scan per table and no Exchange.
  */
object Deletion {

  /** A table enrolled in propagation: its audit name, the frame, the
    * subject-key column the requests match on, and an integer row key the
    * survivor checksum is computed over (must be BIGINT-valued and stable
    * across engines — e.g. a primary key or a collision-tolerant composite
    * like `user_id * 131072 + day`). */
  final case class Subject(name: String, df: DataFrame,
                           subjectKey: Column, rowKey: Column)

  /** The scrub itself: rows of `df` whose subject key is NOT in `requests`
    * (single-column frame; duplicates tolerated — deduped before the
    * broadcast). Plans as a broadcast LEFT ANTI join: no corpus shuffle. */
  def scrub(df: DataFrame, subjectKey: Column, requests: DataFrame): DataFrame =
    df.join(broadcast(requestKeys(requests)),
      subjectKey === col("__del_key"), "left_anti")

  /** One audit row per subject table:
    * `(tbl, rows_before, rows_after, rows_deleted, survivor_checksum)`
    * where the checksum is the sum of the low 20 bits of each SURVIVING
    * row's Mix64 key coordinate — an order-free fingerprint a second
    * engine can recompute to verify the sweep touched exactly the
    * requested subjects. 20 bits per row keeps the BIGINT sum exact (no
    * ANSI overflow) to ~8.8×10^12 rows per table — comfortably past the
    * 100 TB row counts this operator is sized for.
    * Computed in ONE scan per table: a broadcast left join marks deleted
    * rows, and before/after/checksum fold into a single global aggregate
    * (count, conditional count, conditional sum — all partial-aggregable). */
  def propagate(subjects: Seq[Subject], requests: DataFrame): DataFrame = {
    require(subjects.nonEmpty, "Deletion.propagate: no subject tables")
    val req = broadcast(requestKeys(requests))
    subjects.map { sub =>
      sub.df
        .select(sub.subjectKey.as("__subject"),
          pmod(Mix64.sampleCoord(sub.rowKey.cast("long")), lit(1048576L))
            .as("__row_coord"))
        .join(req, col("__subject") === col("__del_key"), "left")
        .agg(
          count(lit(1)).as("rows_before"),
          count(when(col("__del_key").isNull, lit(1))).as("rows_after"),
          coalesce(sum(when(col("__del_key").isNull, col("__row_coord"))),
            lit(0L)).as("survivor_checksum"))
        .select(lit(sub.name).as("tbl"), col("rows_before"), col("rows_after"),
          (col("rows_before") - col("rows_after")).as("rows_deleted"),
          col("survivor_checksum"))
    }.reduce(_.unionByName(_))
  }

  private def requestKeys(requests: DataFrame): DataFrame = {
    require(requests.columns.length == 1,
      s"Deletion: requests must be a single-column key frame, got " +
        s"[${requests.columns.mkString(", ")}]")
    requests.toDF("__del_key").distinct()
  }
}
