package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing dimension (SCD2) build: turn a change LOG
  * (key, change-time, attributes) into versioned validity INTERVALS
  * `[valid_from, valid_to)` — the dimension shape a training pipeline
  * needs for point-in-time-correct feature joins (a fact row must see the
  * attribute values that were live AT ITS TIMESTAMP, never a later
  * version — the classic label-leakage bug).
  *
  * Spark-first plan: both steps — change-point compression and interval
  * derivation — are windows over the SAME (key, time, tie) order, so
  * Catalyst plans ONE hash Exchange on the key and reuses its sort; per
  * key the work is a linear sweep, O(|changes_k|), no self-join and no
  * |versions|² blow-up. At 100 TB the change log shuffles once, keyed
  * exactly like the downstream point-in-time join that consumes it.
  *
  * Consuming the result: a point-in-time lookup of facts against this
  * dimension is [[AsOfJoin.backward]] on `valid_from` (the interval upper
  * bounds are redundant under as-of semantics — lead() guarantees the
  * next version's `valid_from` closes the previous one), which keeps the
  * fact side on a single key shuffle too.
  */
object Temporal {

  /** Build SCD2 rows from a change log.
    *
    * Consecutive rows of a key whose `attrs` are unchanged are compressed
    * away first (null-safe struct compare, so a null attribute value is a
    * legal state, distinct from every non-null one) — re-stating the same
    * value is not a new version, and an uncompressed log would otherwise
    * manufacture zero-information versions.
    *
    * @param changes  change log; one row per observed state
    * @param keys     dimension key columns
    * @param tsCol    change-time column (orderable; exact integer µs, not
    *                 floats/doubles); rows with a NULL change time are
    *                 dropped — they have no position on the timeline
    * @param tieBreak column ordering equal-time changes of one key (the
    *                 LAST in tie order wins the instant; earlier ties
    *                 become zero-width `[t, t)` versions, dropped)
    * @param attrs    the versioned attribute columns
    * @return keys ++ attrs ++ (valid_from = tsCol's name, valid_to
    *         — null on each key's current version —, version 1..n,
    *         is_current); zero-width versions removed
    */
  def scd2(changes: DataFrame, keys: Seq[String], tsCol: String,
           tieBreak: String, attrs: Seq[String]): DataFrame = {
    require(keys.nonEmpty && attrs.nonEmpty, "keys and attrs must be non-empty")
    require(!attrs.contains(tsCol) && !keys.contains(tsCol),
      s"$tsCol cannot be both the change time and a key/attribute")
    require(tieBreak != tsCol,
      "tieBreak must be a different column from the change time — ordering " +
        "by (t, t) leaves equal-time changes with no deterministic winner")
    // the output appends these names (and the compress step uses _scd_prev);
    // an input column with the same name would be silently clobbered by
    // withColumn — e.g. re-versioning a table that already IS an SCD2
    val reserved =
      Seq("valid_from", "valid_to", "version", "is_current", "_scd_prev")
    val clash = changes.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"input columns ${clash.mkString(",")} collide with scd2 output names " +
        s"(${reserved.mkString(",")}) — rename or drop them first")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col(tieBreak))
    val state = struct(attrs.map(col): _*)
    val compressed = changes
      // a null change time has no place on the timeline: it would sort
      // first, take valid_to = the first real change, and then be dropped
      // by the zero-width filter's three-valued `null < x` — silent,
      // order-dependent data loss. Drop such rows explicitly instead.
      .where(col(tsCol).isNotNull)
      .withColumn("_scd_prev", lag(state, 1).over(w))
      // first row of a key: lag is null (a STRUCT value itself is never
      // null here, so null unambiguously means "no previous row")
      .where(col("_scd_prev").isNull || !(state <=> col("_scd_prev")))
      .drop("_scd_prev")
    compressed
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      // equal-time ties: every tie but the last closes instantly as
      // [t, t) — an interval no fact time can fall into; drop it, THEN
      // number versions, so the visible history is gapless 1..n. (A
      // dropped tie can leave two consecutive versions with equal attrs
      // — correct for every lookup, just not re-compressed.)
      .where(col("valid_to").isNull || col(tsCol) < col("valid_to"))
      .withColumn("version", row_number().over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select((keys ++ attrs).map(col) ++ Seq(
        col(tsCol).as("valid_from"), col("valid_to"),
        col("version"), col("is_current")): _*)
  }
}
