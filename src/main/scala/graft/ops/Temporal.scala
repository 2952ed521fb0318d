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
    *                 LAST in tie order wins the instant; losing ties are
    *                 discarded BEFORE compression — they were never
    *                 observable, so they must not anchor a version)
    * @param attrs    the versioned attribute columns
    * @return keys ++ attrs ++ (valid_from = tsCol's name, valid_to
    *         — null on each key's current version —, version 1..n,
    *         is_current). Maximally compressed: no two consecutive
    *         versions of a key carry equal attrs, which makes the output
    *         IDEMPOTENT as a change log — rebuilding from the dimension's
    *         own (valid_from, attrs) rows reproduces it exactly, the
    *         property [[scd2Apply]] rests on.
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
    val reserved = Seq("valid_from", "valid_to", "version", "is_current",
      "_scd_prev", "_scd_next_ts")
    val clash = changes.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"input columns ${clash.mkString(",")} collide with scd2 output names " +
        s"(${reserved.mkString(",")}) — rename or drop them first")
    // every window below shares this partitioning (and a prefix of this
    // order), so the whole build rides ONE hash Exchange on the key
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col(tieBreak))
    val state = struct(attrs.map(col): _*)
    changes
      // a null change time has no place on the timeline: it would sort
      // first and anchor a version at null — silent, order-dependent
      // nonsense. Drop such rows explicitly instead.
      .where(col(tsCol).isNotNull)
      // equal-time ties FIRST: keep only the last row of each (key, ts)
      // run — the losing ties were never observable, and discarding them
      // BEFORE compression is what makes the output maximally compressed
      // (a tie surviving to the interval step would close as zero-width
      // and could leave two adjacent versions with equal attrs)
      .withColumn("_scd_next_ts", lead(col(tsCol), 1).over(w))
      .where(col("_scd_next_ts").isNull || col("_scd_next_ts") =!= col(tsCol))
      // change-point compression: ts values are now distinct per key
      .withColumn("_scd_prev", lag(state, 1).over(w))
      // first row of a key: lag is null (a STRUCT value itself is never
      // null here, so null unambiguously means "no previous row")
      .where(col("_scd_prev").isNull || !(state <=> col("_scd_prev")))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("version", row_number().over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select((keys ++ attrs).map(col) ++ Seq(
        col(tsCol).as("valid_from"), col("valid_to"),
        col("version"), col("is_current")): _*)
  }

  /** Incremental SCD2 maintenance: apply a new change batch to an existing
    * [[scd2]] output WITHOUT rebuilding the whole dimension. Keys absent
    * from the batch pass through untouched (their rows never shuffle);
    * touched keys are re-derived from (their current versions read back as
    * a change log) ∪ (the new changes) — the daily-dimension-feed pattern,
    * the same touched-keys-only discipline as [[Layout.upsert]].
    *
    * Equal-time rule: a new change at an existing version's `valid_from`
    * REPLACES that version (later knowledge wins the instant — the old
    * version becomes zero-width and is dropped by [[scd2]]'s tie rule).
    *
    * Append-case equivalence (pinned in TemporalSpec): when every new
    * change is strictly after its key's current `valid_from` — or at it
    * with a `tieBreak` that also wins the combined tie order (e.g. a
    * monotone event id) — `scd2Apply(scd2(A), B) ≡ scd2(A ∪ B)`. A new
    * change REPLACING an equal-time old version whose original tieBreak
    * was larger is the new-knowledge-wins rule, which the full rebuild
    * (ordering old and new rows by the raw tieBreak) does not share. For
    * LATE changes that land strictly before a key's current version the
    * two can also differ — [[scd2]]
    * compression is lossy (a restated value carries no information at
    * build time, but would re-anchor an interval once a late change
    * interleaves); that history is unrecoverable from the dimension alone,
    * which is inherent to SCD2, not to this implementation.
    *
    * @param dim        an [[scd2]] output (same keys/attrs)
    * @param newChanges change batch shaped like [[scd2]]'s `changes`
    * @return same shape as [[scd2]], with `tsCol`'s name = `valid_from`
    */
  def scd2Apply(dim: DataFrame, newChanges: DataFrame, keys: Seq[String],
                tsCol: String, tieBreak: String, attrs: Seq[String]): DataFrame = {
    val tieClash = (dim.columns ++ newChanges.columns).filter(_ == "_scd_tie")
    require(tieClash.isEmpty,
      "_scd_tie is reserved by scd2Apply's old-vs-new tie ordering — " +
        "rename that input column first")
    val touchedKeys = newChanges.select(keys.map(col): _*).distinct()
    val untouched = dim.join(broadcast(touchedKeys), keys, "left_anti")
    // current versions as a change log: valid_from is strictly increasing
    // within a key, so old rows need no tie order among THEMSELVES; the
    // (src, tie) struct only has to put new changes after old versions at
    // equal times (0 < 1) and order new-vs-new ties by the caller's column
    val tbType = newChanges.schema(tieBreak).dataType
    val oldLog = dim.join(broadcast(touchedKeys), keys, "left_semi")
      .select(keys.map(col) ++ Seq(col("valid_from").as(tsCol),
        struct(lit(0).as("src"), lit(null).cast(tbType).as("tb")).as("_scd_tie")) ++
        attrs.map(col): _*)
    val newLog = newChanges
      .select(keys.map(col) ++ Seq(col(tsCol),
        struct(lit(1).as("src"), col(tieBreak).as("tb")).as("_scd_tie")) ++
        attrs.map(col): _*)
    val rebuilt = scd2(oldLog.unionByName(newLog), keys, tsCol, "_scd_tie", attrs)
    untouched.unionByName(rebuilt)
  }
}
