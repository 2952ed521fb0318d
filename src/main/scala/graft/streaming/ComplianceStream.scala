package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** One row of the unified compliance stream: a data event
  * (`is_tomb = false`) or a deletion request — a tombstone —
  * (`is_tomb = true`, `event_id` ignored) for the user, effective at
  * `ts_us` (exact integer µs event time). */
case class TombstoneRow(user_id: Long, ts_us: Long, event_id: Long,
                        is_tomb: Boolean)

/** A data event that survived tombstone filtering. */
case class SurvivorRow(user_id: Long, ts_us: Long, event_id: Long)

/** Streaming right-to-be-forgotten enforcement — the streaming twin of
  * [[graft.ops.Deletion]]. A tombstone for a user suppresses every event
  * of that user at or after the tombstone's event time (`ts >= tomb_ts`),
  * from the moment it arrives and forever: state per user is ONE long (the
  * earliest tombstone time) — constant size regardless of stream length,
  * so the operator holds at any scale and the state store never grows past
  * #users × 16 bytes.
  *
  * Delivery contract (the standard compacted-log shape, same as
  * [[TemporalStream.scd2Stream]]): per-user ts-nondecreasing arrival.
  * A tombstone arriving AFTER events it should have covered cannot
  * retract already-emitted rows — an append-mode stream cannot unsay
  * output — so the contract violation fails loudly instead of silently
  * leaking data that should have been scrubbed; late tombstones take the
  * batch [[graft.ops.Deletion.scrub]] path. Within one micro-batch the
  * rows are sorted (ts, tombstones-first, event_id), so an equal-time
  * tombstone covers the equal-time event no matter how the batch
  * interleaved them.
  */
object ComplianceStream {

  def tombstoneFilter(rows: Dataset[TombstoneRow]): Dataset[SurvivorRow] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows
      .groupByKey(_.user_id)
      // state = (earliest tombstone ts — MaxValue sentinel for none, last
      // processed ts for the delivery-contract guard, last EMITTED event
      // ts — the retraction guard: a tombstone covering an already-emitted
      // event cannot be honored, so it must fail, not leak)
      .flatMapGroupsWithState[(Long, Long, Long), SurvivorRow](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[TombstoneRow],
         state: GroupState[(Long, Long, Long)]) =>
          val batch = it.toArray.sortBy(r => (r.ts_us, !r.is_tomb, r.event_id))
          var (minTomb, lastTs, lastEmit) = state.getOption
            .getOrElse((Long.MaxValue, Long.MinValue, Long.MinValue))
          val out = Seq.newBuilder[SurvivorRow]
          batch.foreach { r =>
            require(r.ts_us >= lastTs,
              s"tombstoneFilter: out-of-order arrival for user=$user " +
                s"(ts=${r.ts_us} < last=$lastTs); late data needs the batch " +
                "Deletion.scrub path")
            lastTs = r.ts_us
            if (r.is_tomb) {
              // an EQUAL-time tombstone in a later micro-batch than the
              // event it covers passes the ts-nondecreasing guard but
              // would retract an already-emitted row — fail loudly (in
              // one batch the tombstones-first sort makes this unreachable)
              require(r.ts_us > lastEmit,
                s"tombstoneFilter: tombstone at ts=${r.ts_us} for user=$user " +
                  s"covers an already-emitted event (last emitted ts=$lastEmit); " +
                  "an append stream cannot retract — use the batch " +
                  "Deletion.scrub path")
              minTomb = math.min(minTomb, r.ts_us)
            } else if (r.ts_us < minTomb) {
              out += SurvivorRow(user, r.ts_us, r.event_id)
              lastEmit = r.ts_us
            }
          }
          state.update((minTomb, lastTs, lastEmit))
          out.result().iterator
      }
  }
}
