package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** One streaming SCD2 emission: a CLOSED version (`valid_to` set — final,
  * immutable, emitted exactly when its successor's instant is known) or
  * the group's OPEN version snapshot (`valid_to` None — re-emitted each
  * batch; `n` counts ALL rows arrived for the key, kept or not — its only
  * contract is strict monotonicity per emitting invocation, which makes
  * `max_by(_, n)` the monotone stream-end selector). */
case class Scd2StreamUpdate(key: Long, state: Option[String],
    valid_from: Long, valid_to: Option[Long], version: Int, n: Long)

/** Streaming SCD2 maintenance: the [[graft.ops.Temporal.scd2]] build as
  * `flatMapGroupsWithState` — the CDC-consumer form of the dimension
  * build, completing the family (batch q102, incremental-batch q103,
  * streaming q107). State per key is ONE open version (valid_from, attrs,
  * version, running n) — constant size forever; each closed version is
  * emitted exactly once, the moment a strictly-later change finalizes its
  * interval, and the open version is re-emitted per batch as a snapshot.
  * Stream-end dimension = distinct closed emissions ∪ the max-n open
  * snapshot per key — exactly the batch [[graft.ops.Temporal.scd2]] of
  * the same change log (q107 pins stream ≡ batch ≡ SQL).
  *
  * Delivery contract (the standard CDC shape — a key-partitioned log):
  * per-key ts-nondecreasing arrival, and a key's equal-time tie run not
  * split across micro-batches (per-key commit timestamps are unique in
  * real change feeds; the replay harness cuts batches on (key, ts)
  * boundaries). Late/out-of-order changes need the batch [[graft.ops
  * .Temporal.scd2Apply]] instead — a streaming operator cannot retract
  * an already-emitted closed version.
  */
object TemporalStream {

  /** @param events  streaming change log
    * @param keyCol  BIGINT dimension key; null-key rows are DROPPED (the
    *                batch build versions a null-key group — the one
    *                documented stream/batch divergence, alongside null
    *                tie-breaks, which batch keeps in tie order)
    * @param tsCol   BIGINT change time (exact integer µs)
    * @param tieCol  BIGINT equal-time tie-break (last wins the instant;
    *                null rows dropped, see keyCol)
    * @param attrCol STRING versioned attribute (null = a legal state) */
  def scd2Stream(events: DataFrame, keyCol: String, tsCol: String,
                 tieCol: String, attrCol: String): Dataset[Scd2StreamUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col(keyCol).cast("long").as("k"), col(tsCol).cast("long").as("t"),
        col(tieCol).cast("long").as("tie"), col(attrCol).cast("string").as("a"))
      .where(col("k").isNotNull && col("t").isNotNull && col("tie").isNotNull)
      .as[(Long, Long, Long, Option[String])]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Option[String], Int, Long), Scd2StreamUpdate](
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout()) {
        (key: Long, it: Iterator[(Long, Long, Long, Option[String])],
         state: GroupState[(Long, Option[String], Int, Long)]) =>
          val rows = it.toArray.sortBy(r => (r._2, r._3))
          // tie-keep within the batch: last row of each ts run wins
          val kept = rows.indices.collect {
            case i if i == rows.length - 1 || rows(i + 1)._2 != rows(i)._2 =>
              (rows(i)._2, rows(i)._4)
          }
          val out = Seq.newBuilder[Scd2StreamUpdate]
          var st = state.getOption // (openFrom, openAttrs, version, n)
          kept.foreach { case (ts, attrs) =>
            st match {
              case None =>
                st = Some((ts, attrs, 1, 0L))
              case Some((f, _, v, n)) if ts == f =>
                // cross-batch tie (outside the delivery contract, but a
                // defined behavior): later knowledge replaces the instant
                st = Some((f, attrs, v, n))
              case Some((f, a, v, n)) if a == attrs => // compression
                st = Some((f, a, v, n))
              case Some((f, a, v, n)) =>
                // a late change (ts < open valid_from) breaks the delivery
                // contract; closing the open version at ts would emit an
                // inverted interval — fail loudly, don't corrupt the dim
                require(ts > f, s"scd2Stream: out-of-order change for key=$key " +
                  s"(ts=$ts < open valid_from=$f); late data needs the batch " +
                  "Temporal.scd2Apply path")
                out += Scd2StreamUpdate(key, a, f, Some(ts), v, n)
                st = Some((ts, attrs, v + 1, n))
            }
          }
          // running n counts ALL arrived rows (kept or not): strictly
          // increasing on every invocation that saw data
          val bumped = st.map { case (f, a, v, n) => (f, a, v, n + rows.length) }
          bumped.foreach { case s @ (f, a, v, n) =>
            state.update(s)
            out += Scd2StreamUpdate(key, a, f, None, v, n)
          }
          out.result().iterator
      }
  }

  /** Stream-end dimension from an update-mode sink of [[scd2Stream]]
    * emissions: distinct closed versions (immutable and deterministic, so
    * task-replay duplicates collapse) ∪ the max-n open snapshot per key.
    * The ONE definition of the read-out — q107 and StreamsSpec both use
    * it, so the driver-checked reconstruction and the stream≡batch pin
    * can never drift apart. Columns: (key, state, valid_from, valid_to,
    * version). */
  def scd2StreamEnd(sink: DataFrame): DataFrame = {
    val closed = sink.where(col("valid_to").isNotNull)
      .select("key", "state", "valid_from", "valid_to", "version").distinct()
    val open = sink.where(col("valid_to").isNull)
      .groupBy(col("key"))
      .agg(expr("max_by(struct(state, valid_from, version), n)").as("o"))
      .select(col("key"), col("o.state").as("state"),
        col("o.valid_from").as("valid_from"),
        lit(null).cast("long").as("valid_to"), col("o.version").as("version"))
    closed.unionByName(open)
  }
}
