package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.{CountMin, Hll, Kmv, MisraGries}

/** Per-batch KMV update for one group. `est` is exact below saturation. */
case class KmvUpdate(group: String, n_kept: Int, kth_min: Option[Long], est: Double)

/** Per-batch Misra–Gries update for one group: candidate terms (sorted)
  * with their lower-bound counts, plus the running total item count `n`.
  * `n` is strictly increasing across a group's updates — it is the
  * monotone stream-end selector (the summary itself is order-sensitive,
  * so no field OF it can be), and the n/(k+1) guarantee threshold. */
case class MgUpdate(group: String, n_counters: Int,
    candidates: Seq[String], cnt_lower: Seq[Long], n: Long)

/** Per-batch histogram update for one group: running count and quantile
  * estimates off the fixed-range histogram. */
case class HistUpdate(group: String, n: Long, n_clamped: Long,
    p50_est: Double, p95_est: Double)

/** Per-batch log-bucket histogram update for one group: running count
  * and the p50/p95 bucket-upper-edge estimates in the cents-quantized
  * integer domain (q179's lattice — exact, engine-portable). */
case class LogHistUpdate(group: String, n: Long,
    p50_est_q: Long, p95_est_q: Long)

/** Per-batch Count-Min update for one group: the running cell matrix
  * (row-major depth×width) and the running item count `n` — strictly
  * increasing per update, the monotone stream-end selector. */
case class CmUpdate(group: String, n: Long, cm: Seq[Long])

/** Per-batch trending update for one group: the decayed score and count
  * read off the group's day-cell state at the CURRENT reference day. `n`
  * is strictly increasing per update — the monotone stream-end selector
  * (the score itself can move in either direction as the reference day
  * advances). */
case class TrendUpdate(group: String, n: Long, decay_micro: Long)

/** Per-batch HyperLogLog update for one group: the running register array
  * (indexed by bucket) and the running item count `n` — strictly
  * increasing per update, the monotone stream-end selector. */
case class HllUpdate(group: String, n: Long, regs: Seq[Int])

/** Streaming distinct-count sketching: the [[graft.functions.KmvDistinct]]
  * bottom-k estimator maintained as `mapGroupsWithState` state, one bounded
  * buffer (≤ k longs) per group, updated per micro-batch and emitting the
  * running estimate. This is how cardinality monitoring runs on an
  * unbounded stream at scale: state size is k·|groups| longs FOREVER —
  * compare a streaming `approx_count_distinct` materialization or exact
  * dropDuplicates, whose state grows with the key universe.
  *
  * The fold uses the SAME [[Kmv.add]]/[[Kmv.stats]] as the batch aggregate,
  * so stream-end state ≡ the batch sketch over the same rows regardless of
  * micro-batch slicing (pinned in StreamsSpec) — and therefore ≡ the q59
  * DuckDB oracle too.
  */
object SketchStream {

  /** @param events streaming DataFrame
    * @param keyCol BIGINT column whose distincts are estimated
    * @param byCol  STRING grouping column
    * @param k      sketch size (bottom-k) */
  def distinctSketch(events: DataFrame, keyCol: String, byCol: String,
                     k: Int): Dataset[KmvUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col(byCol).as("g"), col(keyCol).cast("long").as("key"))
      // null keys are skipped by the batch aggregate; a primitive-Long
      // encoder would instead kill the query on the first null — filter
      // so stream ≡ batch holds on feeds containing nulls
      .where(col("key").isNotNull)
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[Array[Long], KmvUpdate](GroupStateTimeout.NoTimeout()) {
        (group: String, it: Iterator[(String, Long)], state: GroupState[Array[Long]]) =>
          val buf = new java.util.TreeSet[java.lang.Long]()
          state.getOption.foreach(_.foreach(h => buf.add(h)))
          it.foreach { case (_, key) => Kmv.add(buf, Kmv.hash63(key), k) }
          val arr = new Array[Long](buf.size)
          val bit = buf.iterator()
          var i = 0
          while (bit.hasNext) { arr(i) = bit.next(); i += 1 }
          state.update(arr)
          val (n, kth, est) = Kmv.stats(buf, k)
          KmvUpdate(group, n, kth, est)
      }
  }

  /** Batch twin over the same rows (for stream ≡ batch pinning). */
  def distinctSketchBatch(events: DataFrame, keyCol: String, byCol: String,
                          k: Int): DataFrame =
    events.groupBy(col(byCol).as("group"))
      .agg(Kmv.kmvDistinct(col(keyCol).cast("long"), k).as("kmv"))
      .select(col("group"), col("kmv.n_kept").as("n_kept"),
        col("kmv.kth_min").as("kth_min"), col("kmv.est").as("est"))

  /** Streaming quantile monitoring: a FIXED-RANGE histogram per group as
    * `mapGroupsWithState` state — nBins longs per group forever, the
    * streaming member of the quantile family next to the batch
    * [[graft.ops.Quantiles]] sketch. The range [lo, hi) must be fixed a
    * priori (a streaming histogram cannot re-bin when the observed min/max
    * move, unlike the batch two-pass form); values outside clamp into the
    * edge bins and are counted in `n_clamped` so a drifting signal is
    * VISIBLE, not silently absorbed. Bin counts are order-free sums, so
    * stream-end state is exactly the batch binning of the same rows under
    * any micro-batch slicing (pinned in StreamsSpec). Estimates read the
    * right edge of the first bin whose cumulative count reaches ceil(q·n)
    * — the same formula as the batch sketch. */
  def histogramSketch(events: DataFrame, valueCol: String, byCol: String,
                      lo: Double, hi: Double, nBins: Int): Dataset[HistUpdate] = {
    require(nBins >= 2 && hi > lo)
    val spark = events.sparkSession
    import spark.implicits._
    def binOf(x: Double): Int = {
      val b = math.floor(((x - lo) / (hi - lo)) * nBins).toInt
      math.min(math.max(b, 0), nBins - 1)
    }
    def edge(bin: Long): Double = lo + ((bin + 1).toDouble * (hi - lo)) / nBins
    events
      .select(col(byCol).as("g"), col(valueCol).cast("double").as("v"))
      .where(col("v").isNotNull) // see distinctSketch's null note
      .as[(String, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[Array[Long], HistUpdate](GroupStateTimeout.NoTimeout()) {
        (group: String, it: Iterator[(String, Double)], state: GroupState[Array[Long]]) =>
          // state slot nBins holds the clamped-row count
          val bins = state.getOption.getOrElse(new Array[Long](nBins + 1))
          it.foreach { case (_, x) =>
            bins(binOf(x)) += 1
            if (x < lo || x >= hi) bins(nBins) += 1
          }
          state.update(bins)
          val n = bins.view.slice(0, nBins).sum
          def est(q: Double): Double = {
            val target = math.ceil(q * n).toLong
            var cc = 0L
            var b = 0
            while (b < nBins && cc + bins(b) < target) { cc += bins(b); b += 1 }
            edge(math.min(b, nBins - 1).toLong)
          }
          HistUpdate(group, n, bins(nBins), est(0.5), est(0.95))
      }
  }

  /** Streaming log-bucket quantile sketch — the UNBOUNDED-range twin of
    * [[histogramSketch]] (q179's batch lattice exactly): state per group
    * is the (bucket → count) map, bounded by 4·log2(max q) entries
    * FOREVER (~70 for any 64-bit domain — no lo/hi needed a priori).
    * Values cents-quantize to q = floor(v·100)+1 ≥ 1; buckets are
    * (integer log2, 2-bit mantissa prefix); estimates walk the sorted
    * buckets to ceil(p·n) and report the bucket UPPER edge in the exact
    * integer domain, so the stream-end update equals the batch walk under
    * any slicing (counts are order-free sums). `n` strictly increases per
    * update — the monotone stream-end selector, q94/q99's discipline. */
  def logHistogramSketch(events: DataFrame, valueCol: String,
                         byCol: String): Dataset[LogHistUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    def bucketOf(q: Long): Long =
      if (q < 4) q
      else {
        val e = 63 - java.lang.Long.numberOfLeadingZeros(q)
        e.toLong * 4 + (q >> (e - 2)) - 4
      }
    def hiEdge(b: Long): Long =
      if (b < 4) b else (b % 4 + 5) * (1L << (b / 4 - 2).toInt) - 1
    events
      .select(col(byCol).as("g"),
        (floor(col(valueCol).cast("double") * 100) + 1).cast("long").as("q"))
      .where(col("q").isNotNull && col("q") >= 1)
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[Map[Long, Long], LogHistUpdate](
          GroupStateTimeout.NoTimeout()) {
        (group: String, it: Iterator[(String, Long)],
         state: GroupState[Map[Long, Long]]) =>
          var m = state.getOption.getOrElse(Map.empty[Long, Long])
          it.foreach { case (_, q) =>
            val b = bucketOf(q)
            m = m.updated(b, m.getOrElse(b, 0L) + 1L)
          }
          state.update(m)
          val n = m.valuesIterator.sum
          val sorted = m.toSeq.sortBy(_._1)
          def est(num: Long, den: Long): Long = {
            val target = (num * n + den - 1) / den
            var cc = 0L
            var i = 0
            while (i < sorted.length - 1 && cc + sorted(i)._2 < target) {
              cc += sorted(i)._2; i += 1
            }
            hiEdge(sorted(i)._1)
          }
          LogHistUpdate(group, n, est(1, 2), est(19, 20))
      }
  }

  /** Streaming heavy hitters: the [[graft.functions.MisraGries]] k-counter
    * summary as per-group state, folded per micro-batch with the SAME
    * `MisraGries.add` as the batch aggregate and emitting the running
    * candidate set. State is ≤ k (term, count) pairs per group FOREVER —
    * frequency monitoring on an unbounded stream without a growing term
    * dictionary.
    *
    * Unlike KMV (a set of minima — order-free), the MG summary is
    * order-SENSITIVE: different micro-batch slicings may keep different
    * borderline counters. What IS slicing-invariant — and what consumers
    * may rely on — is the guarantee: any term whose true count so far
    * exceeds n/(k+1) is in the candidate set, and every emitted count is a
    * lower bound (pinned in StreamsSpec under multiple slicings).
    *
    * State-schema note: round 8 widened the state from the counter array
    * to (running n, counters) — a checkpointed query from an earlier
    * build cannot restore across this change (Spark rejects the state
    * schema); restart such a job from a fresh checkpoint. */
  def heavyHittersSketch(events: DataFrame, itemCol: String, byCol: String,
                         k: Int): Dataset[MgUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.unsafe.types.UTF8String
    events
      .select(col(byCol).as("g"), col(itemCol).as("item"))
      .as[(String, String)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Array[(String, Long)]), MgUpdate](
        GroupStateTimeout.NoTimeout()) {
        (group: String, it: Iterator[(String, String)],
         state: GroupState[(Long, Array[(String, Long)])]) =>
          val (n0, saved) = state.getOption.getOrElse((0L, Array.empty[(String, Long)]))
          val buf = scala.collection.mutable.HashMap.empty[UTF8String, Long]
          saved.foreach { case (t, c) => buf.update(UTF8String.fromString(t), c) }
          var n = n0
          it.foreach { case (_, term) =>
            if (term != null) {
              MisraGries.add(buf, UTF8String.fromString(term), 1L, k)
              n += 1
            }
          }
          val arr = buf.toArray.map { case (t, c) => (t.toString, c) }.sortBy(_._1)
          state.update((n, arr))
          MgUpdate(group, arr.length, arr.map(_._1).toSeq, arr.map(_._2).toSeq, n)
      }
  }

  /** Streaming Count-Min: the [[graft.functions.CountMinAgg]] cell matrix
    * as per-group state — depth·width longs per group FOREVER, folded with
    * the SAME [[CountMin.bucket]] as the batch aggregate. Cell counts are
    * order-free sums (like KMV minima and histogram bins, unlike the
    * MG summary), so the stream-end matrix is exactly the batch sketch of
    * the same rows under any micro-batch slicing — estimates read off the
    * final matrix carry the identical no-underestimate guarantee (q105
    * pins stream ≡ batch ≡ SQL through q104's oracle shape). */
  def countMinSketch(events: DataFrame, termCol: String, byCol: String,
                     depth: Int, width: Int): Dataset[CmUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col(byCol).as("g"), col(termCol).cast("long").as("term"))
      .where(col("term").isNotNull) // see distinctSketch's null note
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Array[Long]), CmUpdate](
        GroupStateTimeout.NoTimeout()) {
        (group: String, it: Iterator[(String, Long)],
         state: GroupState[(Long, Array[Long])]) =>
          val (n0, cm) = state.getOption.getOrElse(
            (0L, new Array[Long](depth * width)))
          var n = n0
          it.foreach { case (_, t) =>
            var r = 0
            while (r < depth) {
              cm(r * width + CountMin.bucket(t, r, width)) += 1L
              r += 1
            }
            n += 1
          }
          state.update((n, cm))
          CmUpdate(group, n, cm.toSeq)
      }
  }

  /** Streaming HyperLogLog: the [[graft.functions.HllAgg]] register array
    * as per-group state — Hll.M ints per group FOREVER, folded with the
    * SAME [[Hll.add]] as the batch aggregate. Registers are max-merged
    * (idempotent + commutative + associative — duplicates and slicing are
    * both free), so the stream-end array is exactly the batch sketch of
    * the same rows under any micro-batch slicing; q109 pins
    * stream ≡ batch ≡ SQL through q108's oracle shape. `n` counts folded
    * rows — strictly increasing per update, the monotone stream-end
    * selector (the q94/q105 pattern). */
  def hllSketch(events: DataFrame, keyCol: String,
                byCol: String): Dataset[HllUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col(byCol).as("g"), col(keyCol).cast("long").as("key"))
      .where(col("key").isNotNull) // see distinctSketch's null note
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Array[Int]), HllUpdate](
        GroupStateTimeout.NoTimeout()) {
        (group: String, it: Iterator[(String, Long)],
         state: GroupState[(Long, Array[Int])]) =>
          val (n0, regs) = state.getOption.getOrElse(
            (0L, new Array[Int](Hll.M)))
          var n = n0
          it.foreach { case (_, key) => Hll.add(regs, key); n += 1 }
          state.update((n, regs))
          HllUpdate(group, n, regs.toSeq)
      }
  }

  /** Streaming time-decayed trending (the q127 fold as per-group state):
    * day-quantized counts with exact dyadic half-life weights
    * (2^20 >> k micro-units, k = half-lives before the group's newest
    * day). State per group is the day→count map PRUNED at the decay
    * horizon — a day more than `horizonHalfLives` half-lives old weighs 0
    * forever (the reference day only advances), so it is dropped and the
    * state stays ≤ (horizon+1)·halfLifeDays entries no matter how long
    * the stream runs: the decay horizon IS the state bound. Reference day
    * is the group's OWN newest day (a one-pass stream cannot know the
    * global maximum) — the batch twin replays that with a per-group
    * window, and the score is a pure function of the day multiset, so
    * stream-end ≡ batch under any slicing. */
  def trendingSketch(events: DataFrame, dayCol: String, byCol: String,
                     halfLifeDays: Long,
                     horizonHalfLives: Int = 20): Dataset[TrendUpdate] = {
    require(halfLifeDays >= 1, s"halfLifeDays $halfLifeDays must be >= 1")
    require(horizonHalfLives >= 0 && horizonHalfLives <= 62,
      s"horizonHalfLives $horizonHalfLives outside [0, 62]")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col(byCol).as("g"), col(dayCol).cast("long").as("day"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Long, Map[Long, Long]), TrendUpdate](
        GroupStateTimeout.NoTimeout()) {
        (group: String, it: Iterator[(String, Long)],
         state: GroupState[(Long, Long, Map[Long, Long])]) =>
          var (n, maxDay, cells) = state.getOption
            .getOrElse((0L, Long.MinValue, Map.empty[Long, Long]))
          it.foreach { case (_, d) =>
            n += 1
            if (d > maxDay) maxDay = d
            cells = cells.updated(d, cells.getOrElse(d, 0L) + 1L)
          }
          cells = cells.filter { case (d, _) =>
            (maxDay - d) / halfLifeDays <= horizonHalfLives
          }
          state.update((n, maxDay, cells))
          // after the horizon prune k <= horizonHalfLives <= 62, so the
          // shift is well-defined and 2^20 >> k underflows to exactly 0
          // past 20 half-lives — the same zero the batch fold's k > 20
          // guard produces, with no second cutoff literal to drift
          val score = cells.iterator.map { case (d, c) =>
            c * (1048576L >> ((maxDay - d) / halfLifeDays).toInt)
          }.sum
          TrendUpdate(group, n, score)
      }
  }
}
