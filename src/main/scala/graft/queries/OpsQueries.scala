package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Mix64
import graft.ops.{Bucketing, Deletion, Layout, Quantiles, Sampling, Skew, SnapshotDiff, Temporal}

/** Driver-visible registrations for the scale-infrastructure operators
  * (graft.ops). The row-level ANSWERS are plain-SQL-expressible and carry
  * DuckDB oracles here; the PLAN properties that make them worth having
  * (no Exchange on a bucketed join, PartitionFilters on a partitioned
  * read, salted ≡ unsalted) stay pinned in BucketingSpec / LayoutSpec /
  * SkewSpec / PlanSpec — an oracle can only see rows.
  *
  * q44 and q46 pay a write as part of the query (bucketed managed tables,
  * a Hive-partitioned directory): that is the operators' actual contract —
  * the shuffle/layout cost is paid once at write time and amortized over
  * every subsequent read, which is what the 100 TB user buys.
  */
object OpsQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** events.ts is TIMESTAMP(MICROS) NTZ; queries that need event time
    * derive exact integer µs via unix_micros(cast(ts as timestamp)) — the
    * UTC re-pin makes the cast the identity even on a foreign session
    * (see RefQueries.events). */
  private def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.session.timeZone", "UTC")
    t(s, dir, "events")
  }

  /** q121's deletion-request rate: the deterministic share of users whose
    * Mix64 coordinate files a request (both engines derive the threshold
    * through the same Sampling.threshold floor). Defined BEFORE the query
    * and oracle maps — those vals capture it at object-init time. */
  private[queries] val DeleteRate = 0.02

  /** 2024-01-16T00:00:00Z — the mid-corpus split instant shared by every
    * query that halves the events table (q103's incremental batch, q122's
    * tombstones, q131's drift halves). ONE constant, interpolated into
    * the oracles, so the Spark side and the SQL can never drift apart. */
  private[queries] val MidCorpusUs = 1705363200000000L

  /** q132's assumed parallelism P: salt_buckets = ceil(freq·P / total),
    * interpolated into BOTH the Spark side and the oracle SQL. */
  private val SkewP = 32L

  /** q125's sketch width: wider than the q104/q105 frequency sketches
    * (whose point is bounded-state counting under collision) because the
    * inner-product estimator's error is ~‖a‖₁‖b‖₁/width — at the 256-term
    * domain a width-256 sketch keeps the estimate within a small factor
    * while still compressing nothing-to-hide test data; at a real 2^64
    * key domain THIS is the whole point: d·w cells estimate a join size
    * no per-key count could without shuffling the dictionary. */
  private[queries] val JoinSizeWidth = 256

  /** Table-name suffix derived from the data dir (specs reuse this to
    * compute the exact table names for cleanup — never hardcode them). */
  private[graft] def suffix(dir: String): String =
    dir.replaceAll("[^A-Za-z0-9]", "_")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // co-located bucketed join: orders⋈customer both bucketed by custkey,
    // so the join itself plans with NO hash Exchange on the join key (the
    // only shuffle left is the final tiny segment aggregation)
    "q44_bucketed_join" -> ((s, dir) => {
      val ot = s"graft_orders_bkt${suffix(dir)}"
      val ct = s"graft_customer_bkt${suffix(dir)}"
      Bucketing.writeBucketed(
        t(s, dir, "orders").select(col("o_custkey").as("custkey"), col("o_totalprice")),
        ot, "custkey", nBuckets = 8)
      Bucketing.writeBucketed(
        t(s, dir, "customer").select(col("c_custkey").as("custkey"), col("c_mktsegment")),
        ct, "custkey", nBuckets = 8)
      Bucketing.joinBucketed(s, ot, ct, "custkey")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"))
        .orderBy("c_mktsegment")
    }),

    // two-phase salted aggregation over the events stream (hot event types
    // spread across 16 reducers in phase 1, merged on the key in phase 2).
    // Aggregates are integer-exact (count + sum of floor) so the salted
    // partial/merge order can never perturb a float sum.
    "q45_salted_agg" -> ((s, dir) =>
      Skew.saltedAgg(events(s, dir).select(col("event_type"), col("value")),
          Seq(col("event_type")), buckets = 16)(
        partials = Seq(count(lit(1)).as("c"), sum(floor(col("value"))).as("s")),
        merged = Seq(sum(col("c")).as("n_events"), sum(col("s")).as("sum_floor_value")))
        .orderBy("event_type")),

    // deterministic stratified sampling: per-event-type rates, membership a
    // pure function of event_id (reproducible across engines/cluster
    // layouts; samples nest across rates). Narrow filter — no shuffle.
    "q49_stratified_sample" -> ((s, dir) =>
      Sampling.stratifiedSample(
          events(s, dir).select(col("event_id"), col("event_type"), col("user_id")),
          col("event_id"), col("event_type"), SampleRates, SampleDefaultRate)
        .orderBy("event_id")),

    // partitioned write layout + pruned read-back: events written
    // partitionBy(event_type), then a filtered aggregate over two of the
    // five partitions — the scan lists only those directories
    // (PartitionFilters pinned in PlanSpec/LayoutSpec)
    "q46_layout_pruning" -> ((s, dir) => {
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_layout${suffix(dir)}"
      Layout.writePartitioned(
        events(s, dir).select(col("user_id"), col("value"), col("event_type")),
        path, Seq("event_type"))
      s.read.parquet(path)
        .where(col("event_type").isin("click", "purchase"))
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"),
          sum(floor(col("value"))).as("sum_floor_value"))
        .orderBy("event_type")
    }),

    // backward as-of join: each purchase attributed to the user's LATEST
    // at-or-before click (contrast q54, which keeps EVERY click in a time
    // window). Exact integer µs; single key-shuffle sweep — see AsOfJoin.
    "q56_asof_join" -> ((s, dir) => {
      val e = events(s, dir)
        .withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_us"))
      val clicks = e.where(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("ts_us").as("click_ts_us"))
      graft.ops.AsOfJoin.backward(purchases, clicks, Seq("user_id"),
          leftTime = "ts_us", rightTime = "click_ts_us",
          rightTieBreak = "click_id")
        .select(col("event_id"), col("user_id"), col("ts_us"),
          col("click_id"), col("click_ts_us"),
          (col("ts_us") - col("click_ts_us")).as("gap_us"))
        .orderBy("event_id")
    }),

    // KMV distinct-count sketch vs exact: the sketch is a mergeable
    // TypedImperativeAggregate whose partials are ≤ k longs per partition —
    // the distributed-sketch shape — and the portable Mix64 hash + integer
    // estimate make the approximation itself a DuckDB-checked value. k=64:
    // unsaturated (exact path) at sf0.001, bottom-k estimation above.
    "q59_kmv_distinct" -> ((s, dir) =>
      events(s, dir).groupBy("event_type").agg(
          countDistinct(col("user_id")).as("exact_users"),
          graft.functions.Kmv.kmvDistinct(col("user_id"), 64).as("kmv"))
        .select(col("event_type"), col("exact_users"),
          col("kmv.n_kept").as("kmv_kept"),
          col("kmv.kth_min").as("kth_min"),
          col("kmv.est").as("kmv_est"))
        .orderBy("event_type")),

    // deterministic weighted sampling (priority sampling): top-100 events
    // by value-weighted priority — reproducible across engines/layouts,
    // plans as TakeOrdered (per-partition heaps, no full sort)
    "q65_weighted_sample" -> ((s, dir) =>
      Sampling.weightedTopK(
          events(s, dir).select(col("event_id"), col("event_type"), col("value")),
          col("event_id"), col("value"), n = 100)
        .orderBy(col("priority").desc, col("event_id"))),

    // Bloom-pruned selective join: the small side's keys materialize ONCE
    // into a few-KB bitset (the per-refresh artifact a 100 TB pipeline
    // persists), inlined as a literal so the probe is a narrow filter
    // directly above the fact scan — the shuffle then carries ~10% of
    // orders instead of all of them. (Joining the bitset in instead lets
    // Catalyst reorder the semi join BELOW the probe, pruning nothing.)
    // No false negatives ⇒ result ≡ the plain semi join, which IS the
    // oracle; BloomSpec pins selectivity, and PlanSpec the filter-below-
    // join shape.
    "q69_bloom_join" -> ((s, dir) => {
      import graft.functions.Bloom
      val cust = t(s, dir, "customer")
        .where(col("c_acctbal") > 9000).select(col("c_custkey"))
      val bits = Bloom.build(cust, col("c_custkey"), numBits = 1 << 14, numHashes = 4)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderpriority"), col("o_totalprice"))
        .where(Bloom.mightContain(lit(bits), col("o_custkey"), numHashes = 4))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"))
        .orderBy("o_orderpriority")
    }),

    // keyless range join via bucket manufacture: every event attributed to
    // the ±5-minute windows around error events — no equality key exists,
    // so a naive BETWEEN join is a BroadcastNestedLoopJoin; the bucketed
    // form hash-joins on quantized time (PlanSpec pins no-NLJ). Width =
    // window span → each interval lands in ≤ 3 buckets.
    "q74_range_join" -> ((s, dir) => {
      val e = events(s, dir)
        .withColumn("t_us", unix_micros(col("ts").cast("timestamp")))
      val points = e.select(col("event_id"), col("t_us"))
      val win = 300000000L // ±5 min in µs
      val intervals = e.where(col("event_type") === "error")
        .select(col("event_id").as("error_id"),
          (col("t_us") - win).as("w_start"), (col("t_us") + win).as("w_end"))
      graft.ops.RangeJoin.pointInInterval(points, intervals,
          "t_us", "w_start", "w_end", bucketWidth = 2 * win)
        .select(col("event_id"), col("error_id"),
          (col("t_us") - col("w_start")).as("offset_us"))
        .orderBy("event_id", "error_id")
    }),

    // interval OVERLAP join (both sides ranges — the q74 shape generalized):
    // error ±5-min windows × purchase ±1-min windows that intersect. No
    // equality key exists, so the bucket manufacture again replaces the
    // nested-loop plan with a hash join; the canonical-bucket rule keeps
    // it duplicate-free without a distinct. Overlap span in exact µs.
    "q78_interval_overlap" -> ((s, dir) => {
      val e = events(s, dir)
        .withColumn("t_us", unix_micros(col("ts").cast("timestamp")))
      val errW = 300000000L // ±5 min
      val purW = 60000000L  // ±1 min
      val errors = e.where(col("event_type") === "error")
        .select(col("event_id").as("error_id"),
          (col("t_us") - errW).as("e_start"), (col("t_us") + errW).as("e_end"))
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"),
          (col("t_us") - purW).as("p_start"), (col("t_us") + purW).as("p_end"))
      graft.ops.RangeJoin.intervalOverlap(errors, purchases,
          "e_start", "e_end", "p_start", "p_end", bucketWidth = 2 * errW)
        .select(col("error_id"), col("purchase_id"),
          greatest(col("e_start"), col("p_start")).as("ov_start_us"),
          least(col("e_end"), col("p_end")).as("ov_end_us"))
        .withColumn("ov_us", col("ov_end_us") - col("ov_start_us"))
        .orderBy("error_id", "purchase_id")
    }),

    // histogram quantile sketch vs exact: the (group, bin) counts are the
    // mergeable sketch (≤ 256 rows per group ever shuffle); the exact side
    // pays the full per-group sort the sketch avoids. Both paths and the
    // approximation error itself are oracle-checked bit-for-bit.
    "q71_histogram_quantiles" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = events(s, dir).select(col("event_type"), col("value"))
      val est = Quantiles.histogramEstimates(ev, "event_type", "value",
        nBins = 256, qs = Seq(0.5, 0.95))
      val ranked = ev.withColumn("rn",
        row_number().over(Window.partitionBy("event_type").orderBy("value")))
      val counts = ev.groupBy("event_type").agg(count(lit(1)).as("n2"))
      def exactDisc(q: Double, name: String) =
        ranked.join(broadcast(counts), "event_type")
          .where(col("rn") === ceil(lit(q) * col("n2")))
          .groupBy("event_type").agg(max(col("value")).as(name))
      est.join(exactDisc(0.5, "p50_exact"), "event_type")
        .join(exactDisc(0.95, "p95_exact"), "event_type")
        .select(col("event_type"), col("n"), col("vmin"), col("vmax"),
          col("p50_est"), col("p95_est"), col("p50_exact"), col("p95_exact"))
        .orderBy("event_type")
    }),

    // LOG-BUCKET QUANTILE SKETCH (round 10; the DDSketch idea on the
    // integer lattice): q71's fixed-range histogram needs [lo, hi) a
    // priori — this sketch covers an UNBOUNDED positive range with a
    // RELATIVE-error guarantee instead. Cents-quantize (q = floor(v·100)+1
    // ≥ 1), bucket by (integer log2, 2-bit mantissa prefix) — exact via
    // length(conv(q, 10, 2)), no float log — so each octave splits into 4
    // buckets and the bucket's relative width is ≤ 1/4. Counts are
    // order-free sums (mergeable, bounded by 4·log2(max) buckets per
    // group); the estimate walks cumulative counts to the target bucket's
    // upper edge (q99's convention). The GUARANTEE rides the row: the
    // exact percentile (bench-scale sort twin, q71's pattern) must land
    // INSIDE the selected bucket — p50_in_bucket/p95_in_bucket are
    // engine-computed booleans the oracle recomputes independently.
    "q179_loghist_quantiles" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = events(s, dir)
        .where(col("value").isNotNull && col("value") >= 0)
        .select(col("event_type"),
          (floor(col("value") * 100) + 1).cast("long").as("q"))
      val bk = ev
        .withColumn("e", (length(expr("conv(q, 10, 2)")) - 1).cast("long"))
        .withColumn("bucket", expr(
          "CASE WHEN q < 4 THEN q " +
            "ELSE e * 4 + (q div shiftleft(1L, cast(e as int) - 2)) - 4 END"))
      val counts = bk.groupBy("event_type", "bucket").agg(count(lit(1)).as("c"))
      val n = counts.groupBy("event_type").agg(sum(col("c")).as("n"))
      val cum = counts.withColumn("cum", sum(col("c")).over(
        Window.partitionBy("event_type").orderBy("bucket")))
      // ceil(num·n/den) as exact integers; the selected bucket is the
      // first whose cumulative count reaches the target
      def sel(num: Int, den: Int, name: String) =
        cum.join(n, "event_type")
          .where(col("cum") >= expr(s"($num * n + ${den - 1}) div $den"))
          .groupBy("event_type").agg(min(col("bucket")).as(name))
      def hi(b: String) = expr(s"CASE WHEN $b < 4 THEN $b ELSE " +
        s"($b % 4 + 5) * shiftleft(1L, cast($b div 4 as int) - 2) - 1 END")
      def lo(b: String) = expr(s"CASE WHEN $b < 4 THEN $b ELSE " +
        s"($b % 4 + 4) * shiftleft(1L, cast($b div 4 as int) - 2) END")
      // exact discrete percentile of q (value at position ceil(p·n) of the
      // per-type sorted run — max over ties, q71's shape; bench-scale twin)
      val rn = ev.withColumn("rn", row_number().over(
        Window.partitionBy("event_type").orderBy("q")))
      def exact(num: Int, den: Int, name: String) =
        rn.join(broadcast(n), "event_type")
          .where(col("rn") === expr(s"($num * n + ${den - 1}) div $den"))
          .groupBy("event_type").agg(max(col("q")).as(name))
      n.join(sel(1, 2, "b50"), "event_type").join(sel(19, 20, "b95"), "event_type")
        .join(exact(1, 2, "x50"), "event_type").join(exact(19, 20, "x95"), "event_type")
        .select(col("event_type"), col("n"),
          (hi("b50") - 1).as("p50_est_centi"),
          (col("x50") - 1).as("p50_exact_centi"),
          (lo("b50") <= col("x50") && col("x50") <= hi("b50")).as("p50_in_bucket"),
          (hi("b95") - 1).as("p95_est_centi"),
          (col("x95") - 1).as("p95_exact_centi"),
          (lo("b95") <= col("x95") && col("x95") <= hi("b95")).as("p95_in_bucket"))
        .orderBy("event_type")
    }),

    // keyed UPSERT (merge-into without a table format): a derived update
    // batch (every 7th order re-priced, status 'U') merged over the
    // snapshot — updates win on collision, everything else survives. The
    // batch side broadcasts into the anti-join so the snapshot never
    // shuffles; prices through DECIMAL so the re-price is exact.
    "q90_upsert" -> ((s, dir) => {
      val snap = t(s, dir, "orders").select(col("o_orderkey"),
        col("o_orderstatus"),
        col("o_totalprice").cast("decimal(18,2)").cast("double").as("total_price"))
      val updates = t(s, dir, "orders")
        .where(pmod(col("o_orderkey"), lit(7)) === 0)
        .select(col("o_orderkey"), lit("U").as("o_orderstatus"),
          (col("o_totalprice").cast("decimal(18,2)") * lit(2))
            .cast("double").as("total_price"))
      Layout.upsert(snap, updates, Seq("o_orderkey"))
        .orderBy("o_orderkey")
    }),

    // SCD2 DIMENSION BUILD: each user's event stream read as a change log
    // of their "state" (last event_type) → versioned validity intervals
    // [valid_from, valid_to) with consecutive same-state changes
    // compressed away — the dimension shape point-in-time-correct feature
    // joins need (a fact must see the version live AT ITS TIME, never a
    // later one). All three windows share one (user_id, t_us, event_id)
    // order → ONE key Exchange, linear sweep per key (TemporalSpec pins
    // the single-Exchange plan). Exact integer µs.
    "q102_scd2" -> ((s, dir) => {
      val e = events(s, dir)
        .select(col("user_id"), col("event_id"),
          col("event_type").as("state"),
          unix_micros(col("ts").cast("timestamp")).as("t_us"))
      Temporal.scd2(e, keys = Seq("user_id"), tsCol = "t_us",
          tieBreak = "event_id", attrs = Seq("state"))
        .orderBy("user_id", "version")
    }),

    // INCREMENTAL SCD2 MAINTENANCE: build the dimension from the first
    // half of the month, apply the second half as a change batch touching
    // only affected keys (Temporal.scd2Apply — the daily-dimension-feed
    // pattern; untouched keys never shuffle). The apply path must
    // reproduce the full rebuild EXACTLY (scd2's output is idempotent as
    // a change log — maximally compressed, losing ties discarded), so the
    // oracle is q102's full-rebuild SQL verbatim: any divergence between
    // incremental and batch maintenance is a red row.
    "q103_scd2_apply" -> ((s, dir) => {
      val splitUs = MidCorpusUs
      val e = events(s, dir)
        .select(col("user_id"), col("event_id"),
          col("event_type").as("state"),
          unix_micros(col("ts").cast("timestamp")).as("t_us"))
      val dim = Temporal.scd2(e.where(col("t_us") < splitUs),
        keys = Seq("user_id"), tsCol = "t_us",
        tieBreak = "event_id", attrs = Seq("state"))
      Temporal.scd2Apply(dim, e.where(col("t_us") >= splitUs),
          keys = Seq("user_id"), tsCol = "t_us",
          tieBreak = "event_id", attrs = Seq("state"))
        .orderBy("user_id", "version")
    }),

    // COUNT-MIN frequency sketch, approximation oracle-checked as data
    // (the q59/q71 discipline): a 4×32 portable-bucket matrix per
    // event_type over user_id%256 terms — 256 terms into 32 buckets, so
    // collisions are guaranteed and the estimates genuinely differ from
    // exact. Every (group, term) row carries the exact count, the CM
    // estimate (min over the term's 4 cells), and the no-underestimate
    // guarantee bit the oracle pins to a TRUE literal. The sketch side
    // shuffles 128 longs per group (mergeable matrix partials — the term
    // dictionary never rides the sketch shuffle); the exact side is the
    // plain GROUP BY it is being compared against.
    "q104_count_min" -> ((s, dir) => {
      val depth = CmDepth; val width = CmWidth
      val termed = events(s, dir)
        .select(col("event_type"), pmod(col("user_id"), lit(256)).as("term"))
      val sketch = termed.groupBy("event_type")
        .agg(graft.functions.CountMin.countMin(col("term"), depth, width).as("cm"))
      val exact = termed.groupBy("event_type", "term")
        .agg(count(lit(1)).as("exact_cnt"))
      val est = graft.functions.CountMin.estimateCol(col("cm"), col("term"), depth, width)
      exact.join(broadcast(sketch), "event_type")
        .select(col("event_type"), col("term"), col("exact_cnt"),
          est.as("est"), (est >= col("exact_cnt")).as("no_underestimate"))
        .orderBy("event_type", "term")
    }),

    // HYPERLOGLOG distinct-count sketch, approximation oracle-checked as
    // data (the q59/q104 discipline): 64 max-rank registers per event_type
    // over user_id, flattened to (group, bucket, register) rows so EVERY
    // register is driver-checked, with the group-level harmonic indicator
    // (an exact BIGINT — see graft.functions.Hll), the resulting estimate
    // (one double division of exact integers — bit-portable) and the exact
    // distinct count riding on each row. The sketch side shuffles 64 ints
    // per group forever (mergeable max registers — the key universe never
    // rides the shuffle); compare q59's KMV which keeps k hashes. At
    // 100 TB this is the distinct-count shape that works: constant state,
    // map-side combine, no count(DISTINCT) expand-shuffle.
    "q108_hll" -> ((s, dir) => {
      val ev = events(s, dir).select(col("event_type"), col("user_id"))
      val sketch = ev.groupBy("event_type")
        .agg(graft.functions.Hll.hll(col("user_id")).as("regs"))
      val exact = ev.groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("exact_users"))
      hllReadout(sketch, exact)
    }),

    // HLL RE-AGGREGATION: the property that makes sketches the 100 TB
    // distinct-count answer — per-group sketches (q108's) roll up to the
    // global sketch by elementwise max WITHOUT touching raw keys again
    // (store sketches at the finest granularity once, answer every
    // coarser COUNT DISTINCT from 64-int arrays). The query emits the
    // merged-from-groups register next to the directly-computed global
    // register on every row, so merge ≡ direct is itself a driver-checked
    // bit equality, plus the global estimate/exact (q108's read-out
    // shape). Scale: the roll-up input is #groups × 64 ints — the second
    // aggregation never sees a key.
    "q110_hll_merge" -> ((s, dir) => {
      import graft.functions.Hll
      val ev = events(s, dir).select(col("event_type"), col("user_id"))
      val merged = ev.groupBy("event_type")
        .agg(Hll.hll(col("user_id")).as("regs"))
        .select(posexplode(col("regs")).as(Seq("bucket", "register")))
        .groupBy("bucket").agg(max("register").as("reg_merged"))
      val direct = ev.agg(Hll.hll(col("user_id")).as("regs"))
        .select(posexplode(col("regs")).as(Seq("bucket", "reg_direct")))
      // global stats via ONE whole-frame window over the 64-row joined
      // register frame, partitioned by the non-foldable constant key
      // (Ranking.boundedAll — pmod(bucket, 1) ≡ 0 but Catalyst can't fold
      // it, so the WindowExec carries a non-empty partitionSpec: no
      // unpartitioned-window funnel, and no second aggregate branch /
      // broadcast join / persist to attach the totals — a re-aggregation
      // against the uncached frame would re-execute the merged AND direct
      // sketch pipelines, two corpus scans each, .explain-verified; the
      // r18 agg+join+persist variant measured +0.1 s per invocation at
      // sf0.1 over this single-pass shape). The remaining single-row
      // exact frame attaches via the NON-FOLDABLE pmod join key (a lit(1)
      // key constant-folds out of the join condition and the plan
      // degenerates to the nested-loop join the registry-wide PlanSpec
      // sweep rejects).
      val w = graft.ops.Ranking.boundedAll(col("bucket"))
      val j = merged.join(broadcast(direct), "bucket")
        .repartition(1) // 64 rows; SinglePartition satisfies the window
        .withColumn("n_zero",
          sum(when(col("reg_merged") === 0, 1L).otherwise(0L)).over(w))
        .withColumn("ind",
          sum(expr(s"shiftleft(cast(1 as bigint), ${Hll.RankCap} - reg_merged)")).over(w))
        .withColumn("k", pmod(col("bucket"), lit(1)))
      val exact = ev.agg(countDistinct(col("user_id")).as("exact_users"))
        .withColumn("k", pmod(col("exact_users"), lit(1)).cast("int"))
      j.join(broadcast(exact), "k")
        .select(col("bucket"), col("reg_merged"), col("reg_direct"),
          col("n_zero"), col("ind"),
          (lit(Hll.EstNum) / col("ind").cast("double")).as("est"),
          col("exact_users"))
        .orderBy("bucket")
    }),

    // HLL SET ALGEBRA: union/intersection estimates between every pair of
    // event types FROM THE STORED SKETCHES ALONE — union = elementwise
    // register max (exactly the sketch of the union, not an
    // approximation-of-an-approximation), intersection by
    // inclusion-exclusion (est_a + est_b − est_union, parenthesized
    // identically in both engines so the double arithmetic is
    // bit-portable). This is the overlap-analytics shape at 100 TB:
    // cross-slice user overlap from #groups × 64 ints, the corpus read
    // once for the sketches (+ once here for the exact baseline the
    // estimates are compared against). The pair enumeration is a
    // dimension×dimension join (≤ #groups², groups are a 5-row dim) —
    // whitelisted by name in PlanSpec's quadratic sweep like the IVF
    // centroid joins. HOF ind-folds run on 64-int arrays × 10 pair rows —
    // interpreted eval is irrelevant off the corpus path.
    "q111_hll_setops" -> ((s, dir) => {
      import graft.functions.Hll
      val ev = events(s, dir).select(col("event_type"), col("user_id"))
      val sketch = ev.groupBy("event_type").agg(Hll.hll(col("user_id")).as("regs"))
      val a = sketch.select(col("event_type").as("type_a"), col("regs").as("regs_a"))
      val b = sketch.select(col("event_type").as("type_b"), col("regs").as("regs_b"))
      val pairs = a.join(broadcast(b), col("type_a") < col("type_b"))
      def indOf(regs: String) = expr(
        s"""aggregate($regs, cast(0 as bigint),
           |  (acc, r) -> acc + shiftleft(cast(1 as bigint), ${Hll.RankCap} - r))""".stripMargin)
      def estOf(ind: Column) = lit(Hll.EstNum) / ind.cast("double")
      val withEst = pairs
        .withColumn("regs_u", expr("zip_with(regs_a, regs_b, (x, y) -> greatest(x, y))"))
        .select(col("type_a"), col("type_b"),
          estOf(indOf("regs_a")).as("est_a"),
          estOf(indOf("regs_b")).as("est_b"),
          estOf(indOf("regs_u")).as("est_union"))
        .withColumn("est_intersect",
          (col("est_a") + col("est_b")) - col("est_union"))
      val du = ev.distinct()
      val exact = du.as("l").join(du.as("r"), "user_id")
        .where(col("l.event_type") < col("r.event_type"))
        .groupBy(col("l.event_type").as("type_a"),
          col("r.event_type").as("type_b"))
        .agg(count(lit(1)).as("exact_both"))
      withEst.join(broadcast(exact), Seq("type_a", "type_b"), "left")
        .select(col("type_a"), col("type_b"), col("est_a"), col("est_b"),
          col("est_union"), col("est_intersect"),
          coalesce(col("exact_both"), lit(0L)).as("exact_both"))
        .orderBy("type_a", "type_b")
    }),

    // MIXTURE REBALANCING: derive per-source keep rates from the data
    // (equalize token mass — every source downsampled to the smallest
    // source's mass) and apply the deterministic hash-threshold sample in
    // the same query. rate = T_min/T_s is one division of exact integer
    // sums; rate·2^32 is a power-of-two scale (exact) so the floored
    // thresholds — and therefore membership — are bit-portable. The rates
    // table is |sources| rows → broadcast; the corpus side stays a narrow
    // scan+filter. This is the static mixture-application step of a
    // DoReMi-style pipeline: q73 measures, q82 rebalances, q49/q77 are the
    // fixed-rate/fixed-count primitives underneath.
    // deterministic train/val/test SPLIT assignment (80/10/10): the split
    // is a pure function of doc_id via the Mix64 coordinate against two
    // fixed thresholds — no RNG, no join, no state; any engine, any
    // partitioning, any rerun assigns every document identically, and a
    // document's split never changes when the corpus around it grows (the
    // property a training pipeline actually needs from its split). One
    // narrow scan; the per-(source, split) counts are the mixture audit.
    "q95_split_assign" -> ((s, dir) => {
      val c = Mix64.sampleCoord(col("doc_id"))
      t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          when(c < lit(Sampling.threshold(0.8)), "train")
            .when(c < lit(Sampling.threshold(0.9)), "val")
            .otherwise("test").as("split"))
        .orderBy("doc_id")
    }),

    "q82_mixture_rebalance" -> ((s, dir) => {
      import graft.text.TextAnalysis.tokenCountWs
      val docs = t(s, dir, "documents").select(col("doc_id"), col("source"),
        tokenCountWs(col("text")).cast("long").as("n_tok"))
      val mass = docs.groupBy("source").agg(sum(col("n_tok")).as("mass"))
      // min mass via the non-foldable pmod scalar key (q110's shape:
      // pmod(col, 1) ≡ 0 but Catalyst can't fold it, so the 1-row minimum
      // rides a broadcast HASH join) — one plan, no .head() action, no
      // unpartitioned window; both mass references share the source-rollup
      // exchange, so the corpus still scans once
      val minRow = mass.agg(min(col("mass")).as("min_mass"))
        .withColumn("_k", pmod(col("min_mass"), lit(1)).cast("int"))
      val rates = mass.withColumn("_k", pmod(col("mass"), lit(1)).cast("int"))
        .join(broadcast(minRow), "_k")
        .withColumn("rate",
          col("min_mass").cast("double") / col("mass").cast("double"))
        .withColumn("thr", floor(col("rate") * lit(4294967296.0)).cast("long"))
        .select("source", "rate", "thr")
      docs.join(broadcast(rates), "source")
        .where(Mix64.sampleCoord(col("doc_id")) < col("thr"))
        .select("doc_id", "source", "n_tok", "rate")
        .orderBy("doc_id")
    }),

    // salted broadcast join: the hot probe side (5 event types over
    // millions of rows) salts into 16 buckets against a 16×-replicated
    // dimension, so one hot key's rows spread across 16 tasks instead of
    // one. The salt is invisible to results (inner equi-join semantics
    // preserved — SkewSpec pins salted ≡ unsalted); integer aggregates.
    "q81_salted_join" -> ((s, dir) => {
      import s.implicits._
      val dim = Seq(("click", 1L), ("view", 2L), ("purchase", 5L),
        ("signup", 10L), ("error", 0L)).toDF("event_type", "weight")
      Skew.saltedBroadcastJoin(
          events(s, dir).select(col("event_type"), col("value")),
          dim, "event_type", buckets = 16)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          sum(floor(col("value")).cast("long") * col("weight"))
            .as("weighted_floor_sum"))
        .orderBy("event_type")
    }),

    // quota sampling: exactly 8 docs per source, the 8 smallest Mix64
    // coordinates — balanced-mixture construction (fixed COUNTS per
    // source, vs q49's fixed rates). Deterministic, nests across quotas;
    // WindowGroupLimit caps what each map task forwards (PlanSpec).
    "q77_quota_sample" -> ((s, dir) =>
      Sampling.quotaSample(
          t(s, dir, "documents").select(col("doc_id"), col("source")),
          col("doc_id"), col("source"), quota = 8)
        .orderBy("doc_id")),

    // Morton curve coordinate for the (user, day) layout keys — the value
    // Layout.writeZOrdered clusters files by (LayoutSpec pins the bounding-
    // box tightening); codegen'd bit interleave, narrow projection
    "q66_zorder" -> ((s, dir) =>
      events(s, dir)
        .select(col("event_id"), col("user_id"),
          expr("unix_micros(cast(ts as timestamp)) div 86400000000").as("day"))
        .withColumn("zval", graft.functions.ZOrder.zval(col("user_id"), col("day")))
        .orderBy("event_id")),

    // DATA-QUALITY AUDIT (the ingestion gate): Audit.verify batches all
    // of a table's constraint metrics into ONE scan — completeness (null
    // counts), domain and range violation counts, key uniqueness as
    // count − countDistinct — and referential integrity rides a left-anti
    // join audited as its own frame (at 100 TB: broadcast when the dim
    // fits, shuffle anti-join otherwise; either way only keys move).
    // Output is the audit report itself — (check_name, metric, passed) —
    // the artifact a pipeline gates promotion on.
    "q115_data_audit" -> ((s, dir) => {
      import graft.ops.Audit, Audit.Check
      val li = t(s, dir, "lineitem")
      val ord = t(s, dir, "orders")
      val cust = t(s, dir, "customer")
      val liAudit = Audit.verify(li, Seq(
        Check("li_rowcount", count(lit(1)), _ > 0),
        Check("li_qty_range_viol",
          sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1L)
            .otherwise(0L)), _ === 0),
        Check("li_returnflag_domain_viol",
          sum(when(!col("l_returnflag").isin("A", "N", "R"), 1L)
            .otherwise(0L)), _ === 0),
        Check("li_shipdate_nulls",
          sum(when(col("l_shipdate").isNull, 1L).otherwise(0L)), _ === 0)))
      val ordAudit = Audit.verify(ord, Seq(
        Check("ord_pk_dups",
          count(lit(1)) - countDistinct(col("o_orderkey")), _ === 0),
        Check("ord_totalprice_nonpos",
          sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)), _ === 0)))
      val refAudit = Audit.verify(
        ord.join(cust, ord("o_custkey") === cust("c_custkey"), "left_anti"),
        Seq(Check("ord_custkey_orphans", count(lit(1)), _ === 0)))
      liAudit.unionByName(ordAudit).unionByName(refAudit)
        .orderBy("check_name")
    }),

    // SHARD MANIFEST (the dataset-publishing step): deterministic shard
    // assignment — shard = Mix64(doc_id) mod 16, a pure function of the
    // key, so the layout is stable across runs, engines and cluster
    // sizes — plus a per-shard integrity record: doc/token counts, key
    // range, and an ORDER-FREE content checksum (bit_xor of the portable
    // per-doc rolling fingerprint). XOR is commutative and bounded, so
    // the checksum needs no sort and no big state whatever the shard
    // size; a consumer re-derives the manifest from the shipped data and
    // compares — corruption or loss shows as a checksum/count mismatch.
    // One scan, map-side-combinable aggregates, a 16-group shuffle.
    "q117_shard_manifest" -> ((s, dir) =>
      manifestOf(t(s, dir, "documents")).orderBy("shard")),

    // INCREMENTAL manifest maintenance, proven as data (the q110
    // merge≡direct discipline): every manifest statistic is a
    // commutative monoid — counts add, XOR xors (its own inverse: a
    // retracted doc XORs back OUT), min/max combine — so publishing a
    // delta batch updates the manifest from #shards rows + the DELTA
    // alone, never re-reading the corpus. The query computes the full
    // manifest NEXT TO base⊕delta (base = doc_id mod 4 ≠ 0, delta =
    // the rest — a pure predicate split, no driver round trip) and
    // emits their equality per shard as a driver-checked bit.
    "q118_manifest_apply" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val full = manifestOf(docs)
      def named(df: DataFrame, p: String): DataFrame = df.select(
        col("shard"), col("n_docs").as(s"${p}_docs"),
        col("n_tokens").as(s"${p}_tokens"), col("content_xor").as(s"${p}_xor"),
        col("min_doc_id").as(s"${p}_min"), col("max_doc_id").as(s"${p}_max"))
      val base = named(manifestOf(docs.where(col("doc_id") % 4 =!= 0)), "b")
      val delta = named(manifestOf(docs.where(col("doc_id") % 4 === 0)), "d")
      def comb(b: Column, d: Column, both: Column): Column =
        when(b.isNull, d).when(d.isNull, b).otherwise(both)
      val applied = base.join(delta, Seq("shard"), "full_outer")
        .select(col("shard"),
          (coalesce(col("b_docs"), lit(0L)) + coalesce(col("d_docs"), lit(0L)))
            .as("a_docs"),
          (coalesce(col("b_tokens"), lit(0L)) + coalesce(col("d_tokens"), lit(0L)))
            .as("a_tokens"),
          coalesce(col("b_xor"), lit(0L)).bitwiseXOR(coalesce(col("d_xor"), lit(0L)))
            .as("a_xor"),
          comb(col("b_min"), col("d_min"), least(col("b_min"), col("d_min")))
            .as("a_min"),
          comb(col("b_max"), col("d_max"), greatest(col("b_max"), col("d_max")))
            .as("a_max"))
      full.join(applied, "shard")
        .select(col("shard"), col("n_docs"), col("n_tokens"), col("content_xor"),
          col("min_doc_id"), col("max_doc_id"), col("a_docs"), col("a_tokens"),
          col("a_xor"), col("a_min"), col("a_max"),
          (col("n_docs") === col("a_docs") && col("n_tokens") === col("a_tokens")
            && col("content_xor") === col("a_xor")
            && col("min_doc_id") === col("a_min")
            && col("max_doc_id") === col("a_max")).as("incremental_ok"))
        .orderBy("shard")
    }),

    // RIGHT-TO-BE-FORGOTTEN propagation: a deterministic ~2% of users file
    // deletion requests; the sweep must scrub the fact table AND every
    // derived table (daily rollup, per-type profile) and prove it — one
    // audit row per table with before/after counts and an order-free
    // survivor checksum (sum of Mix64 coords of surviving row keys) that
    // the DuckDB oracle recomputes independently. Request list broadcast,
    // one scan per table, counts+checksum as one partial-agg — no corpus
    // shuffle (PlanSpec pins the broadcast-join shape).
    "q121_delete_propagate" -> ((s, dir) => {
      val e = events(s, dir).select(col("event_id"), col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("t_us"), col("event_type"))
      val requests = e.select(col("user_id"))
        .where(Mix64.sampleCoord(col("user_id")) <
          lit(Sampling.threshold(DeleteRate)))
        .distinct()
      val daily = e.groupBy(col("user_id"),
          expr("t_us div 86400000000").as("day"))
        .agg(count(lit(1)).as("n"))
      val profile = e.groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      Deletion.propagate(Seq(
          Deletion.Subject("events", e, col("user_id"), col("event_id")),
          Deletion.Subject("user_daily", daily, col("user_id"),
            expr("user_id * 131072 + day")),
          Deletion.Subject("user_profile", profile, col("user_id"),
            expr("user_id * 1024 + ascii(event_type)"))),
          requests)
        .orderBy("tbl")
    }),

    // RETRACTION-AWARE INCREMENTAL MAINTENANCE: deletion composed with
    // the q118 monoid discipline. A maintained per-day rollup (count +
    // exact decimal value mass) absorbs a deletion batch by SUBTRACTING
    // the deleted users' contribution — computed from their events alone
    // (broadcast semi join), never rescanning the corpus — and the query
    // emits incremental-vs-full-rebuild equality per day as a
    // driver-checked bit (full outer + null-safe compare, so a day
    // present on only one side is a red row, not a silent skip).
    "q123_rollup_retract" -> ((s, dir) => {
      val e = events(s, dir)
        .select(col("user_id"),
          expr("unix_micros(cast(ts as timestamp)) div 86400000000").as("day"),
          col("value").cast("decimal(18,2)").as("v"))
      val requests = e.select(col("user_id")).distinct()
        .where(Mix64.sampleCoord(col("user_id")) <
          lit(Sampling.threshold(DeleteRate)))
      def rollup(df: DataFrame, n: String, m: String): DataFrame =
        df.groupBy("day").agg(count(lit(1)).as(n), sum(col("v")).as(m))
      val full = rollup(e, "n", "mass")
      val delta = rollup(
        e.join(broadcast(requests), Seq("user_id"), "left_semi"), "dn", "dmass")
      val incremental = full.join(delta, Seq("day"), "left_outer")
        .select(col("day"),
          (col("n") - coalesce(col("dn"), lit(0L))).as("inc_n"),
          (col("mass") - coalesce(col("dmass"), lit(java.math.BigDecimal.ZERO)
            .cast("decimal(18,2)"))).as("inc_mass"))
        .where(col("inc_n") > 0)
      val rebuild = rollup(Deletion.scrub(e, col("user_id"), requests),
        "rb_n", "rb_mass")
      incremental.join(rebuild, Seq("day"), "full_outer")
        .select(col("day"),
          col("rb_n"), col("rb_mass").cast("double").as("rb_mass"),
          col("inc_n"), col("inc_mass").cast("double").as("inc_mass"),
          (col("rb_n") <=> col("inc_n") &&
            col("rb_mass") <=> col("inc_mass")).as("retract_ok"))
        .orderBy("day")
    }),

    // SNAPSHOT DIFF with bucket-fingerprint pruning (SnapshotDiff.diff):
    // base = docs with doc_id%3≠0, current = docs with doc_id%5≠0 and a
    // text edit on doc_id%7=0 — exercising added, removed AND changed.
    // The ORACLE is the DIRECT full-outer diff comparing raw text, so it
    // cross-checks the whole two-phase machinery: a fingerprint collision
    // OR an unsoundly skipped bucket would be a red row, not a silent
    // miss.
    "q124_snapshot_diff" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val base = docs.where(col("doc_id") % 3 =!= 0)
        .withColumn("fp",
          graft.text.TextAnalysis.contentFingerprint(col("text")))
      val cur = docs.where(col("doc_id") % 5 =!= 0)
        .withColumn("edited",
          when(col("doc_id") % 7 === 0, concat(col("text"), lit("!")))
            .otherwise(col("text")))
        .withColumn("fp",
          graft.text.TextAnalysis.contentFingerprint(col("edited")))
      SnapshotDiff.diff(base, cur, "doc_id", "fp", nBuckets = 64)
        .orderBy("doc_id", "status")
    }),

    // JOIN-SIZE ESTIMATION via the Count-Min inner product — the classic
    // "plan the join before running it" sketch application: |A ⋈ B| on a
    // key = Σ_t a_t·b_t, estimated by min over depth rows of the row-wise
    // sketch inner product Σ_w C[r][w]·P[r][w]. With increment-only cells
    // the estimate can only overshoot (collisions add non-negative cross
    // terms), emitted as a checked bit. Same Mix64 bucketing as
    // q104/q105; the whole query is three aggregation levels over one
    // scan — no join anywhere, exact and estimate ride the same cells.
    "q125_join_size" -> ((s, dir) => {
      val depth = CmDepth; val width = JoinSizeWidth
      val t = events(s, dir)
        .where(col("event_type").isin("click", "purchase"))
        .select(col("event_type"), pmod(col("user_id"), lit(256L)).as("term"))
      val perTerm = t.groupBy("term").agg(
        count(when(col("event_type") === "click", 1)).as("nc"),
        count(when(col("event_type") === "purchase", 1)).as("np"))
      val cells = perTerm
        .select(col("term"), col("nc"), col("np"),
          (col("nc") * col("np")).as("x"),
          explode(array((0 until depth).map(r => lit(r.toLong)): _*)).as("r"))
        .withColumn("bucket", pmod(
          Mix64.sampleCoord(col("term") * lit(131L) + col("r")),
          lit(width.toLong)))
        .groupBy("r", "bucket")
        .agg(sum("nc").as("c_cell"), sum("np").as("p_cell"),
          sum("x").as("xb"))
      cells.groupBy("r")
        .agg(sum(col("c_cell") * col("p_cell")).as("prod"),
          sum("xb").as("exact_r"), sum("c_cell").as("nc_r"),
          sum("p_cell").as("np_r"))
        .agg(max("nc_r").as("n_clicks"), max("np_r").as("n_purchases"),
          max("exact_r").as("exact_size"), min("prod").as("est_size"))
        .select(col("n_clicks"), col("n_purchases"), col("exact_size"),
          col("est_size"),
          (col("est_size") >= col("exact_size")).as("no_underestimate"))
    }),

    // TIME-DECAYED TRENDING: per-type freshness score with half-life
    // decay. The portability trick: a power-of-two half-life makes every
    // weight an exact dyadic rational — weight(k half-lives old) =
    // 2^20 >> k in INTEGER micro-units — so the score is pure BIGINT
    // arithmetic, bit-identical in DuckDB, no floating decay drift. The
    // scale shape: counts quantize to (type, day) cells FIRST (map-side
    // combinable, #types × #days rows), the reference day rides a window
    // over that tiny rollup (the q91 minMass pattern — never the corpus),
    // and the decay fold is an agg over the cells. k > 20 shifts to
    // weight 0 — a natural horizon that also guards Java's shift-mod-64.
    // SKEW ADVISOR — the data-driven half of Skew.saltedAgg: which keys
    // are hot, and how many salt buckets would balance them at a given
    // parallelism? For the top-10 keys by frequency (TakeOrdered — heaps
    // per partition, never a global sort) emit the exact-integer share
    // (freq·2^20 div total) and salt_buckets = ceil(freq·P / total), the
    // factor by which the key exceeds a balanced 1/P share at P=32. The
    // 1-row global total attaches to the 10-row top set as an explicit
    // broadcast cross join — the scalar-subquery shape, bounded by
    // construction (whitelisted by name in PlanSpec's cartesian sweep);
    // no corpus-wide window anywhere.
    "q132_skew_advisor" -> ((s, dir) => {
      val e = events(s, dir)
      val top = e.groupBy("user_id").agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("user_id")).limit(10)
      val total = e.agg(count(lit(1)).as("total"))
      // share through a DECIMAL intermediate: freq * 2^20 in BIGINT would
      // throw under ANSI past ~2^43 rows per key — the one place the 2^20
      // scale meets an unbounded count (advisor r8). salt_buckets' factor
      // is only P=32, safe to 2^58 rows per key.
      top.crossJoin(broadcast(total))
        .select(col("user_id"), col("freq"),
          expr("cast(cast(freq as decimal(38,0)) * 1048576 div total as bigint)")
            .as("share_micro"),
          expr(s"(freq * $SkewP + total - 1) div total").as("salt_buckets"))
        .orderBy(col("freq").desc, col("user_id"))
    }),

    // SOURCE/SINK INTERCHANGE round-trip — the corpus egress formats a
    // training-data pipeline actually ships: gzip JSONL (the LLM-corpus
    // interchange), ORC (the other columnar), and quoted multiLine CSV
    // (the hard case: free text through a line-oriented format). Each
    // format writes the documents table executor-side, reads it back
    // with an EXPLICIT schema (never inference), and the summary row
    // asserts lossless round-trip via a full-outer join with null-safe
    // field compares — the oracle expects exactly (n, n, 0) per format,
    // so any codec/quoting/escaping defect is a red driver row. Writes
    // go under java.io.tmpdir with mode=overwrite (bench reps reuse the
    // same paths instead of leaking).
    "q145_interchange_roundtrip" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("text"))
      val base = java.nio.file.Paths
        .get(System.getProperty("java.io.tmpdir"), "graft_interchange_rt")
      val schema = "doc_id LONG, source STRING, text STRING"
      def summary(fmt: String, back: DataFrame): DataFrame = {
        val l = docs.withColumn("in_l", lit(1L))
        val r = back.select(col("doc_id"), col("source").as("b_source"),
          col("text").as("b_text")).withColumn("in_r", lit(1L))
        l.join(r, Seq("doc_id"), "full_outer")
          .agg(
            coalesce(sum(coalesce(col("in_l"), lit(0L))), lit(0L)).as("n_docs"),
            coalesce(sum(coalesce(col("in_r"), lit(0L))), lit(0L)).as("n_roundtrip"),
            coalesce(sum(when(col("in_l").isNull || col("in_r").isNull ||
              !(col("source") <=> col("b_source")) ||
              !(col("text") <=> col("b_text")), 1L).otherwise(0L)), lit(0L))
              .as("n_mismatched"))
          .select(lit(fmt).as("format"), col("n_docs"),
            col("n_roundtrip"), col("n_mismatched"))
      }
      val jsonlPath = base.resolve("jsonl").toString
      docs.coalesce(8).write.mode("overwrite")
        .option("compression", "gzip").json(jsonlPath)
      val jsonl = summary("jsonl", s.read.schema(schema).json(jsonlPath))
      val orcPath = base.resolve("orc").toString
      docs.coalesce(8).write.mode("overwrite").orc(orcPath)
      val orc = summary("orc", s.read.schema(schema).orc(orcPath))
      val csvPath = base.resolve("csv").toString
      docs.coalesce(8).write.mode("overwrite")
        .option("header", "true").option("quoteAll", "true")
        .option("escape", "\"").csv(csvPath)
      val csv = summary("csv", s.read.schema(schema)
        .option("header", "true").option("multiLine", "true")
        .option("escape", "\"").csv(csvPath))
      csv.unionByName(jsonl).unionByName(orc).orderBy("format")
    }),

    "q127_trending" -> ((s, dir) => {
      // the reference day attaches via ONE whole-frame window over the day
      // rollup (#types × #days rows — dimension-scale), partitioned by the
      // non-foldable constant key (Ranking.boundedAll): no unpartitioned
      // WindowExec, and no persist / 1-row-broadcast second branch — the
      // rollup evaluates once inside its own plan (the r18 persist+NLJ
      // variant measured +0.15 s per invocation at sf0.1 over this
      // single-pass shape; exchange reuse alone can't cover two branches
      // because the scalar branch's pruned aggregate is not canonically
      // equal).
      val daily = events(s, dir)
        .select(col("event_type"),
          expr("unix_micros(cast(ts as timestamp)) div 86400000000").as("day"))
        .groupBy("event_type", "day").agg(count(lit(1)).as("n"))
        .repartition(1) // #types × #days rows; one task for the window
      daily.withColumn("max_day",
          max(col("day")).over(graft.ops.Ranking.boundedAll(col("day"))))
        .withColumn("k", expr("(max_day - day) div 7"))
        .withColumn("w", when(col("k") > 20, lit(0L))
          .otherwise(expr("cast(shiftright(1048576, cast(k as int)) as bigint)")))
        .groupBy("event_type")
        .agg(sum(col("n") * col("w")).as("decay_micro"),
          sum(col("n")).as("n_events"))
        .orderBy(col("decay_micro").desc, col("event_type"))
    }))

  /** q117/q118's per-shard manifest: Mix64 shard of the key, doc/token
    * counts, key range, and the order-free bit_xor content checksum. */
  private def manifestOf(docs: DataFrame): DataFrame =
    docs.select(
        (Mix64.sampleCoord(col("doc_id")) % 16).as("shard"),
        col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"),
        graft.text.TextAnalysis.contentFingerprint(col("text")).as("fp"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        expr("bit_xor(fp)").as("content_xor"),
        min("doc_id").as("min_doc_id"),
        max("doc_id").as("max_doc_id"))

  /** q49's per-stratum rates — thresholds are derived through the same
    * Sampling.threshold floor on both sides. */
  private val SampleRates = Map(
    "click" -> 0.5, "view" -> 0.25, "purchase" -> 1.0, "signup" -> 0.1)
  private val SampleDefaultRate = 0.05

  private val SampleCaseSql: String =
    SampleRates.toSeq.sorted.map { case (stratum, rate) =>
      s"WHEN '$stratum' THEN ${Sampling.threshold(rate)}"
    }.mkString("CASE event_type ", " ", s" ELSE ${Sampling.threshold(SampleDefaultRate)} END")

  /** The Mix64 coordinate in HUGEINT: ((A·key + B) mod 2^64) // 2^32 —
    * bit-identical to the JVM's wrapping multiply + unsigned shift. The
    * mod is NORMALIZED (((x % M) + M) % M) because DuckDB's % follows the
    * dividend's sign: without it a negative key's residue (and the //)
    * would diverge from the JVM's unsigned semantics. Keys here are >= 0,
    * but the pattern must stay safe to reuse on signed keys. */
  /** The KMV bottom-64 replay over `events` as shared CTEs (h/r/nd/kth) —
    * used by q59's batch oracle and q94's streaming-replay oracle. */
  /** @param where optional SQL predicate filtering the events rows the
    *              bottom-64 replay reads (q94 caps its streaming replay
    *              feed; the oracle must see the same sample) */
  private[queries] def kmvSql(where: String = ""): String =
    s"""h AS (
       |  SELECT DISTINCT event_type,
       |    (((((${java.lang.Long.toUnsignedString(Mix64.MulA)}::HUGEINT * user_id
       |        + ${java.lang.Long.toUnsignedString(Mix64.AddB)}::HUGEINT)
       |       % 18446744073709551616::HUGEINT)
       |      + 18446744073709551616::HUGEINT)
       |     % 18446744073709551616::HUGEINT) // 2)::BIGINT AS h
       |  FROM events${if (where.isEmpty) "" else s" WHERE $where"}),
       |r AS (SELECT event_type, h,
       |        row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
       |      FROM h),
       |nd AS (SELECT event_type, count(*) AS nd FROM h GROUP BY event_type),
       |kth AS (SELECT event_type, h AS kth_min FROM r WHERE rn = 64)""".stripMargin

  /** Count-Min replay shared by q104 (batch) and q105 (stream-end state
    * over the capped rows): bucket(term, r) = the Mix64 coordinate of
    * term·131 + r mod 32 (double-mod-normalized like q49/q100); a cell is
    * the sum of exact counts of ALL terms landing in it, the estimate the
    * min over a term's 4 cells. The guarantee bit is a literal TRUE — any
    * underestimate in the Spark sketch is a hash mismatch. */
  /** q104/q105's sketch geometry — the query sides and the SQL generator
    * read the SAME constants, so they cannot drift. */
  private[queries] val CmDepth = 4
  private[queries] val CmWidth = 32

  private[queries] def countMinSql(where: String = "",
                                   depth: Int = CmDepth,
                                   width: Int = CmWidth): String =
    s"""WITH t AS (SELECT event_type, ((user_id % 256) + 256) % 256 AS term
       |  FROM events${if (where.isEmpty) "" else s" WHERE $where"}),
       |ex AS (SELECT event_type, term, count(*) AS exact_cnt FROM t GROUP BY 1, 2),
       |tb AS (SELECT ex.*, r.r,
       |         (${coordSql("(ex.term::HUGEINT * 131 + r.r)")}) % $width AS bucket
       |       FROM ex CROSS JOIN range(0, $depth) r(r)),
       |cells AS (SELECT event_type, r, bucket, CAST(sum(exact_cnt) AS BIGINT) AS cell
       |          FROM tb GROUP BY 1, 2, 3),
       |est AS (SELECT tb.event_type, tb.term, min(c.cell) AS est
       |        FROM tb JOIN cells c ON c.event_type = tb.event_type
       |         AND c.r = tb.r AND c.bucket = tb.bucket
       |        GROUP BY 1, 2)
       |SELECT e.event_type, e.term, e.exact_cnt, est.est, TRUE AS no_underestimate
       |FROM ex e JOIN est ON est.event_type = e.event_type AND est.term = e.term
       |ORDER BY e.event_type, e.term""".stripMargin

  /** Shared HLL read-out (q108 batch, q109 stream-end state): flatten the
    * register array to (group, bucket, register) rows and ride the
    * group-level stats — n_zero, the exact-integer harmonic indicator
    * Σ 2^(RankCap−M_j), the estimate αm²·2^RankCap / ind (ONE double
    * division of exact integers) and the exact distinct count — on every
    * row. `sketch` must expose (event_type, regs: array<int>); `exact`
    * must expose (event_type, exact_users). */
  private[queries] def hllReadout(sketch: DataFrame, exact: DataFrame): DataFrame = {
    import graft.functions.Hll
    import org.apache.spark.sql.expressions.Window
    val flat = sketch.select(col("event_type"),
      posexplode(col("regs")).as(Seq("bucket", "register")))
    // group stats via a window over the exploded registers (#groups × 64
    // rows), NOT a groupBy+self-join: `flat` referenced twice would
    // re-execute the whole corpus scan + sketch aggregation — .explain
    // showed the doubled pipeline before this shape
    val w = Window.partitionBy("event_type")
    flat
      .withColumn("n_zero",
        sum(when(col("register") === 0, 1L).otherwise(0L)).over(w))
      .withColumn("ind",
        sum(expr(s"shiftleft(cast(1 as bigint), ${Hll.RankCap} - register)")).over(w))
      .join(broadcast(exact), "event_type")
      .select(col("event_type"), col("bucket"), col("register"),
        col("n_zero"), col("ind"),
        (lit(Hll.EstNum) / col("ind").cast("double")).as("est"),
        col("exact_users"))
      .orderBy("event_type", "bucket")
  }

  /** The mix/bucket/rank replay chain shared VERBATIM by the three HLL
    * oracles (q108/q109, q110, q111): the splitmix64-style finalizer
    * (Hll.mix) replayed in normalized HUGEINT — xor and >> exist on
    * HUGEINT, and both multipliers are < 2^63 so z·C < 2^127 never
    * overflows — then bucket = top 6 bits, rank = 59 − bitlen of the low
    * 58 bits (bitlen by exact integer comparison against the 58 powers of
    * two — no float log), capped at 48. ONE generator so a future hash
    * change (the exact scenario that motivated the splitmix64 switch)
    * cannot drift the three oracles apart. Emits CTEs z0…rr reading from
    * `src`; `grouped` carries event_type through the chain. */
  private def hllRankCtesSql(grouped: Boolean): String = {
    import graft.functions.Hll
    val M64 = "18446744073709551616::HUGEINT"
    val shift = BigInt(1) << (64 - Hll.P) // 2^58
    val powers = (0 until (64 - Hll.P))
      .map(b => s"${BigInt(1) << b}::HUGEINT").mkString("[", ", ", "]")
    val gamma = java.lang.Long.toUnsignedString(Mix64.MulA)
    val c1 = java.lang.Long.toUnsignedString(Hll.MulC1)
    val c2 = java.lang.Long.toUnsignedString(Hll.MulC2)
    val g = if (grouped) "event_type, " else ""
    s"""z0 AS (SELECT $g((((user_id::HUGEINT % $M64) + $M64) % $M64)
       |               + ${gamma}::HUGEINT) % $M64 AS z FROM src),
       |z1 AS (SELECT $g(xor(z, z >> 30) * ${c1}::HUGEINT) % $M64 AS z FROM z0),
       |z2 AS (SELECT $g(xor(z, z >> 27) * ${c2}::HUGEINT) % $M64 AS z FROM z1),
       |h AS (SELECT ${g}xor(z, z >> 31) AS hu FROM z2),
       |rr AS (SELECT ${g}hu // ${shift}::HUGEINT AS bucket,
       |         LEAST(${64 - Hll.P + 1} - len(list_filter($powers,
       |           pw -> (hu % ${shift}::HUGEINT) >= pw)), ${Hll.RankCap}) AS rank
       |       FROM h)""".stripMargin
  }

  /** The register→indicator sum shared by the three HLL oracles. */
  private def hllIndSql: String = {
    import graft.functions.Hll
    s"CAST(sum(1::BIGINT << (${Hll.RankCap} - register)) AS BIGINT)"
  }

  /** The estimate numerator: Double.toString of the ONE Scala-computed
    * constant (shortest round-trip repr) — the engines never re-derive it. */
  private def hllEstNumSql: String =
    s"CAST('${java.lang.Double.toString(graft.functions.Hll.EstNum)}' AS DOUBLE)"

  /** HLL replay shared by q108 (batch) and q109 (stream-end state over
    * the capped rows): the [[hllRankCtesSql]] chain, registers
    * max-aggregated per bucket with empties materialized as 0 via the
    * bucket range cross join. Registers depend only on DISTINCT (group,
    * key): max over duplicates is idempotent, so the src DISTINCT is
    * semantics-free. */
  private[queries] def hllSql(where: String = ""): String = {
    import graft.functions.Hll
    s"""WITH src AS (SELECT DISTINCT event_type, user_id FROM events${
         if (where.isEmpty) "" else s" WHERE $where"}),
       |${hllRankCtesSql(grouped = true)},
       |regs AS (SELECT g.event_type, b.b AS bucket,
       |           CAST(coalesce(max(rr.rank), 0) AS INT) AS register
       |         FROM (SELECT DISTINCT event_type FROM src) g
       |         CROSS JOIN range(0, ${Hll.M}) b(b)
       |         LEFT JOIN rr ON rr.event_type = g.event_type AND rr.bucket = b.b
       |         GROUP BY 1, 2),
       |gs AS (SELECT event_type,
       |         CAST(sum(CASE WHEN register = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
       |         $hllIndSql AS ind
       |       FROM regs GROUP BY 1),
       |ex AS (SELECT event_type, count(DISTINCT user_id) AS exact_users
       |       FROM src GROUP BY 1)
       |SELECT r.event_type, CAST(r.bucket AS INT) AS bucket, r.register,
       |  gs.n_zero, gs.ind,
       |  $hllEstNumSql / CAST(gs.ind AS DOUBLE) AS est,
       |  ex.exact_users
       |FROM regs r JOIN gs USING (event_type) JOIN ex USING (event_type)
       |ORDER BY r.event_type, r.bucket""".stripMargin
  }

  /** q110's oracle: the global (ungrouped) HLL replay. In SQL the
    * merged-from-groups and direct global sketches are definitionally the
    * same relation (max over all rows), so the register is emitted twice —
    * the Spark side must land BOTH its roll-up path and its direct path on
    * exactly these values, which is what pins mergeability as data. The
    * `nonempty` guard on the bucket manufacture keeps the empty-input
    * answer at 0 rows on both engines (Spark's merged side groups by
    * event_type first, so an empty corpus yields no buckets — an
    * unconditioned range(0, m) would yield 64). */
  private[queries] def hllMergeSql(): String = {
    import graft.functions.Hll
    s"""WITH src AS (SELECT DISTINCT user_id FROM events),
       |${hllRankCtesSql(grouped = false)},
       |regs AS (SELECT b.b AS bucket,
       |           CAST(coalesce(max(rr.rank), 0) AS INT) AS register
       |         FROM (SELECT DISTINCT 1 FROM src) nonempty
       |         CROSS JOIN range(0, ${Hll.M}) b(b)
       |         LEFT JOIN rr ON rr.bucket = b.b
       |         GROUP BY 1),
       |gs AS (SELECT
       |         CAST(sum(CASE WHEN register = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
       |         $hllIndSql AS ind
       |       FROM regs),
       |ex AS (SELECT count(DISTINCT user_id) AS exact_users FROM src)
       |SELECT CAST(r.bucket AS INT) AS bucket,
       |  r.register AS reg_merged, r.register AS reg_direct,
       |  gs.n_zero, gs.ind,
       |  $hllEstNumSql / CAST(gs.ind AS DOUBLE) AS est,
       |  ex.exact_users
       |FROM regs r CROSS JOIN gs CROSS JOIN ex
       |ORDER BY r.bucket""".stripMargin
  }

  /** q111's oracle: per-group registers (hllSql's grouped shape), pair
    * self-join on the type dimension, union registers by per-bucket max
    * over the pair's rows, inclusion-exclusion with the SAME
    * parenthesization as the Spark side ((est_a + est_b) - est_union) so
    * the double arithmetic is bit-identical, and the exact overlap from a
    * user_id self-join of the distinct (type, user) relation. */
  private[queries] def hllSetopsSql(): String = {
    import graft.functions.Hll
    val en = hllEstNumSql
    s"""WITH src AS (SELECT DISTINCT event_type, user_id FROM events),
       |${hllRankCtesSql(grouped = true)},
       |types AS (SELECT DISTINCT event_type FROM src),
       |regs AS (SELECT g.event_type, b.b AS bucket,
       |           CAST(coalesce(max(rr.rank), 0) AS INT) AS register
       |         FROM types g
       |         CROSS JOIN range(0, ${Hll.M}) b(b)
       |         LEFT JOIN rr ON rr.event_type = g.event_type AND rr.bucket = b.b
       |         GROUP BY 1, 2),
       |gind AS (SELECT event_type,
       |           $hllIndSql AS ind
       |         FROM regs GROUP BY 1),
       |pairs AS (SELECT a.event_type AS type_a, b.event_type AS type_b
       |          FROM types a JOIN types b ON a.event_type < b.event_type),
       |uregs AS (SELECT p.type_a, p.type_b, r.bucket, max(r.register) AS register
       |          FROM pairs p JOIN regs r
       |            ON r.event_type = p.type_a OR r.event_type = p.type_b
       |          GROUP BY 1, 2, 3),
       |uind AS (SELECT type_a, type_b,
       |           $hllIndSql AS ind
       |         FROM uregs GROUP BY 1, 2),
       |exact AS (SELECT l.event_type AS type_a, r.event_type AS type_b,
       |            count(*) AS exact_both
       |          FROM src l JOIN src r
       |            ON l.user_id = r.user_id AND l.event_type < r.event_type
       |          GROUP BY 1, 2)
       |SELECT p.type_a, p.type_b,
       |  $en / CAST(ia.ind AS DOUBLE) AS est_a,
       |  $en / CAST(ib.ind AS DOUBLE) AS est_b,
       |  $en / CAST(u.ind AS DOUBLE) AS est_union,
       |  ($en / CAST(ia.ind AS DOUBLE) + $en / CAST(ib.ind AS DOUBLE))
       |    - $en / CAST(u.ind AS DOUBLE) AS est_intersect,
       |  coalesce(e.exact_both, 0) AS exact_both
       |FROM pairs p
       |JOIN gind ia ON ia.event_type = p.type_a
       |JOIN gind ib ON ib.event_type = p.type_b
       |JOIN uind u ON u.type_a = p.type_a AND u.type_b = p.type_b
       |LEFT JOIN exact e ON e.type_a = p.type_a AND e.type_b = p.type_b
       |ORDER BY p.type_a, p.type_b""".stripMargin
  }

  /** Shared CTE chain of the q179/q180 log-bucket quantile sketch (ONE
    * copy of the lattice — bucket formula, counts, cumulative walk,
    * target-bucket selection — so the batch and streaming oracles can
    * never desynchronize; `extraWhere` is the replay-sample predicate,
    * "" for the batch row). Ends at `sel(event_type, n, b50, b95)`. */
  private[queries] def logHistCtes(extraWhere: String): String =
    s"""ev AS (
       |  SELECT event_type, CAST(floor(value * 100) + 1 AS BIGINT) AS q
       |  FROM events WHERE ${extraWhere}value IS NOT NULL AND value >= 0),
       |bk AS (
       |  SELECT event_type, q,
       |    CASE WHEN q < 4 THEN q
       |         ELSE e * 4 + (q // (CAST(1 AS BIGINT) << CAST(e - 2 AS INT))) - 4 END AS bucket
       |  FROM (SELECT event_type, q,
       |          CAST(length(printf('%b', q)) - 1 AS BIGINT) AS e FROM ev) t),
       |c AS (SELECT event_type, bucket, CAST(count(*) AS BIGINT) AS c
       |      FROM bk GROUP BY 1, 2),
       |n AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY 1),
       |cum AS (SELECT event_type, bucket,
       |          sum(c) OVER (PARTITION BY event_type ORDER BY bucket) AS cum
       |        FROM c),
       |sel AS (
       |  SELECT n.event_type, n.n,
       |    (SELECT min(bucket) FROM cum
       |     WHERE cum.event_type = n.event_type
       |       AND cum.cum >= (1 * n.n + 1) // 2) AS b50,
       |    (SELECT min(bucket) FROM cum
       |     WHERE cum.event_type = n.event_type
       |       AND cum.cum >= (19 * n.n + 19) // 20) AS b95
       |  FROM n)""".stripMargin

  /** Bucket-edge formula of the log-bucket lattice: upper edge when
    * hi=true (…·2^(e−2) − 1), lower edge otherwise. */
  private[queries] def logHistEdgeSql(b: String, hi: Boolean): String = {
    val base = if (hi) 5 else 4
    val tail = if (hi) " - 1" else ""
    s"CASE WHEN $b < 4 THEN $b ELSE ($b % 4 + $base) * " +
      s"(CAST(1 AS BIGINT) << CAST($b // 4 - 2 AS INT))$tail END"
  }

  private[queries] def coordSql(key: String): String =
    s"""((((${java.lang.Long.toUnsignedString(Mix64.MulA)}::HUGEINT * $key
       |    + ${java.lang.Long.toUnsignedString(Mix64.AddB)}::HUGEINT)
       |   % 18446744073709551616::HUGEINT)
       |  + 18446744073709551616::HUGEINT)
       | % 18446744073709551616::HUGEINT) // 4294967296""".stripMargin

  /** Replays scd2's exact order of operations over the events change log:
    * discard losing equal-time ties (last (t_us, event_id) of each ts-run
    * wins) → change-point compression (null-safe state compare, first row
    * kept) → close intervals with lead → number versions. After the
    * tie-keep, t_us is distinct per user, so ORDER BY t_us is the Spark
    * windows' order. Shared by q102 (batch build), q103 (incremental
    * apply) and q107 (streaming, over the capped replay rows) — every
    * maintenance path must land on the same rebuild exactly. */
  private[queries] def scd2Sql(where: String = ""): String =
    s"""WITH e AS (SELECT user_id, event_id, event_type AS state,
      |                  epoch_us(ts) AS t_us FROM events${
        if (where.isEmpty) "" else s" WHERE $where"}),
      |k AS (SELECT * FROM (SELECT *, lead(t_us) OVER w AS next_ts
      |        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id))
      |      WHERE next_ts IS NULL OR next_ts <> t_us),
      |c AS (SELECT * FROM (SELECT user_id, state, t_us,
      |          lag(state) OVER w AS prev_state, row_number() OVER w AS rn
      |        FROM k WINDOW w AS (PARTITION BY user_id ORDER BY t_us))
      |      WHERE rn = 1 OR state IS DISTINCT FROM prev_state),
      |v AS (SELECT user_id, state, t_us AS valid_from, lead(t_us) OVER w AS valid_to,
      |             CAST(row_number() OVER w AS INT) AS version
      |      FROM c WINDOW w AS (PARTITION BY user_id ORDER BY t_us))
      |SELECT user_id, state, valid_from, valid_to, version,
      |  valid_to IS NULL AS is_current
      |FROM v ORDER BY user_id, version""".stripMargin

  val oracle: Map[String, String] = Map(
    "q49_stratified_sample" ->
      s"""SELECT event_id, event_type, user_id FROM events
         |WHERE ${coordSql("event_id")}
         |      < $SampleCaseSql
         |ORDER BY event_id""".stripMargin,

    "q95_split_assign" ->
      s"""SELECT doc_id, source,
         |  CASE WHEN ${coordSql("doc_id")} < ${Sampling.threshold(0.8)} THEN 'train'
         |       WHEN ${coordSql("doc_id")} < ${Sampling.threshold(0.9)} THEN 'val'
         |       ELSE 'test' END AS split
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q44_bucketed_join" ->
      """SELECT c.c_mktsegment, count(*) AS n_orders,
        |  CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""".stripMargin,

    "q45_salted_agg" ->
      """SELECT event_type, count(*) AS n_events,
        |  CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS sum_floor_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q46_layout_pruning" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events,
        |  CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS sum_floor_value
        |FROM events WHERE event_type IN ('click', 'purchase')
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    // independently-shaped oracle for the as-of sweep: an explicit
    // join-then-arg-max (the quadratic formulation AsOfJoin avoids — fine
    // at oracle scale). max_by tie-safety: events carry no equal-(user,ts)
    // pairs at any SF, and the engine side additionally pins greatest-id
    // tie-break in AsOfJoinSpec.
    "q56_asof_join" ->
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |p AS (SELECT event_id, user_id, ts_us FROM e WHERE event_type = 'purchase'),
        |c AS (SELECT event_id AS click_id, user_id, ts_us AS click_ts_us FROM e WHERE event_type = 'click'),
        |best AS (
        |  SELECT p.event_id AS pid, max(c.click_ts_us) AS click_ts_us,
        |         max_by(c.click_id, c.click_ts_us) AS click_id
        |  FROM p JOIN c ON c.user_id = p.user_id AND c.click_ts_us <= p.ts_us
        |  GROUP BY p.event_id)
        |SELECT p.event_id, p.user_id, p.ts_us, b.click_id, b.click_ts_us,
        |  p.ts_us - b.click_ts_us AS gap_us
        |FROM p LEFT JOIN best b ON b.pid = p.event_id
        |ORDER BY p.event_id""".stripMargin,

    // the KMV sketch replayed in SQL: same Mix64 mix in normalized HUGEINT
    // (see q49's oracle for why the +M …%M), >>>1 as //2, bottom-64 via
    // row_number, estimate = 63·2^63/h_64 — ONE double division of exact
    // integers, so even the approximation matches bit-for-bit
    "q59_kmv_distinct" ->
      s"""WITH ${kmvSql()},
         |ex AS (SELECT event_type, count(DISTINCT user_id) AS exact_users
         |       FROM events GROUP BY event_type)
         |SELECT ex.event_type, ex.exact_users,
         |  CAST(least(nd.nd, 64) AS INT) AS kmv_kept,
         |  kth.kth_min,
         |  CASE WHEN kth.kth_min IS NOT NULL
         |       THEN CAST(63 * 9223372036854775808::HUGEINT AS DOUBLE) / CAST(kth.kth_min AS DOUBLE)
         |       ELSE CAST(nd.nd AS DOUBLE) END AS kmv_est
         |FROM ex JOIN nd USING (event_type) LEFT JOIN kth USING (event_type)
         |ORDER BY ex.event_type""".stripMargin,

    // priority = w·2^32/(coord+1): power-of-two scale (exact) + one
    // division (exact-rounded) — identical doubles on both engines
    "q65_weighted_sample" ->
      s"""SELECT event_id, event_type, value,
         |  value * 4294967296 / CAST(${coordSql("event_id")} + 1 AS DOUBLE) AS priority
         |FROM events WHERE value > 0
         |ORDER BY priority DESC, event_id LIMIT 100""".stripMargin,

    // the bloom prefilter is invisible to results (no false negatives):
    // the oracle is the plain selective semi join
    "q69_bloom_join" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM customer c
        |              WHERE c.c_custkey = o.o_custkey AND c.c_acctbal > 9000)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // the closed form of the merge: updated rows ∪ untouched rows
    "q90_upsert" ->
      """SELECT o_orderkey, 'U' AS o_orderstatus,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 2 AS DOUBLE) AS total_price
        |FROM orders WHERE o_orderkey % 7 = 0
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_price
        |FROM orders WHERE o_orderkey % 7 <> 0
        |ORDER BY o_orderkey""".stripMargin,

    "q104_count_min" -> countMinSql(),

    "q108_hll" -> hllSql(),

    "q110_hll_merge" -> hllMergeSql(),

    "q111_hll_setops" -> hllSetopsSql(),

    "q102_scd2" -> scd2Sql(),

    // the apply path (q103) must land on the batch rebuild exactly, so
    // its oracle IS the rebuild SQL — one source of truth, zero drift
    "q103_scd2_apply" -> scd2Sql(),

    // same token count as q30, same Mix64 coordinate as q49; the only
    // floats are one exact-integer division and one power-of-two scale
    "q82_mixture_rebalance" ->
      s"""WITH d AS (
         |  SELECT doc_id, source,
         |    CAST(CASE WHEN trim(text) = '' THEN 0
         |         ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS n_tok
         |  FROM documents),
         |m AS (SELECT source, sum(n_tok) AS mass FROM d GROUP BY source),
         |r AS (SELECT source,
         |        CAST((SELECT min(mass) FROM m) AS DOUBLE) / CAST(mass AS DOUBLE) AS rate,
         |        CAST(floor((CAST((SELECT min(mass) FROM m) AS DOUBLE) / CAST(mass AS DOUBLE))
         |             * 4294967296) AS BIGINT) AS thr
         |      FROM m)
         |SELECT d.doc_id, d.source, d.n_tok, r.rate
         |FROM d JOIN r USING (source)
         |WHERE ${coordSql("d.doc_id")} < r.thr
         |ORDER BY d.doc_id""".stripMargin,

    // the salt is invisible to results: the oracle is the plain join
    "q81_salted_join" ->
      """SELECT e.event_type, count(*) AS n_events,
        |  CAST(sum(CAST(floor(e.value) AS BIGINT) * d.weight) AS BIGINT) AS weighted_floor_sum
        |FROM events e
        |JOIN (VALUES ('click', 1), ('view', 2), ('purchase', 5),
        |      ('signup', 10), ('error', 0)) d(event_type, weight)
        |  ON e.event_type = d.event_type
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,

    // the same coordinate order replayed with a window; row_number is INT
    // on the Spark side, so the oracle casts
    "q77_quota_sample" ->
      s"""SELECT doc_id, source, rank FROM (
         |  SELECT doc_id, source,
         |    CAST(row_number() OVER (PARTITION BY source
         |         ORDER BY ${coordSql("doc_id")}, doc_id) AS INT) AS rank
         |  FROM documents)
         |WHERE rank <= 8 ORDER BY doc_id""".stripMargin,

    // the naive BETWEEN formulation — DuckDB's IEJoin handles it directly
    "q74_range_join" ->
      """WITH e AS (SELECT event_id, epoch_us(ts) AS t_us FROM events),
        |er AS (SELECT event_id AS error_id,
        |         epoch_us(ts) - 300000000 AS w_start,
        |         epoch_us(ts) + 300000000 AS w_end
        |       FROM events WHERE event_type = 'error')
        |SELECT e.event_id, er.error_id, e.t_us - er.w_start AS offset_us
        |FROM e JOIN er ON e.t_us >= er.w_start AND e.t_us < er.w_end
        |ORDER BY e.event_id, er.error_id""".stripMargin,

    // the naive overlap BETWEEN formulation (DuckDB IEJoin)
    "q78_interval_overlap" ->
      """WITH e AS (SELECT event_id, event_type, epoch_us(ts) AS t FROM events),
        |er AS (SELECT event_id AS error_id, t - 300000000 AS e_start, t + 300000000 AS e_end
        |       FROM e WHERE event_type = 'error'),
        |pu AS (SELECT event_id AS purchase_id, t - 60000000 AS p_start, t + 60000000 AS p_end
        |       FROM e WHERE event_type = 'purchase')
        |SELECT error_id, purchase_id,
        |  greatest(e_start, p_start) AS ov_start_us,
        |  least(e_end, p_end) AS ov_end_us,
        |  least(e_end, p_end) - greatest(e_start, p_start) AS ov_us
        |FROM er JOIN pu ON e_start < p_end AND p_start < e_end
        |ORDER BY error_id, purchase_id""".stripMargin,

    // every float step is the same two-operand tree as the Spark side
    // q179: the shared sketch chain + the exact sort twin + in-bucket bools
    "q179_loghist_quantiles" ->
      s"""WITH ${logHistCtes("")},
        |rk AS (SELECT event_type, q,
        |         row_number() OVER (PARTITION BY event_type ORDER BY q) AS rn
        |       FROM ev),
        |ex AS (
        |  SELECT n.event_type,
        |    (SELECT max(q) FROM rk WHERE rk.event_type = n.event_type
        |       AND rk.rn = (1 * n.n + 1) // 2) AS x50,
        |    (SELECT max(q) FROM rk WHERE rk.event_type = n.event_type
        |       AND rk.rn = (19 * n.n + 19) // 20) AS x95
        |  FROM n),
        |edges AS (
        |  SELECT sel.event_type, sel.n, ex.x50, ex.x95,
        |    ${logHistEdgeSql("b50", hi = true)} AS hi50,
        |    ${logHistEdgeSql("b50", hi = false)} AS lo50,
        |    ${logHistEdgeSql("b95", hi = true)} AS hi95,
        |    ${logHistEdgeSql("b95", hi = false)} AS lo95
        |  FROM sel JOIN ex ON ex.event_type = sel.event_type)
        |SELECT event_type, n,
        |  CAST(hi50 - 1 AS BIGINT) AS p50_est_centi,
        |  CAST(x50 - 1 AS BIGINT) AS p50_exact_centi,
        |  (lo50 <= x50 AND x50 <= hi50) AS p50_in_bucket,
        |  CAST(hi95 - 1 AS BIGINT) AS p95_est_centi,
        |  CAST(x95 - 1 AS BIGINT) AS p95_exact_centi,
        |  (lo95 <= x95 AND x95 <= hi95) AS p95_in_bucket
        |FROM edges ORDER BY event_type""".stripMargin,

    // (subtract / divide / scale-by-256 / floor; edge formula for the
    // estimate) — IEEE exact rounding makes the doubles identical
    "q71_histogram_quantiles" ->
      """WITH s AS (SELECT event_type, value FROM events),
        |g AS (SELECT event_type, count(*) AS n, min(value) AS vmin, max(value) AS vmax
        |      FROM s GROUP BY event_type),
        |b AS (SELECT s.event_type,
        |        CASE WHEN g.vmax = g.vmin THEN 0
        |             ELSE least(CAST(floor(((s.value - g.vmin) / (g.vmax - g.vmin)) * 256) AS BIGINT), 255)
        |        END AS bin
        |      FROM s JOIN g USING (event_type)),
        |h AS (SELECT event_type, bin, count(*) AS c FROM b GROUP BY event_type, bin),
        |cum AS (SELECT h.event_type, h.bin,
        |          sum(h.c) OVER (PARTITION BY h.event_type ORDER BY h.bin) AS cc, g.n
        |        FROM h JOIN g USING (event_type)),
        |q50 AS (SELECT event_type, min(bin) AS qbin FROM cum
        |        WHERE cc >= CAST(ceil(0.5 * n) AS BIGINT) GROUP BY event_type),
        |q95 AS (SELECT event_type, min(bin) AS qbin FROM cum
        |        WHERE cc >= CAST(ceil(0.95 * n) AS BIGINT) GROUP BY event_type),
        |r AS (SELECT event_type, value,
        |        row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn FROM s),
        |x50 AS (SELECT r.event_type, max(r.value) AS p50_exact FROM r JOIN g USING (event_type)
        |        WHERE rn = CAST(ceil(0.5 * n) AS BIGINT) GROUP BY r.event_type),
        |x95 AS (SELECT r.event_type, max(r.value) AS p95_exact FROM r JOIN g USING (event_type)
        |        WHERE rn = CAST(ceil(0.95 * n) AS BIGINT) GROUP BY r.event_type)
        |SELECT g.event_type, g.n, g.vmin, g.vmax,
        |  g.vmin + (CAST(q50.qbin + 1 AS DOUBLE) * (g.vmax - g.vmin)) / 256 AS p50_est,
        |  g.vmin + (CAST(q95.qbin + 1 AS DOUBLE) * (g.vmax - g.vmin)) / 256 AS p95_est,
        |  x50.p50_exact, x95.p95_exact
        |FROM g JOIN q50 USING (event_type) JOIN q95 USING (event_type)
        |JOIN x50 USING (event_type) JOIN x95 USING (event_type)
        |ORDER BY g.event_type""".stripMargin,

    // bit interleave expanded term-by-term from ZOrder.Bits — generated
    // from the same constant as the JVM loop
    "q66_zorder" ->
      s"""SELECT event_id, user_id, epoch_us(ts) // 86400000000 AS day,
         |  ${zvalSql("user_id", "(epoch_us(ts) // 86400000000)")} AS zval
         |FROM events ORDER BY event_id""".stripMargin,

    // each branch replays one Check verbatim; CAST to BIGINT mirrors the
    // Spark side's metric.cast("long") (DuckDB's sum(CASE) is HUGEINT)
    "q115_data_audit" ->
      """SELECT check_name, metric, passed FROM (
        |  SELECT 'li_rowcount' AS check_name, CAST(count(*) AS BIGINT) AS metric,
        |         count(*) > 0 AS passed FROM lineitem
        |  UNION ALL
        |  SELECT 'li_qty_range_viol',
        |         CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT),
        |         sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) = 0
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'li_returnflag_domain_viol',
        |         CAST(sum(CASE WHEN l_returnflag NOT IN ('A','N','R') THEN 1 ELSE 0 END) AS BIGINT),
        |         sum(CASE WHEN l_returnflag NOT IN ('A','N','R') THEN 1 ELSE 0 END) = 0
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'li_shipdate_nulls',
        |         CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |         sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) = 0
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'ord_pk_dups',
        |         CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT),
        |         count(*) - count(DISTINCT o_orderkey) = 0
        |  FROM orders
        |  UNION ALL
        |  SELECT 'ord_totalprice_nonpos',
        |         CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT),
        |         sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) = 0
        |  FROM orders
        |  UNION ALL
        |  SELECT 'ord_custkey_orphans', CAST(count(*) AS BIGINT), count(*) = 0
        |  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        |  WHERE c.c_custkey IS NULL)
        |ORDER BY check_name""".stripMargin,

    // shard = the Mix64 coordinate mod 16; fp replays q35's rolling-31
    // HUGEINT hash (ASCII corpus) converted to signed before the BIGINT
    // bit_xor — XOR of identical bit patterns is representation-blind,
    // but the signed conversion keeps every emitted value Spark-equal
    "q117_shard_manifest" ->
      s"${manifestSql("")} ORDER BY shard",

    // base⊕delta replayed with the same monoid combines; the NULL-side
    // CASEs mirror the Spark when-chain exactly (a shard missing from
    // one side inherits the other side's min/max unchanged)
    "q118_manifest_apply" ->
      s"""WITH f AS (${manifestSql("")}),
         |b AS (${manifestSql("WHERE doc_id % 4 <> 0")}),
         |d AS (${manifestSql("WHERE doc_id % 4 = 0")}),
         |applied AS (
         |  SELECT shard,
         |    coalesce(b.n_docs, 0) + coalesce(d.n_docs, 0) AS a_docs,
         |    coalesce(b.n_tokens, 0) + coalesce(d.n_tokens, 0) AS a_tokens,
         |    xor(coalesce(b.content_xor, 0), coalesce(d.content_xor, 0)) AS a_xor,
         |    CASE WHEN b.min_doc_id IS NULL THEN d.min_doc_id
         |         WHEN d.min_doc_id IS NULL THEN b.min_doc_id
         |         ELSE least(b.min_doc_id, d.min_doc_id) END AS a_min,
         |    CASE WHEN b.max_doc_id IS NULL THEN d.max_doc_id
         |         WHEN d.max_doc_id IS NULL THEN b.max_doc_id
         |         ELSE greatest(b.max_doc_id, d.max_doc_id) END AS a_max
         |  FROM b FULL OUTER JOIN d USING (shard))
         |SELECT f.shard, f.n_docs, f.n_tokens, f.content_xor,
         |  f.min_doc_id, f.max_doc_id,
         |  a.a_docs, a.a_tokens, a.a_xor, a.a_min, a.a_max,
         |  (f.n_docs = a.a_docs AND f.n_tokens = a.a_tokens
         |   AND f.content_xor = a.a_xor AND f.min_doc_id = a.a_min
         |   AND f.max_doc_id = a.a_max) AS incremental_ok
         |FROM f JOIN applied a USING (shard)
         |ORDER BY shard""".stripMargin,

    // each audit CTE replays one Subject: left join against the request
    // list, FILTERed aggregates for after-count and survivor checksum
    // (sum of the low 20 bits of surviving row keys' Mix64 coords —
    // order-free and overflow-bounded, so any divergence in WHICH rows
    // survived flips the value)
    "q121_delete_propagate" ->
      s"""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS t_us, event_type
         |           FROM events),
         |req AS (SELECT DISTINCT user_id FROM e
         |        WHERE ${coordSql("user_id")} < ${Sampling.threshold(DeleteRate)}),
         |ev AS (
         |  SELECT 'events' AS tbl, CAST(count(*) AS BIGINT) AS rows_before,
         |    CAST(count(*) FILTER (r.user_id IS NULL) AS BIGINT) AS rows_after,
         |    CAST(coalesce(sum((${coordSql("e.event_id")}) % 1048576)
         |      FILTER (r.user_id IS NULL), 0) AS BIGINT) AS survivor_checksum
         |  FROM e LEFT JOIN req r ON e.user_id = r.user_id),
         |d0 AS (SELECT user_id, t_us // 86400000000 AS day, count(*) AS n
         |       FROM e GROUP BY 1, 2),
         |da AS (
         |  SELECT 'user_daily' AS tbl, CAST(count(*) AS BIGINT) AS rows_before,
         |    CAST(count(*) FILTER (r.user_id IS NULL) AS BIGINT) AS rows_after,
         |    CAST(coalesce(sum((${coordSql("(d0.user_id * 131072 + d0.day)")}) % 1048576)
         |      FILTER (r.user_id IS NULL), 0) AS BIGINT) AS survivor_checksum
         |  FROM d0 LEFT JOIN req r ON d0.user_id = r.user_id),
         |p0 AS (SELECT user_id, event_type, count(*) AS n
         |       FROM e GROUP BY 1, 2),
         |pr AS (
         |  SELECT 'user_profile' AS tbl, CAST(count(*) AS BIGINT) AS rows_before,
         |    CAST(count(*) FILTER (r.user_id IS NULL) AS BIGINT) AS rows_after,
         |    CAST(coalesce(sum((${coordSql("(p0.user_id * 1024 + ascii(p0.event_type))")}) % 1048576)
         |      FILTER (r.user_id IS NULL), 0) AS BIGINT) AS survivor_checksum
         |  FROM p0 LEFT JOIN req r ON p0.user_id = r.user_id)
         |SELECT tbl, rows_before, rows_after,
         |  rows_before - rows_after AS rows_deleted, survivor_checksum
         |FROM (SELECT * FROM ev UNION ALL SELECT * FROM da
         |      UNION ALL SELECT * FROM pr)
         |ORDER BY tbl""".stripMargin,

    // decimal value mass throughout (exact subtraction, double only at
    // the output boundary — the BASELINE float-parity technique); the
    // equality bits replay Spark's null-safe <=> as IS NOT DISTINCT FROM
    "q123_rollup_retract" ->
      s"""WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day,
         |             CAST(value AS DECIMAL(18,2)) AS v FROM events),
         |req AS (SELECT DISTINCT user_id FROM e
         |        WHERE ${coordSql("user_id")} < ${Sampling.threshold(DeleteRate)}),
         |f AS (SELECT day, CAST(count(*) AS BIGINT) AS n, sum(v) AS mass
         |      FROM e GROUP BY day),
         |d AS (SELECT day, CAST(count(*) AS BIGINT) AS dn, sum(v) AS dmass
         |      FROM e WHERE user_id IN (SELECT user_id FROM req) GROUP BY day),
         |inc AS (SELECT f.day, f.n - coalesce(d.dn, 0) AS inc_n,
         |          f.mass - coalesce(d.dmass, CAST(0 AS DECIMAL(18,2))) AS inc_mass
         |        FROM f LEFT JOIN d USING (day)
         |        WHERE f.n - coalesce(d.dn, 0) > 0),
         |rb AS (SELECT day, CAST(count(*) AS BIGINT) AS rb_n, sum(v) AS rb_mass
         |       FROM e WHERE user_id NOT IN (SELECT user_id FROM req)
         |       GROUP BY day)
         |SELECT day, rb_n, CAST(rb_mass AS DOUBLE) AS rb_mass,
         |  inc_n, CAST(inc_mass AS DOUBLE) AS inc_mass,
         |  (rb_n IS NOT DISTINCT FROM inc_n
         |   AND rb_mass IS NOT DISTINCT FROM inc_mass) AS retract_ok
         |FROM inc FULL OUTER JOIN rb USING (day)
         |ORDER BY day""".stripMargin,

    // the GROUND-TRUTH diff: no buckets, no fingerprints — raw text
    // compared through a direct full outer join
    "q124_snapshot_diff" ->
      """WITH b AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0),
        |c AS (SELECT doc_id,
        |        CASE WHEN doc_id % 7 = 0 THEN text || '!' ELSE text END AS text
        |      FROM documents WHERE doc_id % 5 <> 0),
        |j AS (SELECT coalesce(b.doc_id, c.doc_id) AS doc_id,
        |        CASE WHEN b.doc_id IS NULL THEN 'added'
        |             WHEN c.doc_id IS NULL THEN 'removed'
        |             WHEN b.text <> c.text THEN 'changed' END AS status
        |      FROM b FULL OUTER JOIN c ON b.doc_id = c.doc_id)
        |SELECT doc_id, status FROM j WHERE status IS NOT NULL
        |ORDER BY doc_id, status""".stripMargin,

    // the same three aggregation levels, cells replayed with the
    // countMinSql bucket convention (coordSql of term·131+r, mod a
    // power-of-two width)
    "q125_join_size" ->
      s"""WITH t AS (SELECT event_type, ((user_id % 256) + 256) % 256 AS term
         |           FROM events WHERE event_type IN ('click', 'purchase')),
         |pt AS (SELECT term,
         |         CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS nc,
         |         CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS np
         |       FROM t GROUP BY term),
         |cells AS (SELECT r.r,
         |            (${coordSql("(pt.term * 131 + r.r)")}) % $JoinSizeWidth AS bucket,
         |            CAST(sum(nc) AS BIGINT) AS c_cell,
         |            CAST(sum(np) AS BIGINT) AS p_cell,
         |            CAST(sum(nc * np) AS BIGINT) AS xb
         |          FROM pt CROSS JOIN range(0, $CmDepth) r(r) GROUP BY 1, 2),
         |byrow AS (SELECT r, CAST(sum(c_cell * p_cell) AS BIGINT) AS prod,
         |            CAST(sum(xb) AS BIGINT) AS exact_r,
         |            CAST(sum(c_cell) AS BIGINT) AS nc_r,
         |            CAST(sum(p_cell) AS BIGINT) AS np_r
         |          FROM cells GROUP BY r)
         |SELECT max(nc_r) AS n_clicks, max(np_r) AS n_purchases,
         |  max(exact_r) AS exact_size, min(prod) AS est_size,
         |  min(prod) >= max(exact_r) AS no_underestimate
         |FROM byrow""".stripMargin,

    // same top-10 + exact-integer share and ceil salt factor
    "q132_skew_advisor" ->
      s"""WITH f AS (SELECT user_id, CAST(count(*) AS BIGINT) AS freq
         |           FROM events GROUP BY user_id),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM events),
         |top AS (SELECT user_id, freq FROM f
         |        ORDER BY freq DESC, user_id LIMIT 10)
         |SELECT t.user_id, t.freq,
         |  CAST(t.freq * 1048576 // tot.total AS BIGINT) AS share_micro,
         |  CAST((t.freq * $SkewP + tot.total - 1) // tot.total AS BIGINT) AS salt_buckets
         |FROM top t CROSS JOIN tot
         |ORDER BY freq DESC, user_id""".stripMargin,

    // lossless round-trip is the CONTRACT: exactly (n, n, 0) per format
    "q145_interchange_roundtrip" ->
      """WITH n AS (SELECT CAST(count(*) AS BIGINT) AS c FROM documents)
        |SELECT f.format, n.c AS n_docs, n.c AS n_roundtrip,
        |  CAST(0 AS BIGINT) AS n_mismatched
        |FROM (SELECT 'csv' AS format UNION ALL SELECT 'jsonl'
        |      UNION ALL SELECT 'orc') f CROSS JOIN n
        |ORDER BY format""".stripMargin,

    // the same integer decay fold: day cells, k half-lives, 2^20 >> k
    "q127_trending" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |ks AS (
        |  SELECT event_type, n,
        |    ((SELECT max(day) FROM daily) - day) // 7 AS k
        |  FROM daily)
        |SELECT event_type,
        |  CAST(sum(n * (CASE WHEN k > 20 THEN 0 ELSE 1048576 >> k END)) AS BIGINT)
        |    AS decay_micro,
        |  CAST(sum(n) AS BIGINT) AS n_events
        |FROM ks GROUP BY event_type
        |ORDER BY decay_micro DESC, event_type""".stripMargin)

  /** The q117 manifest as DuckDB SQL over `documents` with an optional
    * row predicate — q118 instantiates it three times (full/base/delta). */
  private def manifestSql(where: String): String =
    s"""SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       |  bit_xor(fp) AS content_xor,
       |  min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
       |FROM (
       |  SELECT doc_id, shard, n_tok,
       |    CAST(CASE WHEN hh >= 9223372036854775808::HUGEINT
       |              THEN hh - 18446744073709551616::HUGEINT ELSE hh END AS BIGINT) AS fp
       |  FROM (
       |    SELECT doc_id, CAST(${coordSql("doc_id")} % 16 AS BIGINT) AS shard,
       |      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
       |      list_reduce(
       |        list_prepend(CAST(1125899906842597 AS HUGEINT),
       |          list_transform(range(1, length(text) + 1), i -> CAST(ascii(substr(text, i, 1)) AS HUGEINT))),
       |        (a, b) -> (a * 31 + b) % 18446744073709551616::HUGEINT) AS hh
       |    FROM documents $where))
       |GROUP BY shard""".stripMargin

  /** Σ_b ((x>>b)&1)·2^(2b) + ((y>>b)&1)·2^(2b+1) — [[ZOrder.interleave]]
    * unrolled as DuckDB SQL (inputs here are < 2^16, matching the mask). */
  private def zvalSql(x: String, y: String): String =
    (0 until graft.functions.ZOrder.Bits).flatMap(b => Seq(
      s"((($x >> $b) & 1) << ${2 * b})",
      s"((($y >> $b) & 1) << ${2 * b + 1})")).mkString(" + ")
}
