package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Mix64

/** Snapshot diff with bucket-fingerprint pruning — the data-versioning
  * primitive: which rows were added, removed, or changed between two
  * published snapshots of a keyed table?
  *
  * The naive diff is a full-outer join of two whole snapshots — at 100 TB
  * that shuffles both corpora to compare mostly-identical rows. This
  * operator is two-phase:
  *
  *   1. Each side folds into per-bucket signatures (count + XOR + sum of
  *      the rows' content fingerprints; bucket = Mix64(key) mod nBuckets)
  *      — a map-side-combinable aggregate producing nBuckets rows per
  *      side, no matter the corpus size.
  *   2. Only buckets whose signatures differ ("dirty") are detail-diffed:
  *      the dirty-bucket list is broadcast back as a semi-join filter, so
  *      the expensive key-level full outer join touches only the changed
  *      slice. With B buckets and d dirty ones, the detail shuffle is
  *      ~d/B of the corpus — the common few-changes publish diffs almost
  *      for free.
  *
  * The bucket skip is sound up to 64-bit fingerprint collisions (two
  * DIFFERENT bucket contents agreeing on count, XOR and wrap-sum
  * simultaneously — vanishing for non-adversarial data, and any such skip
  * is caught by the oracle's direct diff in testing). Fingerprints must be
  * BIGINT content hashes computed the same way on both sides (e.g.
  * [[graft.text.TextAnalysis.contentFingerprint]]).
  */
object SnapshotDiff {

  /** Rows that differ between `base` and `cur`, as `(key, status)` with
    * status ∈ added | removed | changed (relative to base → cur).
    *
    * @param keyCol BIGINT row identity
    * @param fpCol  BIGINT content fingerprint of the row's compared value */
  def diff(base: DataFrame, cur: DataFrame, keyCol: String, fpCol: String,
           nBuckets: Int): DataFrame = {
    require(nBuckets >= 1, s"nBuckets $nBuckets must be >= 1")
    def sided(df: DataFrame): DataFrame =
      df.select(col(keyCol).cast("long").as("k"), col(fpCol).as("fp"))
        .withColumn("bucket", pmod(Mix64.sampleCoord(col("k")), lit(nBuckets.toLong)))
    def signature(df: DataFrame, p: String): DataFrame =
      df.groupBy("bucket").agg(count(lit(1)).as(s"${p}_n"),
        expr("bit_xor(fp)").as(s"${p}_x"),
        // a plain sum(fp) overflows ANSI BIGINT; summing the low 20 bits
        // of the re-mixed Mix64 coordinate keeps the BIGINT sum exact to
        // ~8.8e12 rows PER BUCKET (far past any realistic bucket), and
        // the re-mix keeps the component independent of the XOR's bit
        // algebra
        sum(pmod(Mix64.sampleCoord(col("fp")), lit(1048576L))).as(s"${p}_s"))
    val b = sided(base)
    val c = sided(cur)
    val dirty = signature(b, "b").join(signature(c, "c"), Seq("bucket"), "full_outer")
      .where(!(col("b_n") <=> col("c_n")) || !(col("b_x") <=> col("c_x"))
        || !(col("b_s") <=> col("c_s")))
      .select("bucket")
    val dirtyB = broadcast(dirty)
    b.join(dirtyB, "bucket").select(col("k"), col("fp").as("b_fp"))
      .join(c.join(dirtyB, "bucket").select(col("k"), col("fp").as("c_fp")),
        Seq("k"), "full_outer")
      .select(col("k").as(keyCol),
        when(col("b_fp").isNull, "added")
          .when(col("c_fp").isNull, "removed")
          .when(col("b_fp") =!= col("c_fp"), "changed")
          .as("status"))
      .where(col("status").isNotNull)
  }
}
