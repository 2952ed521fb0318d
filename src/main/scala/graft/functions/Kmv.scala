package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType, StructField, StructType}

/** KMV (k-minimum-values) distinct-count sketch over BIGINT keys — the
  * classic bottom-k estimator: keep the k smallest distinct values of a
  * uniform hash; if the kth smallest is h_k on a [0, 2^63) scale, distinct
  * ≈ (k−1)·2^63/h_k. Implemented as a [[TypedImperativeAggregate]], so it
  * aggregates the way a sketch must at 100 TB: per-partition partial
  * buffers (bounded at k longs each), merged pairwise on the reduce side —
  * the full key set never shuffles, unlike exact count-distinct whose
  * expand/dedup shuffle carries every key.
  *
  * Everything is deterministic and PORTABLE: the hash is the [[Mix64]]
  * multiply-add bijection ((key·A + B) mod 2^64) >>> 1 and the estimate is
  * one double division of exact integers, so a DuckDB oracle reproduces the
  * sketch bit-for-bit (see q59) — approximation error is a checked QUANTITY,
  * not a tolerance.
  *
  * Returns struct(n_kept, kth_min, est): below saturation the sketch has
  * seen every distinct hash and est is exact (kth_min null); at saturation
  * est is the bottom-k estimate.
  */
object Kmv {
  /** 63-bit portable hash: distinct keys collide only if their mixes differ
    * in bit 0 alone (the mix itself is a bijection). */
  def hash63(x: Long): Long = (x * Mix64.MulA + Mix64.AddB) >>> 1

  val Scale: Double = 9.223372036854775808e18 // 2^63 (exact as a double)

  def kmvDistinct(key: Column, k: Int): Column =
    toColumn(KmvDistinct(toExpr(key), k).toAggregateExpression())

  def estimate(k: Int, kthMin: Long): Double =
    ((k - 1).toDouble * Scale) / kthMin.toDouble

  /** Insert a hash into a bottom-k buffer (shared by the batch aggregate
    * and the streaming state fold — one definition, one semantics). */
  def add(buf: java.util.TreeSet[java.lang.Long], h: Long, k: Int): Unit =
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last) { if (buf.add(h)) buf.pollLast(); () }

  /** (n_kept, kth_min, est) of a buffer — est is exact below saturation. */
  def stats(buf: java.util.TreeSet[java.lang.Long], k: Int): (Int, Option[Long], Double) =
    if (buf.size >= k) {
      val kth = buf.last.longValue()
      (buf.size, Some(kth), estimate(k, kth))
    } else (buf.size, None, buf.size.toDouble)
}

case class KmvDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {
  require(k >= 2, s"kmv k must be >= 2, got $k")

  override def dataType: DataType = StructType(
    StructField("n_kept", IntegerType, nullable = false) ::
    StructField("kth_min", LongType, nullable = true) ::
    StructField("est", DoubleType, nullable = false) :: Nil)
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kmv_distinct requires BIGINT, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) Kmv.add(buf, Kmv.hash63(v.asInstanceOf[Long]), k)
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) Kmv.add(buf, it.next(), k)
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val (n, kth, est) = Kmv.stats(buf, k)
    new GenericInternalRow(Array[Any](n, kth.orNull, est))
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val buf = createAggregationBuffer()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) buf.add(bb.getLong)
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvDistinct =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): KmvDistinct =
    copy(child = c)
  override def prettyName: String = "kmv_distinct"
}
