package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Count-Min frequency sketch over BIGINT terms — the point-frequency
  * member of the engine's sketch family (KMV = distinct, Bloom =
  * membership, histogram = quantiles, Misra–Gries = top-k candidates,
  * Count-Min = per-term count estimates). State is a fixed depth×width
  * matrix of counters: `update` adds 1 to one cell per row, `merge` is
  * elementwise sum — partials are bounded at depth·width longs per
  * partition FOREVER and combine map-side, so the term dictionary never
  * rides a shuffle. The estimate for a term is the MIN over its depth
  * cells; with only increments it can only OVER-estimate (est ≥ exact),
  * and E[err] ≤ n/width per row — both properties are driver-checked as
  * data by q104, not asserted as a tolerance.
  *
  * Bucketing is the PORTABLE [[Mix64]] coordinate — bucket(t, r) =
  * sample_coord(t·131 + r) mod width — so a DuckDB oracle reproduces
  * every cell, every estimate, bit-for-bit (width a power of two keeps
  * the mod exact under DuckDB's signed %, after the usual non-negative
  * normalization; see the q104 oracle).
  */
object CountMin {
  /** Row-r bucket of a term (portable; width must be a power of two).
    *
    * Domain note: the JVM computes term·131 + r with wrap-mod-2^64
    * semantics, which the HUGEINT oracle replays exactly; but the
    * COLUMN-side estimate read ([[estimateCol]]) computes the same key
    * with ANSI arithmetic, which THROWS past |term| ≈ 2^63/131. Keep
    * bucketed terms within that range (hash raw 64-bit ids down first). */
  def bucket(term: Long, r: Int, width: Int): Int =
    (Mix64.hash(term * 131L + r) % width).toInt

  def countMin(term: Column, depth: Int, width: Int): Column =
    toColumn(CountMinAgg(toExpr(term), depth, width).toAggregateExpression())

  /** Read a term's estimate off a sketch matrix column: min over the
    * term's depth cells — the ONE definition of the estimate path, shared
    * by q104 (batch), q105 (stream-end state) and the specs, and mirrored
    * by the countMinSql oracle generator. */
  def estimateCol(cm: Column, term: Column, depth: Int, width: Int): Column = {
    import org.apache.spark.sql.functions.{element_at, least, lit, pmod}
    (0 until depth).map { r =>
      element_at(cm, (lit(r * width) +
        pmod(Mix64.sampleCoord(term * lit(131L) + lit(r.toLong)), lit(width)) +
        1).cast("int"))
    }.reduce(least(_, _))
  }
}

/** term (BIGINT) → array<long> of depth·width cell counts (row-major). */
case class CountMinAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {
  require(depth >= 1 && depth <= 16, s"count_min depth must be in [1,16], got $depth")
  require(width >= 2 && (width & (width - 1)) == 0,
    s"count_min width must be a power of two >= 2 (portable mod), got $width")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"count_min requires BIGINT, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val t = v.asInstanceOf[Long]
      var r = 0
      while (r < depth) {
        buf(r * width + CountMin.bucket(t, r, width)) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val buf = createAggregationBuffer()
    val bb = ByteBuffer.wrap(bytes)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CountMinAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): CountMinAgg =
    copy(child = c)
  override def prettyName: String = "count_min"
}
