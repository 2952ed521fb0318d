package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}

/** Portable Bloom filter for join-side pruning — the shuffle killer for
  * selective joins at 100 TB: aggregate the SMALL side's keys into a
  * fixed-size bitset (a mergeable [[TypedImperativeAggregate]] — partials
  * are one bitset per partition), broadcast it, and filter the BIG side
  * BEFORE its shuffle/join. No false negatives, so pruned ⋈ small ≡
  * big ⋈ small exactly — which is what makes the whole pattern
  * oracle-checkable with the plain join SQL (q69). False positives only
  * cost the downstream join a few extra probe rows.
  *
  * Spark's own runtime bloom injection (`runtime.bloomFilter.enabled`)
  * covers the same shape opportunistically; this explicit form is for
  * pipelines that PERSIST the filter (write once per dim-table refresh,
  * prune every fact scan) and for engines/oracles outside Spark: positions
  * come from splitmix64 double hashing (h1 + i·h2, h2 forced odd), all
  * wrapping integer math — DuckDB replays the bitset probe verbatim if
  * ever needed.
  */
object Bloom {
  /** Aggregate BIGINT keys into a bitset of `numBits` (power of two). */
  def buildAgg(key: Column, numBits: Int, numHashes: Int): Column =
    toColumn(BloomBuildAgg(toExpr(key), numBits, numHashes).toAggregateExpression())

  /** Build and MATERIALIZE the bitset (a few KB) on the driver — the
    * production shape: built once per build-side refresh, then inlined as a
    * LITERAL into any number of fact scans. A literal keeps the probe a
    * narrow filter directly above the scan, where it must sit: left as a
    * joined column, Catalyst may reorder the actual join below the probe
    * and the prefilter prunes nothing. */
  def build(df: org.apache.spark.sql.DataFrame, key: Column,
            numBits: Int, numHashes: Int): Array[Long] =
    df.agg(buildAgg(key, numBits, numHashes).as("bf"))
      .head().getSeq[Long](0).toArray

  /** True iff `key` may be in the set `bitset` encodes (never false for an
    * inserted key). */
  def mightContain(bitset: Column, key: Column, numHashes: Int): Column =
    toColumn(BloomMightContain(toExpr(bitset), toExpr(key), numHashes))

  private val H2Salt = 0x6A09E667F3BCC909L // √2 fractional bits

  /** Bit position of probe i for key x in a `numBits` filter. */
  def position(x: Long, i: Int, numBits: Int): Int = {
    val h1 = Hyperplane.mix(x)
    val h2 = Hyperplane.mix(x ^ H2Salt) | 1L // odd → cycles all positions
    (((h1 + i * h2) >>> 1) % numBits).toInt  // >>> 1: non-negative dividend
  }

  def setBit(bits: Array[Long], pos: Int): Unit =
    bits(pos >> 6) |= (1L << (pos & 63))

  def getBit(bits: Array[Long], pos: Int): Boolean =
    (bits(pos >> 6) & (1L << (pos & 63))) != 0

  /** Probe, reading ArrayData in place (no per-row materialization) —
    * shared by interpreted eval and generated code. */
  def mightContainEval(arr: ArrayData, x: Long, numHashes: Int): Boolean = {
    val numBits = arr.numElements() * 64
    var i = 0
    while (i < numHashes) {
      val pos = position(x, i, numBits)
      if (((arr.getLong(pos >> 6) >>> (pos & 63)) & 1L) == 0L) return false
      i += 1
    }
    true
  }
}

case class BloomBuildAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {
  require(numBits >= 64 && (numBits & (numBits - 1)) == 0,
    s"numBits must be a power of two >= 64, got $numBits")
  require(numHashes >= 1 && numHashes <= 16, s"numHashes in [1,16], got $numHashes")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_build requires BIGINT, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      var i = 0
      while (i < numHashes) {
        Bloom.setBit(buf, Bloom.position(x, i, numBits))
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(offset: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): BloomBuildAgg =
    copy(child = c)
  override def prettyName: String = "bloom_build"
}

case class BloomMightContain(left: Expression, right: Expression, numHashes: Int)
    extends BinaryExpression with BinaryLike[Expression] {
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires (ARRAY<BIGINT>, BIGINT), got " +
        s"(${l.catalogString}, ${r.catalogString})")
  }
  override def nullSafeEval(bitsRaw: Any, keyRaw: Any): Any =
    Bloom.mightContainEval(bitsRaw.asInstanceOf[ArrayData],
      keyRaw.asInstanceOf[Long], numHashes)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (b, k) =>
      s"graft.functions.Bloom.mightContainEval($b, $k, $numHashes)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BloomMightContain =
    copy(left = l, right = r)
  override def prettyName: String = "bloom_might_contain"
}
