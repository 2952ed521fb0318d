package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** HyperLogLog distinct-count sketch over BIGINT keys — the canonical
  * cardinality estimator, completing the sketch family next to KMV (the
  * engine's other distinct sketch; KMV keeps k hashes, HLL keeps m
  * 6-bit-ish registers — constant 64 ints here, the smaller state for
  * the same error class). State is m = 2^p max-rank registers: `update`
  * is an elementwise max against one bucket, `merge` is elementwise max
  * of two register arrays — idempotent, commutative, associative, so
  * partials combine map-side, duplicates are free, and the stream-end
  * state of any micro-batch slicing equals the batch sketch (the property
  * the streaming twin rides; see SketchStream.hllSketch).
  *
  * PORTABILITY (the whole point of this parameterization): the hash is a
  * splitmix64-style finalizer — add the golden gamma ([[Mix64.MulA]]),
  * then two xorshift-multiply rounds and a final xorshift — NOT the bare
  * [[Mix64]] multiply-add: HLL ranks are leading-zero counts, and a
  * (near-)linear map sends arithmetic key sequences (sequential user
  * ids!) to arithmetic progressions whose leading-zero statistics are
  * structured, biasing the estimate up to ±90%. The finalizer's xorshifts
  * break that linearity (measured ≤ 2σ on sequential/strided/negative key
  * patterns). It stays DuckDB-replayable because HUGEINT has xor and >>,
  * and both multipliers are odd constants BELOW 2^63 (0x5851F42D4C957F2D,
  * the PCG multiplier, and [[Mix64.AddB]]) so z·C < 2^127 never overflows
  * the 128-bit HUGEINT. bucket = top p bits, rank = leading zeros of the
  * remaining 64−p bits + 1 (i.e. 59 − bitlen at p=6), CAPPED at 48. The cap keeps the harmonic-mean denominator
  * Σ_j 2^(48−M_j) ≤ m·2^48 an EXACT BIGINT on both engines (no decimal,
  * no float sum — order-free), and the estimate αm²·2^48 / ind is then
  * ONE double division of exact integers — bit-identical in DuckDB, so
  * even the approximation itself is oracle-checked (the q59 KMV
  * argument). A rank > 48 needs 48 leading zeros (p ≈ 2^−48); the cap is
  * part of the defined semantics, applied identically on both sides.
  * No small-range (linear-counting) correction: it needs a transcendental
  * ln whose cross-engine rounding is not exactly specified; n_zero is
  * emitted so a consumer can apply any correction downstream.
  */
object Hll {
  /** log2(m): 64 registers — one cache line of bytes, ~13% rel. error. */
  val P = 6
  val M: Int = 1 << P
  /** Rank cap — see portability note above. */
  val RankCap = 48
  /** α_64 from Flajolet et al. 2007 (m = 64 ⇒ 0.709 exactly). */
  val Alpha = 0.709
  /** α·m²·2^48 as one fixed evaluation tree; the SQL generator embeds
    * Double.toString of THIS value (shortest round-trip repr), so the two
    * engines never re-derive it. */
  val EstNum: Double = Alpha * (M.toDouble * M.toDouble) * (1L << RankCap).toDouble

  /** First xorshift-multiply multiplier: the PCG-LCG constant — odd (a
    * bijection of Z_2^64) and < 2^63 (HUGEINT-overflow-safe, see above). */
  val MulC1 = 0x5851F42D4C957F2DL
  /** Second multiplier: [[Mix64.AddB]] — odd, < 2^63. */
  val MulC2: Long = Mix64.AddB

  /** The full avalanche mix (splitmix64 shape, overflow-safe constants);
    * wrap-mod-2^64 by JVM semantics, mirrored in HUGEINT by the oracle. */
  def mix(key: Long): Long = {
    var z = key + Mix64.MulA // golden gamma
    z = (z ^ (z >>> 30)) * MulC1
    z = (z ^ (z >>> 27)) * MulC2
    z ^ (z >>> 31)
  }

  /** (bucket, capped rank) of a key — the one definition, used by the
    * batch aggregate, the streaming fold, and mirrored by the oracle. */
  def register(key: Long): (Int, Int) = {
    val h = mix(key)
    val bucket = (h >>> (64 - P)).toInt
    val rem = h << P // remaining 64-p bits, left-aligned
    val rank = if (rem == 0L) 64 - P + 1
               else java.lang.Long.numberOfLeadingZeros(rem) + 1
    (bucket, math.min(rank, RankCap))
  }

  /** Fold one key into a register array (shared batch/stream update). */
  def add(regs: Array[Int], key: Long): Unit = {
    val (b, r) = register(key)
    if (r > regs(b)) regs(b) = r
  }

  /** Elementwise max (shared batch/stream merge). */
  def merge(into: Array[Int], other: Array[Int]): Unit = {
    var i = 0
    while (i < into.length) {
      if (other(i) > into(i)) into(i) = other(i)
      i += 1
    }
  }

  /** key (BIGINT) → array<int> of m registers, indexed by bucket. */
  def hll(key: Column): Column =
    toColumn(HllAgg(toExpr(key)).toAggregateExpression())
}

case class HllAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]]
  with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hll requires BIGINT, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Array[Int] = new Array[Int](Hll.M)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) Hll.add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Array[Int], other: Array[Int]): Array[Int] = {
    Hll.merge(buf, other)
    buf
  }

  override def eval(buf: Array[Int]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Int]): Array[Byte] = {
    // registers are ≤ 59 < 128: one byte each
    val out = new Array[Byte](buf.length)
    var i = 0
    while (i < buf.length) { out(i) = buf(i).toByte; i += 1 }
    out
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val buf = new Array[Int](bytes.length)
    var i = 0
    while (i < buf.length) { buf(i) = bytes(i).toInt; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): HllAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HllAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): HllAgg =
    copy(child = c)
  override def prettyName: String = "hll"
}
