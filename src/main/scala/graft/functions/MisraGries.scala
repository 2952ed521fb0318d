package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch over STRING items — the missing member
  * of the sketch family next to KMV (distinct), Bloom (membership) and the
  * histogram (quantiles): at most k counters, O(1) amortized per item,
  * merged with the Agarwal et al. mergeable-summaries rule (combine, then
  * subtract the (k+1)-th largest count). The guarantee that matters for a
  * 100 TB frequency pass: ANY item with true frequency > n/(k+1) is present
  * in the merged sketch, whatever the partitioning or merge order — so a
  * cheap bounded-state pass yields a small candidate set that an exact
  * count (broadcast semi join) then verifies. Counts in the sketch are
  * LOWER bounds with deficit ≤ n/(k+1); the candidate SET (not the counts)
  * is what downstream consumers may rely on.
  *
  * Returns array<struct<term, cnt_lower>> sorted by term, so the emitted
  * value is deterministic for a fixed merge tree; across different merge
  * trees only the superset guarantee is stable — which is exactly what the
  * registered query (q76) consumes before its exact-verify join.
  */
object MisraGries {
  def misraGries(item: Column, k: Int): Column =
    toColumn(MisraGriesAgg(toExpr(item), k).toAggregateExpression())

  /** One MG update step: increment, insert, or decrement-all. */
  def add(buf: mutable.HashMap[UTF8String, Long], term: UTF8String, w: Long, k: Int): Unit =
    buf.get(term) match {
      case Some(c) => buf.update(term, c + w)
      case None if buf.size < k => buf.update(term, w)
      case None =>
        // no free counter: decrement all by min(w, smallest counter) —
        // with w=1 this is the classic decrement-all step
        val dec = math.min(w, buf.valuesIterator.min)
        val dead = mutable.ArrayBuffer[UTF8String]()
        buf.mapValuesInPlace((_, c) => c - dec)
        buf.foreach { case (t, c) => if (c <= 0) dead += t }
        dead.foreach(buf.remove)
        val rem = w - dec
        if (rem > 0) add(buf, term, rem, k)
    }

  /** Mergeable-summaries combine: sum counts, then if over k counters
    * subtract the (k+1)-th largest count from every counter and drop the
    * non-positive ones — size returns to ≤ k, total error stays ≤ n/(k+1). */
  def merge(buf: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long], k: Int): Unit = {
    other.foreach { case (t, c) =>
      buf.update(t, buf.getOrElse(t, 0L) + c)
    }
    if (buf.size > k) {
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val kth1 = counts(counts.length - (k + 1)) // (k+1)-th largest
      val dead = mutable.ArrayBuffer[UTF8String]()
      buf.mapValuesInPlace((_, c) => c - kth1)
      buf.foreach { case (t, c) => if (c <= 0) dead += t }
      dead.foreach(buf.remove)
    }
  }
}

case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
  with UnaryLike[Expression] {
  require(k >= 1, s"misra_gries k must be >= 1, got $k")

  override def dataType: DataType = ArrayType(StructType(
    StructField("term", StringType, nullable = false) ::
    StructField("cnt_lower", LongType, nullable = false) :: Nil),
    containsNull = false)
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"misra_gries requires STRING, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    // clone: the eval result may be backed by a reused row buffer
    if (v != null) MisraGries.add(buf, v.asInstanceOf[UTF8String].clone(), 1L, k)
    buf
  }

  override def merge(
      buf: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    MisraGries.merge(buf, other, k)
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val sorted = buf.toArray.sortBy(_._1)
    new GenericArrayData(sorted.map { case (t, c) =>
      new GenericInternalRow(Array[Any](t, c)): Any
    })
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    var bytes = 4
    buf.foreach { case (t, _) => bytes += 4 + t.numBytes() + 8 }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buf.size)
    buf.foreach { case (t, c) =>
      val b = t.getBytes
      bb.putInt(b.length); bb.put(b); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val buf = createAggregationBuffer()
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.update(UTF8String.fromBytes(b), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): MisraGriesAgg =
    copy(child = c)
  override def prettyName: String = "misra_gries"
}
