package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass whitespace-token statistics of a string:
  * (ws_tokens, stop_hits, len_sum) — token count, stopword hits
  * (lowercased match) and summed token length in characters. Semantics are
  * EXACTLY the composed-HOF forms over `split(text, "\\s+")` (Java regex
  * `\s` = ASCII whitespace incl. `\x0B`; empty tokens dropped; stopword
  * match after `UTF8String.toLowerCase` — the same lowercasing `lower()`
  * uses), but in a single byte-level scan instead of three interpreted
  * higher-order-function pipelines per row (TextSpec pins ≡). Whitespace
  * bytes are all ASCII, so UTF-8 byte scanning is token-safe (continuation
  * bytes have the high bit set).
  */
object TextStats {
  def textStats(text: Column, stopwords: Seq[String]): Column =
    toColumn(TextStatsExpr(toExpr(text), stopwords))

  def compute(s: UTF8String, stops: java.util.HashSet[UTF8String]): InternalRow = {
    val bytes = s.getBytes
    val n = bytes.length
    var tokens = 0
    var hits = 0
    var lenSum = 0L
    var i = 0
    var start = -1
    while (i <= n) {
      val isWs = i == n || {
        val b = bytes(i)
        b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'
      }
      if (isWs) {
        if (start >= 0) {
          val tok = UTF8String.fromBytes(bytes, start, i - start)
          tokens += 1
          lenSum += tok.numChars()
          if (!stops.isEmpty && stops.contains(tok.toLowerCase)) hits += 1
          start = -1
        }
      } else if (start < 0) start = i
      i += 1
    }
    new GenericInternalRow(Array[Any](tokens, hits, lenSum))
  }
}

/** Per-profile stopword hit counts in ONE tokenization pass: for each of
  * `profiles` (ordered), how many whitespace tokens of the text (lowercased
  * per token — same as `lower()`) belong to that profile's word set.
  * Returns ARRAY<INT> in profile order — the language-id scoring loop
  * without re-tokenizing per profile. Token semantics identical to
  * [[TextStatsExpr]]. */
object StopwordProfileHits {
  def profileHits(text: Column, profiles: Seq[Seq[String]]): Column =
    toColumn(StopwordProfileHitsExpr(toExpr(text), profiles))

  def compute(s: UTF8String, sets: Array[java.util.HashSet[UTF8String]]): org.apache.spark.sql.catalyst.util.ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val hits = new Array[Int](sets.length)
    var i = 0
    var start = -1
    while (i <= n) {
      val isWs = i == n || {
        val b = bytes(i)
        b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'
      }
      if (isWs) {
        if (start >= 0) {
          val low = UTF8String.fromBytes(bytes, start, i - start).toLowerCase
          var p = 0
          while (p < sets.length) {
            if (sets(p).contains(low)) hits(p) += 1
            p += 1
          }
          start = -1
        }
      } else if (start < 0) start = i
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(hits)
  }
}

case class StopwordProfileHitsExpr(child: Expression, profiles: Seq[Seq[String]])
    extends UnaryExpression with CodegenFallback {
  @transient private lazy val sets: Array[java.util.HashSet[UTF8String]] =
    profiles.map { ws =>
      val set = new java.util.HashSet[UTF8String]()
      ws.foreach(w => set.add(UTF8String.fromString(w)))
      set
    }.toArray
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"stopword_profile_hits requires STRING, got ${child.dataType.catalogString}")
  override def nullSafeEval(v: Any): Any =
    StopwordProfileHits.compute(v.asInstanceOf[UTF8String], sets)
  override protected def withNewChildInternal(newChild: Expression): StopwordProfileHitsExpr =
    copy(child = newChild)
  override def prettyName: String = "stopword_profile_hits"
}

case class TextStatsExpr(child: Expression, stopwords: Seq[String])
    extends UnaryExpression with CodegenFallback {
  @transient private lazy val stopSet: java.util.HashSet[UTF8String] = {
    val set = new java.util.HashSet[UTF8String]()
    stopwords.foreach(w => set.add(UTF8String.fromString(w)))
    set
  }
  override def dataType: DataType = StructType(Seq(
    StructField("ws_tokens", IntegerType, nullable = false),
    StructField("stop_hits", IntegerType, nullable = false),
    StructField("len_sum", LongType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"text_stats requires STRING, got ${child.dataType.catalogString}")
  override def nullSafeEval(v: Any): Any =
    TextStats.compute(v.asInstanceOf[UTF8String], stopSet)
  override protected def withNewChildInternal(newChild: Expression): TextStatsExpr =
    copy(child = newChild)
  override def prettyName: String = "text_stats"
}
