package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass repetition statistics of a document — the Gopher/RefinedWeb
  * repetition signals (most-repeated word n-gram, duplicate-word mass) used
  * to drop boilerplate and spam from web-scale training corpora.
  *
  * Tokenization is EXACTLY `string_split(text, ' ')`: split on every single
  * 0x20 byte, empty tokens kept — chosen over `\s+` so a DuckDB oracle can
  * reproduce the semantics verbatim. Grams are consecutive-word slices of
  * the ORIGINAL byte buffer (separators are single spaces by construction,
  * so no join allocation). Ties on the top count resolve to the
  * binary-smallest gram — UTF8String byte order == DuckDB's default VARCHAR
  * collation (Java String order would diverge on non-ASCII).
  *
  * Returns struct(n_words, n_distinct_words, top2_gram, top2_cnt,
  * top3_gram, top3_cnt); the top fields are null when the text has fewer
  * than n words. Narrow per-row projection — no shuffle, scales linearly.
  */
object Repetition {
  def repetitionStats(text: Column): Column =
    toColumn(RepetitionStatsExpr(toExpr(text)))

  val Ns: Seq[Int] = Seq(2, 3)

  def compute(s: UTF8String): InternalRow = {
    val bytes = s.getBytes
    val n = bytes.length
    // word boundaries: starts(i) .. ends(i) byte ranges between 0x20 bytes
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    var i = 0
    var start = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        starts.add(start); ends.add(i); start = i + 1
      }
      i += 1
    }
    val nWords = starts.size()
    val distinct = new java.util.HashSet[UTF8String]()
    var w = 0
    while (w < nWords) {
      distinct.add(UTF8String.fromBytes(bytes, starts.get(w), ends.get(w) - starts.get(w)))
      w += 1
    }

    val out = new Array[Any](2 + 2 * Ns.length)
    out(0) = nWords
    out(1) = distinct.size()
    var ni = 0
    while (ni < Ns.length) {
      val gn = Ns(ni)
      if (nWords >= gn) {
        val counts = new java.util.HashMap[UTF8String, Int]()
        var g = 0
        while (g + gn <= nWords) {
          val from = starts.get(g)
          val until = ends.get(g + gn - 1)
          val gram = UTF8String.fromBytes(bytes, from, until - from)
          counts.merge(gram, 1, (a, b) => a + b)
          g += 1
        }
        var bestGram: UTF8String = null
        var bestCnt = 0
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue > bestCnt ||
              (e.getValue == bestCnt && e.getKey.compareTo(bestGram) < 0)) {
            bestGram = e.getKey; bestCnt = e.getValue
          }
        }
        out(2 + 2 * ni) = bestGram
        out(3 + 2 * ni) = bestCnt
      } // else leave nulls
      ni += 1
    }
    new GenericInternalRow(out)
  }
}

case class RepetitionStatsExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(
    StructField("n_words", IntegerType, nullable = false) ::
    StructField("n_distinct_words", IntegerType, nullable = false) ::
    Repetition.Ns.toList.flatMap(n =>
      StructField(s"top${n}_gram", StringType, nullable = true) ::
      StructField(s"top${n}_cnt", IntegerType, nullable = true) :: Nil))
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"repetition_stats requires STRING, got ${other.catalogString}")
  }
  override def nullSafeEval(v: Any): Any =
    Repetition.compute(v.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): RepetitionStatsExpr =
    copy(child = c)
  override def prettyName: String = "repetition_stats"
}
