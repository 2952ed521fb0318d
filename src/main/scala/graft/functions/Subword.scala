package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL surface for the greedy longest-prefix subword segmentation
  * ([[graft.text.TextAnalysis.subwordCount]], q178): one pass over a text,
  * split on the SPACE character — the corpus tokenization and the q178
  * oracle's `string_split(text, ' ')` convention; q30's `\s+` regex is
  * the general-whitespace counter, so an embedded tab/newline stays
  * INSIDE its word here and its characters count as unknown tokens —
  * each word charged its WordPiece-style unit count. Returns
  * (n_words, n_subwords) so a token-budget projection needs one
  * expression, not a per-word explode. NULL text → NULL (nullIntolerant,
  * like every scalar function here). */
object Subword {
  def subwordStats(text: Column): Column = toColumn(SubwordStatsExpr(toExpr(text)))

  def compute(text: UTF8String): Any = {
    val s = text.toString
    var nWords = 0L
    var nSub = 0L
    var i = 0
    while (i < s.length) {
      while (i < s.length && s.charAt(i) == ' ') i += 1
      if (i < s.length) {
        val start = i
        while (i < s.length && s.charAt(i) != ' ') i += 1
        nWords += 1
        nSub += graft.text.TextAnalysis.subwordCount(s.substring(start, i))
      }
    }
    org.apache.spark.sql.catalyst.InternalRow(nWords, nSub)
  }
}

case class SubwordStatsExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(
    StructField("n_words", LongType, nullable = false) ::
    StructField("n_subwords", LongType, nullable = false) :: Nil)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"subword_stats requires STRING, got ${other.catalogString}")
  }
  override def nullSafeEval(v: Any): Any =
    Subword.compute(v.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): SubwordStatsExpr =
    copy(child = c)
  override def prettyName: String = "subword_stats"
}
