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

  /** [[subwordStats]] against a TRAINED vocab passed as data — the
    * production tokenization shape: a vocab table (one unit per row) is
    * collected to the driver (bounded model state, loud 1<<22 ceiling in
    * [[graft.text.TextAnalysis.buildSubwordVocab]]) and rides the
    * serialized expression to every task, exactly like a k-means
    * codebook or broadcast dim. Unit length is unbounded (sorted-string
    * probe, no long-key encoding cap). */
  def subwordStatsVocab(text: Column, vocab: Seq[String]): Column = {
    val sorted = graft.text.TextAnalysis.buildSubwordVocab(vocab)
    toColumn(SubwordStatsVocabExpr(toExpr(text),
      scala.collection.immutable.ArraySeq.unsafeWrapArray(sorted)))
  }

  /** Vocab from a DataFrame's single string column: the load-a-trained-
    * vocab-table entry point (q184 trains one from the corpus in-query). */
  def subwordStatsVocab(
      text: Column, vocabDf: org.apache.spark.sql.DataFrame): Column = {
    val cols = vocabDf.columns
    require(cols.length == 1,
      s"vocab DataFrame must have exactly one string column, got ${cols.mkString(",")}")
    subwordStatsVocab(text,
      vocabDf.collect().toSeq.map(_.getString(0)).filter(_ != null))
  }

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

/** [[SubwordStatsExpr]] with the vocab as DATA: `vocab` is a
  * [[graft.text.TextAnalysis.buildSubwordVocab]] result serialized with the
  * expression (task-binary broadcast — sent once per stage, not per row).
  * Same greedy longest-prefix walk; unbounded unit length. The field is an
  * IndexedSeq, NOT Array (advisor r11 #3): case-class equality over an
  * Array is reference-based, so two semantically identical vocab
  * expressions would never canonicalize equal, defeating subexpression
  * elimination; Seq equality is structural. The hot loop probes the
  * unwrapped array. */
case class SubwordStatsVocabExpr(child: Expression, vocab: IndexedSeq[String])
    extends UnaryExpression with CodegenFallback {
  @transient private lazy val sorted: Array[String] = vocab.toArray
  @transient private lazy val maxLen: Int = sorted.map(_.length).max
  override def dataType: DataType = StructType(
    StructField("n_words", LongType, nullable = false) ::
    StructField("n_subwords", LongType, nullable = false) :: Nil)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"subword_stats_vocab requires STRING, got ${other.catalogString}")
  }
  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    var nWords = 0L
    var nSub = 0L
    var i = 0
    while (i < s.length) {
      while (i < s.length && s.charAt(i) == ' ') i += 1
      if (i < s.length) {
        val start = i
        while (i < s.length && s.charAt(i) != ' ') i += 1
        nWords += 1
        nSub += graft.text.TextAnalysis.subwordCountVocab(
          s.substring(start, i), sorted, maxLen)
      }
    }
    org.apache.spark.sql.catalyst.InternalRow(nWords, nSub)
  }
  override protected def withNewChildInternal(c: Expression): SubwordStatsVocabExpr =
    copy(child = c)
  override def prettyName: String = "subword_stats_vocab"
}
