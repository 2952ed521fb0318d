package graft.functions

import java.util.Arrays

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}

/** Sorted distinct xxhash64 fingerprints of a token array's word n-grams —
  * the set representation for fast exact Jaccard (see [[SortedJaccard]]):
  * one native pass instead of building n-gram strings and hash-intersecting
  * them per comparison. Hash collisions merging two distinct n-grams are
  * possible in principle (~|shingles|²/2⁶⁴) — verified absent against the
  * DuckDB string-set oracle on the fixed test corpus.
  */
object NgramHashes {
  def ngramHashes(tokens: Column, n: Int): Column =
    toColumn(NgramHashesExpr(toExpr(tokens), n))

  def compute(arr: ArrayData, n: Int): ArrayData = {
    val t = arr.numElements()
    if (t < n) return new GenericArrayData(Array.emptyLongArray)
    val th = new Array[Long](t)
    var i = 0
    while (i < t) {
      th(i) = XxHash64Function.hash(arr.getUTF8String(i), StringType, MinHash.SeedA)
      i += 1
    }
    val out = new Array[Long](t - n + 1)
    i = 0
    while (i <= t - n) {
      var g = 0L
      var k = 0
      while (k < n) { g = g * 31L + th(i + k); k += 1 }
      out(i) = g
      i += 1
    }
    Arrays.sort(out)
    // distinct in place
    var w = 0
    i = 0
    while (i < out.length) {
      if (w == 0 || out(i) != out(w - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    new GenericArrayData(Arrays.copyOf(out, w))
  }
}

case class NgramHashesExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngram_hashes requires ARRAY<STRING>, got ${other.catalogString}")
  }
  override def nullSafeEval(v: Any): Any =
    NgramHashes.compute(v.asInstanceOf[ArrayData], n)
  override protected def withNewChildInternal(c: Expression): NgramHashesExpr = copy(child = c)
  override def prettyName: String = "ngram_hashes"
}

/** Exact Jaccard of two SORTED distinct long arrays via linear merge:
  * |∩| / (|A| + |B| − |∩|). NULL when both are empty. */
object SortedJaccard {
  def sortedJaccard(a: Column, b: Column): Column =
    toColumn(SortedJaccardExpr(toExpr(a), toExpr(b)))

  def compute(a: ArrayData, b: ArrayData): Any = {
    val la = a.numElements(); val lb = b.numElements()
    if (la == 0 && lb == 0) return null
    var i = 0; var j = 0; var inter = 0
    while (i < la && j < lb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    java.lang.Double.valueOf(inter.toDouble / (la + lb - inter))
  }
}

case class SortedJaccardExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"sorted_jaccard requires ARRAY<BIGINT> inputs, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }
  override def nullSafeEval(a: Any, b: Any): Any =
    SortedJaccard.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedJaccardExpr =
    copy(left = l, right = r)
  override def prettyName: String = "sorted_jaccard"
}
