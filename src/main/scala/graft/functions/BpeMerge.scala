package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Apply ONE BPE merge to a symbol sequence: every adjacent (left, right)
  * pair becomes the single symbol left+right, scanning LEFT-TO-RIGHT
  * non-overlapping — [a,a,a] under (a,a) → [aa,a], the standard BPE rule
  * ([[graft.text.Bpe]]; the q185 oracle reproduces exactly this via
  * non-overlapping string replace over delimited symbols). The pair is
  * model state fixed at plan time, so it rides the serialized expression
  * like a codebook, not a second column. NULL array → NULL. */
object BpeMerge {
  def bpeMerge(syms: Column, left: String, right: String): Column =
    toColumn(BpeMergeExpr(toExpr(syms), left, right))
}

case class BpeMergeExpr(child: Expression, left: String, right: String)
    extends UnaryExpression with CodegenFallback {
  @transient private lazy val lU = UTF8String.fromString(left)
  @transient private lazy val rU = UTF8String.fromString(right)
  @transient private lazy val lrU = UTF8String.fromString(left + right)
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_merge requires ARRAY<STRING>, got ${other.catalogString}")
  }
  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      val cur = arr.getUTF8String(i)
      if (i + 1 < n && cur != null && lU == cur) {
        val nxt = arr.getUTF8String(i + 1)
        if (nxt != null && rU == nxt) { out.add(lrU); i += 2 }
        else { out.add(cur); i += 1 }
      } else { out.add(cur); i += 1 }
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }
  override protected def withNewChildInternal(c: Expression): BpeMergeExpr =
    copy(child = c)
  override def prettyName: String = "bpe_merge"
}
