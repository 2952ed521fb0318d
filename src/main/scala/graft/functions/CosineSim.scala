package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native cosine similarity of two float/double array columns, accumulated
  * in double left-to-right (bit-identical to the zip_with/aggregate HOF
  * formulation in Dedup.cosine, which Spark interprets per element — this
  * expression is one JVM call per row). NULL on length mismatch or zero
  * norm.
  */
object CosineSim {
  def cosineSim(a: Column, b: Column): Column =
    toColumn(CosineSimExpr(toExpr(a), toExpr(b)))

  def compute(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Any = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val denom = math.sqrt(na * nb)
    if (denom == 0.0) null else java.lang.Double.valueOf(dot / denom)
  }
}

case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  private def elemOk(dt: DataType): Option[Boolean] = dt match {
    case ArrayType(FloatType, _) => Some(true)
    case ArrayType(DoubleType, _) => Some(false)
    case _ => None
  }
  override def checkInputDataTypes(): TypeCheckResult =
    (elemOk(left.dataType), elemOk(right.dataType)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"cosine_sim requires ARRAY<FLOAT|DOUBLE> inputs, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }
  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      elemOk(left.dataType).get, elemOk(right.dataType).get)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimExpr =
    copy(left = l, right = r)
  override def prettyName: String = "cosine_sim"
}
