package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Integer-lattice vector kernels: dot product and squared norm of
  * floor(x·scale)-quantized float/double arrays, folded in ONE JVM call per
  * row instead of Spark's per-element interpreted zip_with/aggregate HOFs
  * (~100× on pair-join hot paths — the q147 semantic-dedup inner loop).
  * Bit-identical to `aggregate(zip_with(transform(a, floor(x·s)), ...))`:
  * quantization is Math.floor on the double-widened element; products and
  * sums use multiplyExact/addExact, so an over-range input (user-supplied
  * scale × extreme element) throws ArithmeticException LOUDLY — the same
  * failure mode the HOF/Column formulation has under ANSI mode, instead of
  * a silent 64-bit wrap (round-10 advice). Within the registry's
  * documented |x|·scale bounds the two agree bit-for-bit.
  * NULL on length mismatch AND on any NULL element — exactly
  * the HOF formulation's propagation (a null element nulls the fold) and
  * the DuckDB list twins'; parquet float arrays default to
  * containsNull=true, so the guard is load-bearing, not defensive.
  */
object IntQuant {
  def quantDot(a: Column, b: Column, scale: Long): Column =
    toColumn(QuantDotExpr(toExpr(a), toExpr(b), scale))
  def quantNorm2(a: Column, scale: Long): Column =
    toColumn(QuantNorm2Expr(toExpr(a), scale))

  private[functions] def elemFloat(dt: DataType): Option[Boolean] = dt match {
    case ArrayType(FloatType, _) => Some(true)
    case ArrayType(DoubleType, _) => Some(false)
    case _ => None
  }

  /** floor(x·scale) with a loud range check: .toLong would SATURATE a
    * beyond-Long double (and NaN → 0) — both silent corruption. */
  private def quantExact(x: Double, scale: Long): Long = {
    val f = Math.floor(x * scale)
    // f must lie in [-2^63, 2^63); the first test also rejects NaN
    if (!(f >= -9.223372036854776E18) || f >= 9.223372036854776E18)
      throw new ArithmeticException(
        s"quant overflow: floor($x * $scale) not representable as BIGINT")
    f.toLong
  }

  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean,
          scale: Long): Any = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc = Math.addExact(acc,
        Math.multiplyExact(quantExact(x, scale), quantExact(y, scale)))
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  def norm2(a: ArrayData, aFloat: Boolean, scale: Long): Any = {
    val n = a.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val q = quantExact(x, scale)
      acc = Math.addExact(acc, Math.multiplyExact(q, q))
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }
}

case class QuantDotExpr(left: Expression, right: Expression, scale: Long)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    (IntQuant.elemFloat(left.dataType), IntQuant.elemFloat(right.dataType)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"quant_dot requires ARRAY<FLOAT|DOUBLE> inputs, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }
  override def nullSafeEval(a: Any, b: Any): Any =
    IntQuant.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      IntQuant.elemFloat(left.dataType).get, IntQuant.elemFloat(right.dataType).get,
      scale)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): QuantDotExpr =
    copy(left = l, right = r)
  override def prettyName: String = "quant_dot"
}

case class QuantNorm2Expr(child: Expression, scale: Long)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true // null elements propagate
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    IntQuant.elemFloat(child.dataType) match {
      case Some(_) => TypeCheckResult.TypeCheckSuccess
      case None => TypeCheckResult.TypeCheckFailure(
        s"quant_norm2 requires ARRAY<FLOAT|DOUBLE> input, got " +
          s"${child.dataType.catalogString}")
    }
  override def nullSafeEval(a: Any): Any =
    IntQuant.norm2(a.asInstanceOf[ArrayData],
      IntQuant.elemFloat(child.dataType).get, scale)
  override protected def withNewChildInternal(newChild: Expression): QuantNorm2Expr =
    copy(child = newChild)
  override def prettyName: String = "quant_norm2"
}
