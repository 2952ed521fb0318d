package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton/Z-order value of two BIGINT layout keys: the low 16 bits of each
  * input interleaved (x on even bit positions, y on odd) into one 32-bit
  * curve coordinate. Sorting or range-partitioning a table by z(x, y)
  * clusters BOTH dimensions at once, so per-file parquet min/max stats stay
  * tight on x AND y and a scan filtered on either dimension skips most
  * files — the multi-column data-skipping layout (Delta/Iceberg `OPTIMIZE
  * ZORDER BY`) that single-column sorting can't give. Inputs are masked to
  * 16 bits (layout keys are coarse by design — bucket/quantize first; the
  * mask, not a throw, keeps the expression total and oracle-portable).
  * Codegen'd — stays inside whole-stage pipelines on the write path.
  */
object ZOrder {
  def zval(x: Column, y: Column): Column =
    toColumn(ZValue(toExpr(x), toExpr(y)))

  val Bits = 16

  /** Bit-interleave the low 16 bits: x→even positions, y→odd. */
  def interleave(x: Long, y: Long): Long = {
    var z = 0L
    var b = 0
    while (b < Bits) {
      z |= ((x >> b) & 1L) << (2 * b)
      z |= ((y >> b) & 1L) << (2 * b + 1)
      b += 1
    }
    z
  }
}

case class ZValue(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zval requires (BIGINT, BIGINT), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  override def nullSafeEval(x: Any, y: Any): Any =
    ZOrder.interleave(x.asInstanceOf[Long], y.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.functions.ZOrder.interleave($x, $y)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ZValue =
    copy(left = l, right = r)
  override def prettyName: String = "zval"
}
