package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit polynomial rolling hash over a string's UTF-8 bytes:
  * h ← h·31 + byte, wrapping — a whole-content fingerprint (cheap,
  * order-sensitive, collision-adequate for dedup sweeps). Native Catalyst
  * expression with full codegen.
  */
object RollingHash {
  def hash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 1125899906842597L // large odd seed
    var i = 0
    while (i < bytes.length) {
      h = h * 31L + bytes(i)
      i += 1
    }
    h
  }

  def rollingHash64(c: Column): Column = toColumn(RollingHash64(toExpr(c)))
}

case class RollingHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hash64 requires STRING, got ${child.dataType.catalogString}")
  override def nullSafeEval(v: Any): Any =
    RollingHash.hash(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash.hash($c)")
  override protected def withNewChildInternal(newChild: Expression): RollingHash64 =
    copy(child = newChild)
  override def prettyName: String = "rolling_hash64"
}
