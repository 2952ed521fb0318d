package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Deterministic sampling coordinate of an integer key: the top 32 bits of
  * the multiply-add mix (key·A + B) mod 2^64 — a value in [0, 2^32) that a
  * DuckDB oracle reproduces with plain HUGEINT arithmetic
  * (((A·key + B) mod 2^64) // 2^32 — with the mod normalized to a
  * non-negative residue, (((x % M) + M) % M), because DuckDB's % and //
  * follow the dividend's sign while the JVM side is unsigned; see the
  * q49 oracle). Used for hash-threshold sampling:
  * keep a row iff coord < floor(rate · 2^32); the decision is a pure
  * function of the key, so samples are reproducible across runs, engines
  * and cluster sizes, and nested rates compose (a 10% sample is a subset
  * of the 20% sample of the same keys).
  *
  * A native expression because the JVM's wrapping multiply is exactly the
  * mod-2^64 semantics — Column arithmetic would throw on overflow under
  * ANSI mode (Spark 4 default).
  */
object Mix64 {
  /** Odd multiplier (golden-ratio constant): a bijection of Z_2^64, so
    * distinct keys get distinct mixes. */
  val MulA = 0x9E3779B97F4A7C15L
  val AddB = 0x2545F4914F6CDD1DL

  def hash(x: Long): Long = (x * MulA + AddB) >>> 32

  def sampleCoord(key: Column): Column = toColumn(SampleCoord(toExpr(key)))
}

case class SampleCoord(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sample_coord requires BIGINT, got ${child.dataType.catalogString}")
  override def nullSafeEval(v: Any): Any = Mix64.hash(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Mix64.hash($c)")
  override protected def withNewChildInternal(newChild: Expression): SampleCoord =
    copy(child = newChild)
  override def prettyName: String = "sample_coord"
}
