package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Random-hyperplane LSH signature for cosine similarity: bit j is the sign
  * of ⟨v, r_j⟩ where r_j's components are pseudorandom ±-symmetric values
  * derived by hashing (seed, j, dim) — the planes never materialize or ship,
  * any executor regenerates them from the constants. Close vectors agree on
  * most bits (P[bit differs] = angle/π).
  */
object Hyperplane {
  def signature(vec: Column, nBits: Int, seed: Long): Column =
    toColumn(HyperplaneSig(toExpr(vec), nBits, seed))

  /** splitmix64 constants — public so [[HyperplanePortable]]'s DuckDB
    * oracle SQL is generated from the SAME values the JVM mixes with. */
  val MixC1 = 0x9E3779B97F4A7C15L
  val MixC2 = 0xBF58476D1CE4E5B9L
  val MixC3 = 0x94D049BB133111EBL

  /** splitmix64 — deterministic component generator (shared with
    * [[HyperplanePortable]]). */
  private[functions] def mix(z0: Long): Long = {
    var z = z0 + MixC1
    z = (z ^ (z >>> 30)) * MixC2
    z = (z ^ (z >>> 27)) * MixC3
    z ^ (z >>> 31)
  }

  /** Plane component in [-1, 1). */
  def component(seed: Long, bit: Int, dim: Int): Double =
    mix(seed ^ (bit.toLong << 32) ^ dim.toLong).toDouble / Long.MaxValue.toDouble

  def compute(arr: ArrayData, isFloat: Boolean, nBits: Int, seed: Long): Long = {
    val d = arr.numElements()
    var sig = 0L
    var j = 0
    while (j < nBits) {
      var dot = 0.0
      var i = 0
      while (i < d) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        dot += x * component(seed, j, i)
        i += 1
      }
      if (dot >= 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}

case class HyperplaneSig(child: Expression, nBits: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {
  require(nBits >= 1 && nBits <= 64, "nBits must be in [1, 64]")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_sig requires ARRAY<FLOAT|DOUBLE>, got ${other.catalogString}")
  }
  override def nullSafeEval(v: Any): Any =
    Hyperplane.compute(v.asInstanceOf[ArrayData], isFloat, nBits, seed)
  override protected def withNewChildInternal(c: Expression): HyperplaneSig = copy(child = c)
  override def prettyName: String = "hyperplane_sig"
}
