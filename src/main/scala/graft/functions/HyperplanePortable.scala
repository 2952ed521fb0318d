package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** PORTABLE random-hyperplane LSH signature: same construction as
  * [[Hyperplane]] (bit j = sign of ⟨v, r_j⟩, planes regenerated from
  * (seed, j, dim) — nothing materializes or ships), but every dot product
  * is EXACT INTEGER arithmetic, so a DuckDB oracle reproduces the bits:
  *
  *   component c(j,i) = top-32 signed bits of splitmix64(seed ^ j<<32 ^ i)
  *   quantized  q(x)  = floor(x · 2^20)         (scaling by 2^20 is exact
  *                                               in double — no rounding)
  *   bit j            = [ Σ_i q(v_i)·c(j,i) ≥ 0 ]
  *
  * The float variant's double-accumulation order would have to match the
  * oracle's summation order bit-for-bit — integer sums are order-free, so
  * the plan (and DuckDB) may reassociate freely. Quantization only moves
  * bits for vectors nearly orthogonal to a plane (|cos| ≲ 2^-20), far below
  * any LSH-relevant angle.
  *
  * Overflow budget: |q| ≤ 2^20·max|v_i|, |c| < 2^31, so dims·2^51·max|v_i|
  * must stay under 2^63 — safe through dim 2048 for |v_i| ≤ 1 (embeddings
  * are unit-scale; require ‖v‖_∞ < 256 documented).
  */
object HyperplanePortable {
  val QuantScale: Double = 1048576.0 // 2^20

  def signature(vec: Column, nBits: Int, seed: Long): Column =
    toColumn(HyperplanePortableSig(toExpr(vec), nBits, seed))

  /** The RAW integer projections ⟨q(v), r_j⟩ for j < nDims — the
    * Johnson–Lindenstrauss dimensionality reduction this signature is the
    * sign of. Same component/quantization chain, so the same DuckDB twin
    * replays the projected vectors exactly. */
  def projection(vec: Column, nDims: Int, seed: Long): Column =
    toColumn(HyperplanePortableProj(toExpr(vec), nDims, seed))

  /** Signed top-32 bits of the mixed (seed, bit, dim) word. */
  def component(seed: Long, bit: Int, dim: Int): Long =
    Hyperplane.mix(seed ^ (bit.toLong << 32) ^ dim.toLong) >> 32

  def quant(x: Double): Long = math.floor(x * QuantScale).toLong

  /** All nDims integer dots of the quantized vector with the regenerated
    * planes — shared inner loop of [[compute]] and the projection expr.
    * Returns null on a NULL array ELEMENT (parquet arrays default
    * containsNull=true): the quant_dot/quant_norm2 kernels call the same
    * guard load-bearing — a silent treat-null-as-zero would hash a
    * corrupt vector into a legitimate-looking bucket. Callers propagate
    * the null (both expressions are nullable). */
  def dots(arr: ArrayData, isFloat: Boolean, nDims: Int, seed: Long): Array[Long] = {
    val d = arr.numElements()
    val q = new Array[Long](d)
    var i = 0
    while (i < d) {
      if (arr.isNullAt(i)) return null
      val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      q(i) = quant(x)
      i += 1
    }
    val out = new Array[Long](nDims)
    var j = 0
    while (j < nDims) {
      var dot = 0L
      i = 0
      while (i < d) {
        dot += q(i) * component(seed, j, i)
        i += 1
      }
      out(j) = dot
      j += 1
    }
    out
  }

  /** null (not a signature) when the vector has a NULL element. */
  def compute(arr: ArrayData, isFloat: Boolean, nBits: Int, seed: Long): java.lang.Long = {
    val ds = dots(arr, isFloat, nBits, seed)
    if (ds == null) return null
    var sig = 0L
    var j = 0
    while (j < nBits) {
      if (ds(j) >= 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}

case class HyperplanePortableSig(child: Expression, nBits: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {
  require(nBits >= 1 && nBits <= 64, "nBits must be in [1, 64]")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  // nullable even over a non-null child: a NULL array ELEMENT propagates
  override def nullable: Boolean = true
  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_sig_portable requires ARRAY<FLOAT|DOUBLE>, got ${other.catalogString}")
  }
  override def nullSafeEval(v: Any): Any =
    HyperplanePortable.compute(v.asInstanceOf[ArrayData], isFloat, nBits, seed)
  override protected def withNewChildInternal(c: Expression): HyperplanePortableSig =
    copy(child = c)
  override def prettyName: String = "hyperplane_sig_portable"
}

case class HyperplanePortableProj(child: Expression, nDims: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {
  require(nDims >= 1, "nDims must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  // nullable even over a non-null child: a NULL array ELEMENT propagates
  override def nullable: Boolean = true
  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_proj_portable requires ARRAY<FLOAT|DOUBLE>, got ${other.catalogString}")
  }
  override def nullSafeEval(v: Any): Any = {
    val ds = HyperplanePortable.dots(v.asInstanceOf[ArrayData], isFloat, nDims, seed)
    if (ds == null) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(ds)
  }
  override protected def withNewChildInternal(c: Expression): HyperplanePortableProj =
    copy(child = c)
  override def prettyName: String = "hyperplane_proj_portable"
}
