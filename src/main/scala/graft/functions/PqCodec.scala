package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Product-quantization codec: [[PqEncodeExpr]] maps a D-dim float vector to
  * M sub-codebook indices (argmin L2 per subspace, ties to the lowest index)
  * and [[PqAdcExpr]] scores a full query vector against a coded corpus row —
  * asymmetric distance computation (ADC), Jégou et al., TPAMI 2011 — as an
  * approximate COSINE: Σ_m dot(q_m, c_m[code_m]) over ‖q‖·‖x̂‖ with
  * ‖x̂‖² = Σ_m ‖c_m[code_m]‖². Both are single-pass evals over a codebook
  * held as an expression constant (M·K·(D/M) floats — the per-refresh model
  * artifact, same deployment shape as the Bloom bitset literal in q69).
  *
  * All arithmetic is double-precision in a fixed loop order, so codes and
  * scores are deterministic across runs and layouts (pinned in PqSpec).
  */
object PqCodec {

  /** codebook(m)(j) = the j-th centroid of subspace m, each D/M floats. */
  type Codebook = Array[Array[Array[Float]]]

  /** Integer-quantized codebook (floor(c·2^20) per component) for the
    * portable encode twin. */
  type QCodebook = Array[Array[Array[Long]]]

  def subDim(cb: Codebook): Int = cb(0)(0).length

  /** Quantize a float codebook to the portable integer form. */
  def quantize(cb: Codebook): QCodebook =
    cb.map(_.map(_.map(c => math.floor(c.toDouble * 1048576.0).toLong)))

  private[functions] def l2sq(v: ArrayData, off: Int, c: Array[Float]): Double = {
    var d = 0.0
    var i = 0
    while (i < c.length) {
      val diff = v.getFloat(off + i).toDouble - c(i).toDouble
      d += diff * diff
      i += 1
    }
    d
  }

  private[functions] def dot(v: ArrayData, off: Int, c: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < c.length) {
      s += v.getFloat(off + i).toDouble * c(i).toDouble
      i += 1
    }
    s
  }
}

/** PORTABLE twin of [[PqEncodeExpr]]: both the vector components and the
  * codebook are quantized to integers (floor(x·2^20) — exact in double:
  * float→double is exact and ·2^20 is a power-of-two scale), and the
  * per-subspace argmin minimizes the EXACT integer squared distance
  * (Σ(qv−qc)² < 2^45 for unit-scale inputs — no overflow, no rounding).
  * Every step replays in DuckDB SQL, giving the PQ quantizer itself a
  * cross-engine oracle (the q64 quantized-dot trick applied to PQ). */
case class PqEncodePortableExpr(child: Expression,
    codebook: PqCodec.QCodebook)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode_portable"

  private val m = codebook.length
  private val sub = codebook(0)(0).length
  private val Q = 1048576.0 // 2^20

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    require(v.numElements() == m * sub,
      s"pq_encode_portable expects ${m * sub} dims, got ${v.numElements()}")
    val qv = new Array[Long](m * sub)
    var i = 0
    while (i < qv.length) {
      qv(i) = math.floor(v.getFloat(i).toDouble * Q).toLong
      i += 1
    }
    val codes = new Array[Any](m)
    var mi = 0
    while (mi < m) {
      val cands = codebook(mi)
      var best = 0
      var bestD = Long.MaxValue
      var j = 0
      while (j < cands.length) {
        val c = cands(j)
        var d2 = 0L
        var di = 0
        while (di < sub) {
          val diff = qv(mi * sub + di) - c(di)
          d2 += diff * diff
          di += 1
        }
        if (d2 < bestD) { bestD = d2; best = j } // strict < : ties keep lowest j
        j += 1
      }
      codes(mi) = best
      mi += 1
    }
    new GenericArrayData(codes)
  }

  override protected def withNewChildInternal(c: Expression): PqEncodePortableExpr =
    copy(child = c)
}

/** vec (array<float>, length M·subDim) → array<int> of M codebook indices. */
case class PqEncodeExpr(child: Expression, codebook: PqCodec.Codebook)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  private val m = codebook.length
  private val sub = PqCodec.subDim(codebook)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    require(v.numElements() == m * sub,
      s"pq_encode expects ${m * sub} dims, got ${v.numElements()}")
    val codes = new Array[Any](m)
    var mi = 0
    while (mi < m) {
      val cands = codebook(mi)
      var best = 0
      var bestD = PqCodec.l2sq(v, mi * sub, cands(0))
      var j = 1
      while (j < cands.length) {
        val d = PqCodec.l2sq(v, mi * sub, cands(j))
        if (d < bestD) { bestD = d; best = j } // strict < : ties keep lowest j
        j += 1
      }
      codes(mi) = best
      mi += 1
    }
    new GenericArrayData(codes)
  }

  override protected def withNewChildInternal(c: Expression): PqEncodeExpr =
    copy(child = c)
}

/** (query array<float>, codes array<int>) → approximate cosine via ADC. */
case class PqAdcExpr(left: Expression, right: Expression,
    codebook: PqCodec.Codebook)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_cosine"

  private val m = codebook.length
  private val sub = PqCodec.subDim(codebook)
  // ‖c‖² per codeword, precomputed once per expression instance
  private lazy val cNorm2: Array[Array[Double]] = codebook.map(_.map { c =>
    var s = 0.0; var i = 0
    while (i < c.length) { s += c(i).toDouble * c(i).toDouble; i += 1 }
    s
  })

  override def nullSafeEval(q: Any, codes: Any): Any = {
    val qv = q.asInstanceOf[ArrayData]
    val cd = codes.asInstanceOf[ArrayData]
    require(qv.numElements() == m * sub && cd.numElements() == m,
      s"pq_adc_cosine expects ${m * sub}-dim query and $m codes")
    var dotSum = 0.0
    var xNorm2 = 0.0
    var qNorm2 = 0.0
    var mi = 0
    while (mi < m) {
      val j = cd.getInt(mi)
      require(j >= 0 && j < codebook(mi).length,
        s"pq_adc_cosine: code $j at subspace $mi out of range " +
          s"[0, ${codebook(mi).length}) — codes trained under a different codebook?")
      dotSum += PqCodec.dot(qv, mi * sub, codebook(mi)(j))
      xNorm2 += cNorm2(mi)(j)
      mi += 1
    }
    var i = 0
    val n = m * sub
    while (i < n) {
      val x = qv.getFloat(i).toDouble
      qNorm2 += x * x
      i += 1
    }
    val denom = math.sqrt(qNorm2) * math.sqrt(xNorm2)
    if (denom == 0.0) 0.0 else dotSum / denom
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): PqAdcExpr = copy(left = l, right = r)
}

/** PORTABLE twin of [[PqAdcExpr]]: (query array<float>, codes array<int>)
  * → the EXACT integer ADC squared L2 distance Σ_mi Σ_d (qv−qc)² between
  * the quantized query (floor(x·2^20) per component — exact in double)
  * and the integer codebook entries the codes select. Every arithmetic
  * step is integer, so candidate generation ranked by this distance
  * (ties → id) is a total order DuckDB replays bit-for-bit — the
  * candidate stage of the re-rank retrieval shape (q112) carries a full
  * oracle, unlike the float-cosine [[PqAdcExpr]] scan. Bound: per-sub
  * d2 < sub·(2·2^20)² ≈ 2^45 for unit-scale inputs; the sum over m
  * subspaces stays far below 2^63. */
case class PqAdcPortableExpr(left: Expression, right: Expression,
    codebook: PqCodec.QCodebook)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "pq_adc_portable_d2"

  private val m = codebook.length
  private val sub = codebook(0)(0).length
  private val Q = 1048576.0 // 2^20

  override def nullSafeEval(q: Any, codes: Any): Any = {
    val qv = q.asInstanceOf[ArrayData]
    val cd = codes.asInstanceOf[ArrayData]
    require(qv.numElements() == m * sub && cd.numElements() == m,
      s"pq_adc_portable_d2 expects ${m * sub}-dim query and $m codes")
    var total = 0L
    var mi = 0
    while (mi < m) {
      val j = cd.getInt(mi)
      require(j >= 0 && j < codebook(mi).length,
        s"pq_adc_portable_d2: code $j at subspace $mi out of range " +
          s"[0, ${codebook(mi).length}) — codes trained under a different codebook?")
      val c = codebook(mi)(j)
      var di = 0
      while (di < sub) {
        val diff = math.floor(qv.getFloat(mi * sub + di).toDouble * Q).toLong - c(di)
        total += diff * diff
        di += 1
      }
      mi += 1
    }
    total
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): PqAdcPortableExpr = copy(left = l, right = r)
}
