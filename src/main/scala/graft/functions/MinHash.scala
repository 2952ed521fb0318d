package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native MinHash signature over word n-grams of a token array.
  *
  * Per token: two xxhash64 passes (seeds A/B); per n-gram window: polynomial
  * combine of the token hashes; per signature slot j: the Kirsch-
  * Mitzenmacher double hash g1 + j·g2. One JVM call per row, no per-element
  * lambda interpretation — the higher-order-function formulation of the same
  * signature (Dedup.minhashSignature) is interpreted by Spark and measured
  * ~100× slower at sf0.1 (97 s → <1 s for 5000 docs).
  */
object MinHash {
  val SeedA = 42L
  val SeedB = 0x9E3779B97F4A7C15L

  def minhashNgrams(tokens: Column, n: Int, m: Int): Column =
    toColumn(MinHashNgrams(toExpr(tokens), n, m))

  def signature(arr: ArrayData, n: Int, m: Int): ArrayData = {
    val t = arr.numElements()
    val mins = Array.fill(m)(Long.MaxValue)
    if (t >= n) {
      val h1 = new Array[Long](t)
      val h2 = new Array[Long](t)
      var i = 0
      while (i < t) {
        val s = arr.getUTF8String(i)
        h1(i) = XxHash64Function.hash(s, StringType, SeedA)
        h2(i) = XxHash64Function.hash(s, StringType, SeedB)
        i += 1
      }
      i = 0
      while (i <= t - n) {
        var g1 = 0L; var g2 = 0L
        var k = 0
        while (k < n) {
          g1 = g1 * 31L + h1(i + k)
          g2 = g2 * 131L + h2(i + k)
          k += 1
        }
        var j = 0
        while (j < m) {
          val v = g1 + j * g2
          if (v < mins(j)) mins(j) = v
          j += 1
        }
        i += 1
      }
    }
    new GenericArrayData(mins)
  }
}

case class MinHashNgrams(child: Expression, n: Int, m: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1 && m >= 1, "n-gram width and signature size must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_ngrams requires ARRAY<STRING>, got ${other.catalogString}")
  }
  override def nullSafeEval(v: Any): Any =
    MinHash.signature(v.asInstanceOf[ArrayData], n, m)
  override protected def withNewChildInternal(newChild: Expression): MinHashNgrams =
    copy(child = newChild)
  override def prettyName: String = "minhash_ngrams"
}

/** PORTABLE MinHash twin: same shape as [[MinHash]] but every component is
  * plain wrapping integer arithmetic a DuckDB oracle can reproduce —
  *
  *   x  = rolling31 over the n-gram's bytes (tokens joined by one space,
  *        bytes folded unsigned — the q33/q35 hash family),
  *   x32 = x mod 2^32   (so a_j · x32 never overflows 128-bit HUGEINT),
  *   component j = min over grams of (a_j · x32 + b_j) mod 2^64,
  *        compared SIGNED (Spark Long order — the oracle converts before
  *        its min for the same reason as the q33 winnow twin).
  *
  * The multiply-add family (a_j odd → a bijection of Z_2^64) is the classic
  * universal-hashing approximation of minwise-independent permutations
  * (Broder et al.). The xxhash64 variant stays the production default
  * (stronger mixing, cheaper 8-byte band buckets); this twin exists so the
  * FULL MinHash-LSH candidate semantics — signature, banding, est_sim,
  * threshold — ride a green DuckDB row instead of rows-only.
  */
object PortableMinHash {
  val Seed = 1125899906842597L

  /** Odd 32-bit multiplier for signature slot j (Knuth multiplicative
    * constant striding). */
  def a(j: Int): Long = ((0x9E3779B9L * (j + 1)) & 0xFFFFFFFFL) | 1L

  /** 64-bit additive offset for slot j (splitmix64 multiplier striding). */
  def b(j: Int): Long = 0xBF58476D1CE4E5B9L * (j + 1)

  def minhashNgramsPortable(tokens: Column, n: Int, m: Int): Column =
    toColumn(MinHashNgramsPortable(toExpr(tokens), n, m))

  def signature(arr: ArrayData, n: Int, m: Int,
                as: Array[Long], bs: Array[Long]): ArrayData = {
    val t = arr.numElements()
    val mins = Array.fill(m)(Long.MaxValue)
    if (t >= n) {
      // Null elements fold as empty byte runs (only the joining space
      // contributes) — mirrors SimHash64Portable's isNullAt skip; the
      // xxhash64 MinHashNgrams hashes null to its seed for the same reason.
      val toks = Array.tabulate(t) { i =>
        if (arr.isNullAt(i)) Array.emptyByteArray else arr.getUTF8String(i).getBytes
      }
      var i = 0
      while (i <= t - n) {
        var h = Seed
        var k = 0
        while (k < n) {
          if (k > 0) h = h * 31L + 0x20L // the joining space
          val bts = toks(i + k)
          var p = 0
          while (p < bts.length) { h = h * 31L + (bts(p) & 0xFF); p += 1 }
          k += 1
        }
        val x = h & 0xFFFFFFFFL
        var j = 0
        while (j < m) {
          val v = as(j) * x + bs(j)
          if (v < mins(j)) mins(j) = v
          j += 1
        }
        i += 1
      }
    }
    new GenericArrayData(mins)
  }
}

case class MinHashNgramsPortable(child: Expression, n: Int, m: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1 && m >= 1, "n-gram width and signature size must be >= 1")
  private lazy val as = Array.tabulate(m)(PortableMinHash.a)
  private lazy val bs = Array.tabulate(m)(PortableMinHash.b)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_ngrams_portable requires ARRAY<STRING>, got ${other.catalogString}")
  }
  override def nullSafeEval(v: Any): Any =
    PortableMinHash.signature(v.asInstanceOf[ArrayData], n, m, as, bs)
  override protected def withNewChildInternal(newChild: Expression): MinHashNgramsPortable =
    copy(child = newChild)
  override def prettyName: String = "minhash_ngrams_portable"
}
