package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03) as
  * ONE native pass: xxhash64 (seed 42 — the SQL `xxhash64` default) over
  * every character k-gram, then the minimum of each sliding window of w
  * hashes via a monotonic deque (O(n) total), distinct preserving first
  * occurrence. Bit-identical to the composed higher-order-function form
  *
  * {{{
  *   transform(sequence(1, n), i -> xxhash64(substr(text, i, k)))   // k-grams
  *   transform(sequence(1, m), j -> array_min(slice(kgrams, j, w))) // windows
  *   array_distinct(...)
  * }}}
  *
  * which Spark interprets per element (each window re-scans w hashes —
  * O(n·w) with per-element interpretation overhead; the same anti-pattern
  * measured at ~100× on the MinHash path, BASELINE.md). Fewer k-grams than
  * one window (m ≤ 0) degrades to distinct k-gram hashes, exactly like the
  * HOF form. Null text → null (standard expression semantics).
  */
object Winnow {
  def winnowingFingerprints(text: Column, k: Int, w: Int): Column =
    toColumn(WinnowFingerprints(toExpr(text), k, w))

  /** Same winnow (window-min + first-occurrence distinct) with the k-gram
    * hash swapped for the rolling 31-hash family ([[RollingHash]]) — plain
    * wrapping integer arithmetic, so a DuckDB oracle can reproduce the
    * FULL semantics (xxhash64 has no DuckDB twin). UTF-8 bytes are folded
    * UNSIGNED (& 0xFF), so the hash is well-defined for any input; the
    * DuckDB twin walks per-character code points, so oracle portability
    * holds exactly for single-byte (ASCII) text — same assumption the q35
    * content-fingerprint oracle documents. On ASCII grams this equals
    * [[RollingHash.hash]]. The xxhash64 variant stays the production
    * default (stronger mixing). */
  def winnowingFingerprintsPortable(text: Column, k: Int, w: Int): Column =
    toColumn(WinnowFingerprints(toExpr(text), k, w, portable = true))

  def compute(s: UTF8String, k: Int, w: Int): ArrayData =
    compute(s, k, w, portable = false)

  def compute(s: UTF8String, k: Int, w: Int, portable: Boolean): ArrayData = {
    val nChars = s.numChars()
    val n = nChars - (k - 1)
    if (n <= 0) return new GenericArrayData(Array.emptyLongArray)
    // code-point → byte-offset index, built in one scan: substr(text,i+1,k)
    // is the byte range [off(i), off(i+k)) — calling UTF8String.substring
    // per k-gram would re-walk the string from byte 0 every time (O(n²))
    val bytes = s.getBytes
    val offs = new Array[Int](nChars + 1)
    var ci = 0
    var bi = 0
    while (bi < bytes.length) {
      if ((bytes(bi) & 0xC0) != 0x80) { offs(ci) = bi; ci += 1 }
      bi += 1
    }
    offs(nChars) = bytes.length
    val hashes = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (portable) {
        // rolling 31-hash over the gram's bytes (RollingHash family);
        // unsigned fold so non-ASCII bytes don't go in negative
        var h = 1125899906842597L
        var b = offs(i)
        val end = offs(i + k)
        while (b < end) { h = h * 31L + (bytes(b) & 0xFF); b += 1 }
        hashes(i) = h
      } else {
        val gram = UTF8String.fromBytes(bytes, offs(i), offs(i + k) - offs(i))
        hashes(i) = XxHash64Function.hash(gram, StringType, 42L)
      }
      i += 1
    }
    val m = n - (w - 1)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    if (m <= 0) {
      i = 0
      while (i < n) { seen.add(hashes(i)); i += 1 }
    } else {
      // monotonic (increasing-value) deque of candidate indices
      val deque = new Array[Int](n)
      var head = 0; var tail = 0 // [head, tail)
      i = 0
      while (i < n) {
        while (tail > head && hashes(deque(tail - 1)) >= hashes(i)) tail -= 1
        deque(tail) = i; tail += 1
        val winStart = i - (w - 1)
        if (winStart >= 0) {
          while (deque(head) < winStart) head += 1
          seen.add(hashes(deque(head)))
        }
        i += 1
      }
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }
}

case class WinnowFingerprints(child: Expression, k: Int, w: Int,
                              portable: Boolean = false)
    extends UnaryExpression {
  require(k >= 1 && w >= 1, "winnow requires k >= 1 and w >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints requires STRING, got ${child.dataType.catalogString}")
  override def nullSafeEval(v: Any): Any =
    Winnow.compute(v.asInstanceOf[UTF8String], k, w, portable)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Winnow.compute($c, $k, $w, $portable)")
  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
  override def prettyName: String = "winnow_fingerprints"
}
