package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Percent-escape normalization as ONE native expression (optimization
  * r17, guide §1.2 per-task work + §7.3 plan-size bottleneck).
  *
  * The original [[graft.text.Urls.normalizeEscapes]] was a Column tree:
  * a split/transform/rlike hex-uppercase pass followed by a fold of 66
  * literal `replace`s (one per RFC 3986 §2.3 unreserved character) — a
  * ~70-deep expression chain embedded at EVERY canonicalize/canonicalHost
  * call site. The web-family queries hold several such sites per plan, and
  * because Dataset transformations analyze eagerly, Catalyst re-walked
  * those thousands of nodes once per transformation call and again per
  * optimizer pass: PlanTime measured q205 construct+plan at ~0.5–0.6 s
  * warm and q231's construction at 2.7–3.5 s per invocation — pure
  * driver-side tree walking, no data touched. This expression is ONE node
  * with the same two passes evaluated imperatively per row.
  *
  * SEMANTICS ARE THE COLUMN CHAIN'S, BIT FOR BIT — including the
  * adversarial corner where one decode FABRICATES a later pattern
  * (`%%37E`: the `%37`→`7` digit decode creates `%7E`, which the chain's
  * later `~` replace then decodes — so the decode here is the same
  * ordered chain of literal replace-alls, NOT a single left-to-right
  * scan, which would leave `%7E` standing; UrlsSpec pins this case).
  * The DuckDB oracle twins interpolate the same ordered chain
  * ([[graft.queries.WebQueries]] SQL generation), so engine ≡ oracle is
  * unchanged by construction.
  */
object UrlEscapes {

  /** The unreserved characters (RFC 3986 §2.3) with their percent escapes
    * — hex already uppercase, the only form left after the hex pass. ONE
    * definition, shared with [[graft.text.Urls]] and the oracle SQL. */
  val UnreservedDecodes: Seq[(String, String)] =
    (('A' to 'Z') ++ ('a' to 'z') ++ ('0' to '9') ++ Seq('-', '.', '_', '~'))
      .map(ch => (f"%%${ch.toInt}%02X", ch.toString))

  private val decodesArr: Array[(String, String)] = UnreservedDecodes.toArray

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'A' && c <= 'F') || (c >= 'a' && c <= 'f')

  /** The two-pass normalization of one value. A value with no `%` is the
    * identity (the split yields one piece and no replace can match), so
    * the common case is a single scan. */
  def normalize(v: UTF8String): UTF8String = {
    val s0 = v.toString
    if (s0.indexOf('%') < 0) return v
    // PASS 1 (hex uppercase): split on '%' keeping trailing empties;
    // piece 0 verbatim; every later piece's first two chars uppercased
    // iff both are hex digits — the split/transform Column form exactly.
    val pieces = s0.split("%", -1)
    val sb = new java.lang.StringBuilder(s0.length)
    var i = 0
    while (i < pieces.length) {
      if (i > 0) sb.append('%')
      val p = pieces(i)
      if (i > 0 && p.length >= 2 && isHex(p.charAt(0)) && isHex(p.charAt(1))) {
        sb.append(Character.toUpperCase(p.charAt(0)))
        sb.append(Character.toUpperCase(p.charAt(1)))
        sb.append(p, 2, p.length)
      } else sb.append(p)
      i += 1
    }
    var s: String = sb.toString
    // PASS 2 (unreserved decode): the ordered chain of literal
    // replace-alls. Early exit once no '%' remains — no pattern can
    // match, and replacements never introduce '%'.
    var j = 0
    while (j < decodesArr.length && s.indexOf('%') >= 0) {
      val (esc, ch) = decodesArr(j)
      s = s.replace(esc, ch)
      j += 1
    }
    if (s == s0) v else UTF8String.fromString(s)
  }

  /** Column API: percent-escape-normalize a string column. */
  def normalizeEscapes(c: Column): Column =
    toColumn(NormalizeUrlEscapes(toExpr(c)))
}

/** Native Catalyst expression (whole-stage-codegen'd) for
  * [[UrlEscapes.normalize]]. */
case class NormalizeUrlEscapes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"normalize_url_escapes requires STRING input, got ${child.dataType.catalogString}")
  override def nullSafeEval(v: Any): Any =
    UrlEscapes.normalize(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UrlEscapes.normalize($c)")
  override protected def withNewChildInternal(newChild: Expression): NormalizeUrlEscapes =
    copy(child = newChild)
  override def prettyName: String = "normalize_url_escapes"
}
