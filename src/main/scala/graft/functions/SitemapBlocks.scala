package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The STRING half of sitemap parsing as ONE native expression
  * (optimization r18, guide §1.2 per-task work + §7.3 plan-size
  * bottleneck — the r17 [[UrlEscapes]] treatment applied to
  * [[graft.text.Sitemaps.entries]]).
  *
  * The original Column form built the full block-parse lambda TWICE (once
  * per `<url>`/`<sitemap>` tag): regexp_extract_all + a per-block
  * transform of three `(?s)<tag>(.*?)</tag>` regexp_extracts, a five-step
  * entity-decode replace chain and two regexp_replace trims — ~80 nodes
  * that Catalyst re-walked on every transformation call (PlanTime r18:
  * q230 construct ≈ 0.5 s, q231 ≈ 0.9–1.0 s per invocation, all
  * driver-side). This node extracts the raw trimmed strings imperatively;
  * the TIMESTAMP and PRIORITY interpretation deliberately stays in
  * composed builtins on top (one copy now, not two), so the W3C-datetime
  * semantics remain Spark's own `try_to_timestamp` — never a
  * reimplementation that could drift from the oracle.
  *
  * SEMANTICS ARE THE COLUMN CHAIN'S, EXACTLY:
  *   - block scan ≡ `regexp_extract_all(xml, "(?s)<tag>(.*?)</tag>", 1)`:
  *     non-greedy first-close matching, next search resumes after the
  *     consumed close tag (non-overlapping, like java.util.regex);
  *     `<url>` blocks first, then `<sitemap>` blocks (the concat order);
  *   - per block: first `<loc>`/`<lastmod>`/`<priority>` payloads
  *     (absent → "", regexp_extract's no-match value), loc
  *     entity-decoded with `&amp;` LAST then whitespace-trimmed, the
  *     other two trimmed raw (they never carry entities the protocol
  *     allows through);
  *   - trim strips exactly Java-regex `\s` = [ \t\n\f\r] — the
  *     `regexp_replace(c, "\\A\\s+|\\s+\\z", "")` class, NOT
  *     String.trim's <= ' ' rule;
  *   - blocks whose loc is "" are dropped (loc is the one required
  *     field), matching the old array filter.
  */
object SitemapBlocks {

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  private def wstrim(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && isWs(s.charAt(a))) a += 1
    while (b > a && isWs(s.charAt(b - 1))) b -= 1
    if (a == 0 && b == s.length) s else s.substring(a, b)
  }

  /** The five XML predefined entities, `&amp;` decoded LAST — shared with
    * [[graft.text.Sitemaps]]' documented order contract. */
  val Entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&apos;" -> "'",
    "&amp;" -> "&")

  private val entitiesArr = Entities.toArray

  private def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    var r = s
    var i = 0
    while (i < entitiesArr.length) {
      r = r.replace(entitiesArr(i)._1, entitiesArr(i)._2)
      i += 1
    }
    r
  }

  /** First `<open>…</close>` payload of `b`, or "" when either tag is
    * absent — regexp_extract's first-match/no-match semantics. */
  private def extractFirst(b: String, open: String, close: String): String = {
    val i = b.indexOf(open)
    if (i < 0) return ""
    val j = b.indexOf(close, i + open.length)
    if (j < 0) "" else b.substring(i + open.length, j)
  }

  /** All (kind, loc, lastmod_raw, priority_raw) rows of one sitemap XML
    * document — url blocks then sitemap blocks, loc-less blocks dropped. */
  def blocksOf(xml: String): Array[(String, String, String, String)] = {
    val out = Array.newBuilder[(String, String, String, String)]
    def scan(tag: String, kind: String): Unit = {
      val open = s"<$tag>"
      val close = s"</$tag>"
      var from = 0
      var going = true
      while (going) {
        val i = xml.indexOf(open, from)
        if (i < 0) going = false
        else {
          val j = xml.indexOf(close, i + open.length)
          if (j < 0) going = false
          else {
            val b = xml.substring(i + open.length, j)
            val loc = wstrim(decodeEntities(extractFirst(b, "<loc>", "</loc>")))
            if (loc.nonEmpty)
              out += ((kind, loc,
                wstrim(extractFirst(b, "<lastmod>", "</lastmod>")),
                wstrim(extractFirst(b, "<priority>", "</priority>"))))
            from = j + close.length
          }
        }
      }
    }
    scan("url", "url")
    scan("sitemap", "sitemap")
    out.result()
  }

  /** Column API: raw sitemap blocks of an XML string column —
    * `array<struct<kind,loc,lm,pr>>` of trimmed strings. */
  def blocks(xml: Column): Column = toColumn(SitemapBlocksExpr(toExpr(xml)))
}

/** Native Catalyst expression for [[SitemapBlocks.blocksOf]]. Evaluated
  * per DISTINCT sitemap file (model-scale frames), so CodegenFallback's
  * one virtual call per row is immaterial — the win is the ~80-node
  * Column tree collapsing to one node (driver-side analysis cost). */
case class SitemapBlocksExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("loc", StringType, nullable = false),
    StructField("lm", StringType, nullable = false),
    StructField("pr", StringType, nullable = false))), containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sitemap_blocks requires STRING input, got ${child.dataType.catalogString}")
  override def nullSafeEval(v: Any): Any = {
    val rows = SitemapBlocks.blocksOf(v.asInstanceOf[UTF8String].toString)
      .map { case (kind, loc, lm, pr) =>
        InternalRow(UTF8String.fromString(kind), UTF8String.fromString(loc),
          UTF8String.fromString(lm), UTF8String.fromString(pr))
      }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }
  override protected def withNewChildInternal(newChild: Expression): SitemapBlocksExpr =
    copy(child = newChild)
  override def prettyName: String = "sitemap_blocks"
}
