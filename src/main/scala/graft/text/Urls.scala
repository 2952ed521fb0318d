package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization + host/registered-domain extraction — the front
  * gate of every public web-corpus pipeline (C4: Raffel et al. 2020;
  * RefinedWeb: Penedo et al. 2023 both dedup by URL and cap per-host
  * shares BEFORE text-level dedup). Everything here is built-in codegen'd
  * string expressions (`regexp_extract`/`lower`/`split`/`array_sort`/
  * `concat_ws`) over one row at a time — a narrow map stage that fuses
  * into whole-stage codegen and costs zero shuffle — and every step has
  * an exact DuckDB twin (portable regex constructs only: anchored
  * character classes, no backreferences or lookaround).
  *
  * Canonical form: lowercase scheme and host, default port dropped
  * (http:80 / https:443 — a non-default port is IDENTITY, it stays),
  * trailing-slash run stripped from the path (`/a/` ≡ `/a`; root `/` ≡
  * empty), query parameters sorted with empties dropped, fragment
  * removed. Percent-encoding and userinfo normalization are documented
  * boundaries (fixtures carry neither; a production corpus would add an
  * RFC 3986 decode pass in the same narrow-map position). */
object Urls {

  /** Lowercased scheme ("" when the value is not a scheme://-shaped URL —
    * malformed rows are data, they canonicalize to themselves). */
  def scheme(url: Column): Column =
    lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  /** Lowercased host: the authority minus any port/userinfo. */
  def host(url: Column): Column =
    lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]*)", 1))

  /** Explicit port digits, "" when absent. */
  def port(url: Column): Column =
    regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#:]*:([0-9]+)", 1)

  /** Raw path (everything after the authority up to ?/#; "" when absent). */
  def path(url: Column): Column =
    regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)

  /** Raw query string (after ?, before #; "" when absent). */
  def query(url: Column): Column = regexp_extract(url, "\\?([^#]*)", 1)

  /** Tracking parameters stripped during canonicalization — the C4/
    * RefinedWeb discipline: two renders of one page differing only in
    * campaign attribution are the same document. ONE definition, shared
    * with the oracle SQL generation. Anchored full-param regex (a
    * CONTENT value like `x=utm_source` must survive). */
  val TrackingParamRegex: String = "\\A(utm_[a-z]+|fbclid|gclid|msclkid)=.*\\z"

  /** Canonical query part: params split on &, empties and tracking params
    * dropped, sorted, rejoined — "?a=1&b=2" for any arrival order; ""
    * when nothing survives. */
  def canonicalQuery(url: Column): Column = {
    val params = array_sort(filter(split(query(url), "&"),
      p => p =!= "" && !p.rlike(TrackingParamRegex)))
    when(size(params) > 0, concat(lit("?"), array_join(params, "&")))
      .otherwise(lit(""))
  }

  /** Canonical path: trailing-slash run stripped (root collapses to ""). */
  def canonicalPath(url: Column): Column =
    regexp_replace(path(url), "/+$", "")

  /** The full canonical URL. Non-URL values (no scheme://) pass through
    * verbatim — canonicalization never invents structure. */
  def canonicalize(url: Column): Column = {
    val sch = scheme(url)
    val h = host(url)
    val p = port(url)
    val portPart =
      when(p === "", lit(""))
        .when(sch === "http" && p === "80", lit(""))
        .when(sch === "https" && p === "443", lit(""))
        .otherwise(concat(lit(":"), p))
    when(sch === "", url)
      .otherwise(concat(sch, lit("://"), h, portPart,
        canonicalPath(url), canonicalQuery(url)))
  }

  /** Second-level public suffixes covered by the offline heuristic below —
    * ONE definition shared with the oracle SQL generation. */
  val SecondLevelSuffixes: Seq[String] =
    Seq("co", "com", "org", "net", "ac", "gov", "edu")

  /** Registered domain of a HOST (not a URL): the last two labels, or the
    * last THREE when the host ends in a ccTLD second-level suffix
    * (news.example.co.uk → example.co.uk). This is the standard offline
    * heuristic — the full Mozilla public-suffix list is a data file this
    * environment cannot ship; the heuristic covers the `<suffix>.<cc>`
    * pattern that dominates real corpora and is a DOCUMENTED boundary,
    * not a silent approximation. Single-label hosts (localhost, bare
    * names) return themselves. */
  def registeredDomain(hostCol: Column): Column = {
    val ls = split(hostCol, "\\.")
    val n = size(ls)
    val ccSecondLevel = element_at(ls, -2).isin(SecondLevelSuffixes: _*) &&
      length(element_at(ls, -1)) === 2
    when(n <= 2, hostCol)
      .when(ccSecondLevel,
        concat_ws(".", element_at(ls, -3), element_at(ls, -2), element_at(ls, -1)))
      .otherwise(concat_ws(".", element_at(ls, -2), element_at(ls, -1)))
  }
}
