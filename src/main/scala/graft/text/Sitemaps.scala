package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** sitemaps.org protocol parsing — the discovery half of the politeness
  * layer's metadata ([[Robots]] carries the per-host `Sitemap:` pointers
  * as data, q229; this parses the pointed-at FILES into frontier
  * candidate rows).
  *
  * Reference context: the reference pipeline
  * (Pierre545/Sentinel-Landsat-database-creation) has no crawl layer —
  * this extends the LLM-data-pipeline surface the same way the robots
  * gate does (round-17 discipline: batch parse per DISTINCT file,
  * hand-derived committed expectations as the oracle).
  *
  * Scope (the protocol core, sitemaps.org/protocol.html):
  *   - `<urlset>` files: one entry per `<url>` block — `<loc>` (required;
  *     XML-entity decoded, surrounding whitespace trimmed, per the
  *     protocol), optional `<lastmod>` (W3C datetime: date-only or full
  *     with zone offset; anything else → NULL, parse never fails),
  *     optional `<priority>` (decimal → double; malformed → NULL);
  *   - `<sitemapindex>` files: one entry per `<sitemap>` block, same
  *     fields, `kind = "sitemap"` — the scheduler's recursion feed (the
  *     child files are DISCOVERED, not fetched here: recursion is the
  *     crawl loop's job, not the parser's);
  *   - `<changefreq>` is carried nowhere (advisory, no consumer);
  *     lastmod accepts date-only, `±HH:MM` offsets AND the `Z` zero-
  *     offset spelling (the XXX pattern's no-offset text — spec-pinned);
  *     documented boundary: the seconds-fraction form is out (→ NULL,
  *     like any other unparseable value).
  *
  * Everything is composed builtin string/timestamp expressions — fully
  * codegen'd, never-fail by construction (absent tags extract to "",
  * which parses to NULL). 100 TB shape: sitemap files are model-sized
  * per-host artifacts; the parse runs per DISTINCT file and the output
  * is frontier rows, never corpus-sized.
  */
object Sitemaps {

  /** W3C datetime → epoch millis (UTC session zone): the seconds form,
    * the minutes-precision form (both valid per the W3C profile
    * sitemaps.org cites; XXX accepts `±HH:MM` and the `Z` zero-offset
    * spelling), then date-only; all failing → NULL. */
  private def lastmodMs(s: Column): Column =
    unix_millis(coalesce(
      try_to_timestamp(s, lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
      try_to_timestamp(s, lit("yyyy-MM-dd'T'HH:mmXXX")),
      try_to_timestamp(s, lit("yyyy-MM-dd"))))

  /** All entries of one sitemap XML document:
    * `array<struct<kind, loc, lastmod_ms, priority>>` — `kind` is
    * `"url"` (urlset entries) or `"sitemap"` (index entries).
    *
    * The STRING half (block scan, loc/lastmod/priority extraction,
    * entity decode with `&amp;` LAST, whitespace trim, loc-required
    * filter) is the ONE native [[graft.functions.SitemapBlocks]] node —
    * the old per-tag regexp/replace Column lambdas were built twice and
    * dominated q230/q231's per-invocation construction cost
    * (optimization r18; semantics pinned ≡ the old chain in
    * SitemapsSpec). The timestamp/priority INTERPRETATION deliberately
    * stays in composed builtins here, so W3C-datetime parsing remains
    * Spark's own try_to_timestamp, never a lookalike. */
  def entries(xml: Column): Column =
    transform(graft.functions.SitemapBlocks.blocks(xml), b => {
      val pr = b.getField("pr")
      struct(
        b.getField("kind").as("kind"),
        b.getField("loc").as("loc"),
        lastmodMs(b.getField("lm")).as("lastmod_ms"),
        // the protocol bounds priority to [0.0, 1.0]; out-of-range
        // values are invalid and NULL like any other malformed field
        // (else a rogue <priority>5.0</priority> would dominate the
        // q231 queue ranking)
        when(pr.rlike("\\A[0-9]+(\\.[0-9]+)?\\z") &&
            pr.cast("double").between(0.0, 1.0), pr.cast("double"))
          .as("priority"))
    })
}
