package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Markup → training-text extraction: the front-most stage of a web-scale
  * corpus pipeline (the C4/CCNet discipline — Raffel et al. 2020, public):
  * strip tags, decode the five XML entities, normalize whitespace, then
  * keep only lines that look like prose (minimum word count + terminal
  * punctuation). Everything is `org.apache.spark.sql.functions` over the
  * page's line array — codegen'd string ops, no UDF, and each step has an
  * exact DuckDB twin (literal `replace` chain; the two regexes use only
  * portable constructs: a negated character class and an explicit
  * whitespace class).
  *
  * Order contract (pinned in spec): tags strip BEFORE entity decode — so
  * `&lt;script&gt;` decodes to a LITERAL `<script>` in the text instead
  * of becoming a strippable tag — and `&amp;` decodes LAST so `&amp;lt;`
  * yields the literal `&lt;` rather than `<`. Only the five XML entities
  * decode; numeric references beyond `&#39;` and exotic named entities
  * (`&copy;` …) pass through verbatim — a documented boundary, not a
  * silent lossy step. */
object Markup {

  /** Replace every `<...>` tag run with a space (regex `<[^>]*>` — an
    * unclosed `<` tail is left verbatim: malformed markup is data). */
  def stripTags(c: Column): Column = regexp_replace(c, "<[^>]*>", " ")

  /** The five XML entities, `&amp;` LAST (see order contract). */
  def decodeEntities(c: Column): Column =
    Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(c) { case (acc, (k, v)) =>
        call_function("replace", acc, lit(k), lit(v))
      }

  /** strip → decode → collapse runs of space/tab/CR → trim. The
    * whitespace class is explicit (`[ \t\r]`) so the Java and RE2 regex
    * engines agree character-for-character. */
  def cleanLine(c: Column): Column =
    trim(regexp_replace(decodeEntities(stripTags(c)),
      "[ \\t\\r]+", " "))

  /** Per-line cleaning of a newline-separated page. */
  def extractLines(html: Column): Column =
    transform(split(html, "\n"), l => cleanLine(l))

  /** Per-line cleaning of a page already held as a LINE ARRAY — callers
    * that build pages line-wise keep the array form end-to-end (advisor
    * r13: an array_join("\n") → split("\n") round-trip would re-segment
    * any line whose content itself contains a newline; [[cleanLine]]
    * deliberately does not collapse \n, so the invariant must be
    * structural, not fixture luck). */
  def cleanLines(lines: Column): Column =
    transform(lines, l => cleanLine(l))

  /** C4-style prose rule: at least `minWords` space-separated words AND
    * terminal punctuation ('.', '!', '?') — navigation, titles, footers
    * and code fragments fail it. */
  def keepLine(l: Column, minWords: Int): Column =
    (l =!= "") && (size(split(l, " ")) >= minWords) &&
      call_function("right", l, lit(1)).isin(".", "!", "?")

  /** The composed extractor: cleaned prose lines of a page, in page
    * order. */
  def extractText(html: Column, minWords: Int = 4): Column =
    filter(extractLines(html), l => keepLine(l, minWords))

  /** [[extractText]] over a page held as a line array (no newline-join
    * round-trip — see [[cleanLines]]). */
  def extractTextOfLines(lines: Column, minWords: Int = 4): Column =
    filter(cleanLines(lines), l => keepLine(l, minWords))
}
