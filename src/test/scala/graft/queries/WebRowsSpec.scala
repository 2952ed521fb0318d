package graft.queries

import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Independent anchors for the round-15 web-curation rows beyond their
  * DuckDB oracles: q218's verdicts re-derived from the planted rule by
  * plain arithmetic, and q219's keeper/reassembly re-derived by a naive
  * single-threaded JVM pass over the extracted lines (the TextStats
  * property-test discipline: no shared code with the engine path). */
class WebRowsSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q218: every verdict follows the planted noindex/canonical rule " +
      "(noindex on doc%7==3; singleton-v2 aliases resolve to the group's " +
      "v0 doc; everything else keeps itself)") {
    val rows = graft.SparkEntry.queries("q218_noindex_canonical")(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val noidx = r.getBoolean(1)
      val canon = r.getLong(2)
      val kept = r.getBoolean(3)
      val grp = id / 3
      assert(noidx == (id % 7 == 3), s"doc $id noindex")
      val alias = grp % 4 == 0 && id % 3 == 2
      assert(canon == (if (alias) grp * 3 else id), s"doc $id canonical_doc")
      assert(kept == (!noidx && canon == id), s"doc $id kept")
    }
    // the fixture plants BOTH classes at this SF — the rule test above
    // would pass vacuously on a corpus where neither fires
    assert(rows.exists(_.getBoolean(1)))
    assert(rows.exists(r => r.getLong(2) != r.getLong(0)))
  }

  test("robots gate target: a ROOT (or query-only) URL's target floors " +
      "to '/' so `Disallow: /` matches it (review r17 #2 — RFC 9309 " +
      "matches the URI path, which is never empty)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val urls = Seq(
      "https://shop.example.com.au/",          // root with slash
      "https://shop.example.com.au",           // bare authority
      "https://shop.example.com.au/?a=1",      // query-only
      "https://shop.example.com.au/a/1?a=1")   // normal path (control)
    val targets = urls.toDF("url")
      .select(WebQueries.robotsTarget(col("url")))
      .as[String].collect().toSeq
    assert(targets == Seq("/", "/", "/?a=1", "/a/1?a=1"))
    // and the committed shop rule blocks all of them for graftbot
    targets.foreach { t =>
      assert(graft.text.Robots.patternMatches(t, "/"),
        s"Disallow: / must match target '$t'")
    }
  }

  test("q219: paragraph keeper + reassembly match a naive single-threaded " +
      "reimplementation over the same extracted lines") {
    import org.apache.spark.sql.functions._
    val ext = TextQueries.markupPageLines(
        spark.read.parquet(s"$dir/documents.parquet"))
      .select(col("doc_id"),
        graft.text.Markup.extractTextOfLines(col("pl"), minWords = 4)
          .as("kept"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[String](1)))
      .sortBy(_._1)
    // naive global pass in (doc, idx) order: first occurrence of each
    // distinct paragraph wins
    val seen = scala.collection.mutable.HashSet[String]()
    val expected = ext.map { case (id, pars) =>
      val kept = pars.filter(p => seen.add(p))
      val md = MessageDigest.getInstance("MD5")
        .digest(kept.mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      id -> ((pars.length.toLong, kept.length.toLong, md))
    }.toMap
    val got = graft.SparkEntry.queries("q219_paragraph_dedup")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (id, v) =>
      assert(v == expected(id), s"doc $id: got $v expected ${expected(id)}")
    }
    // the planted entity line is on EVERY page: exactly one survivor
    val totalKept = got.values.map(_._2).sum
    val totalPars = got.values.map(_._1).sum
    assert(totalKept < totalPars, "dedup must actually drop something")
  }

  test("Sitemaps.entries: entity decode order, whitespace trim, W3C " +
      "lastmod forms (seconds/minutes/Z/date-only), malformed date and " +
      "out-of-range priority -> NULL, loc-less block dropped, index vs " +
      "urlset kinds, junk input -> empty") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val xml =
      "<urlset>" +
        // '&amp;lt;' must decode to the LITERAL text '&lt;' (one &amp;
        // pass, decoded last), never double-decode into '<'
        "<url><loc> https://h.example/a?x=1&amp;y=2&amp;lt; </loc>" +
        "<lastmod>2024-03-05T23:30:00-05:00</lastmod>" +
        "<priority>1.0</priority></url>" +
        "<url><loc>https://h.example/b</loc><lastmod>yesterday</lastmod>" +
        "<priority>high</priority></url>" +
        // the Z zone spelling is zero offset under the XXX pattern
        "<url><loc>https://h.example/c</loc>" +
        "<lastmod>2024-03-05T10:30:00Z</lastmod></url>" +
        // minutes-precision W3C form; priority OUT of [0,1] -> NULL
        "<url><loc>https://h.example/d</loc>" +
        "<lastmod>2024-03-05T10:30+00:00</lastmod>" +
        "<priority>5.0</priority></url>" +
        // no <loc>: invalid block, dropped entirely
        "<url><lastmod>2024-01-01</lastmod></url>" +
        "</urlset>"
    val idx =
      "<sitemapindex><sitemap><loc>https://h.example/s.xml</loc>" +
        "</sitemap></sitemapindex>"
    val rows = Seq(xml, idx, "not xml at all", "")
      .toDF("x")
      .select(explode(graft.text.Sitemaps.entries(col("x"))).as("e"))
      .select(col("e.kind"), col("e.loc"), col("e.lastmod_ms"),
        col("e.priority"))
      .collect()
      .map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1.0 else r.getDouble(3)))
      .toSeq
    assert(rows == Seq(
      // 2024-03-06T04:30:00Z = 1709699400000
      ("url", "https://h.example/a?x=1&y=2&lt;", 1709699400000L, 1.0),
      ("url", "https://h.example/b", -1L, -1.0),
      // 2024-03-05T10:30:00Z = 1709634600000
      ("url", "https://h.example/c", 1709634600000L, -1.0),
      ("url", "https://h.example/d", 1709634600000L, -1.0),
      ("sitemap", "https://h.example/s.xml", -1L, -1.0)))
  }

  test("SitemapBlocks native node ≡ the original regexp/replace Column " +
      "chain on adversarial inputs (r18 nativization pin)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // the pre-r18 Column formulation, kept verbatim as the reference
    def oldBlocks(xml: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val entities = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&apos;" -> "'", "&amp;" -> "&")
      def one(tag: String, kind: String) =
        transform(
          regexp_extract_all(xml, lit(s"(?s)<$tag>(.*?)</$tag>"), lit(1)),
          b => {
            def wstrim(c: org.apache.spark.sql.Column) =
              regexp_replace(c, "\\A\\s+|\\s+\\z", "")
            val loc = wstrim(entities.foldLeft(
              regexp_extract(b, "(?s)<loc>(.*?)</loc>", 1)) {
                case (acc, (ent, ch)) => replace(acc, lit(ent), lit(ch)) })
            struct(lit(kind).as("kind"), loc.as("loc"),
              wstrim(regexp_extract(b, "(?s)<lastmod>(.*?)</lastmod>", 1)).as("lm"),
              wstrim(regexp_extract(b, "(?s)<priority>(.*?)</priority>", 1)).as("pr"))
          })
      filter(concat(one("url", "url"), one("sitemap", "sitemap")),
        e => e.getField("loc") =!= "")
    }
    val cases = Seq(
      // nested open tag inside a block; close before next open
      "<url><loc>a</loc></url><url><loc>b<url>c</loc></url>",
      // unterminated last block; entity soup incl. double-decode trap
      "<url><loc>\n\t x&amp;amp;y&quot;&apos;&gt;&lt; </loc><url><loc>z",
      // loc-less blocks interleaved with valid ones; both kinds present
      "<url><lastmod>2024-01-01</lastmod></url><url><loc>k</loc>" +
        "<priority> 0.5 </priority></url><sitemapindex>" +
        "<sitemap><loc>s1</loc><lastmod> 2024-02-02 </lastmod></sitemap>" +
        "<sitemap><loc></loc></sitemap></sitemapindex>",
      // whitespace-only loc trims to "" and must drop
      "<url><loc> \t\r\n </loc></url><url><loc>ok</loc></url>",
      "", "no tags at all", "<url></url><sitemap></sitemap>")
    val df = cases.toDF("x")
    val got = df.select(graft.functions.SitemapBlocks.blocks(col("x")).cast("string"))
      .collect().map(_.getString(0)).toSeq
    val want = df.select(oldBlocks(col("x")).cast("string"))
      .collect().map(_.getString(0)).toSeq
    assert(got == want, s"native blocks diverge:\n got=$got\nwant=$want")
    // null input stays null through the native node
    assert(Seq(null.asInstanceOf[String]).toDF("x")
      .select(graft.functions.SitemapBlocks.blocks(col("x"))).head().isNullAt(0))
  }
}
