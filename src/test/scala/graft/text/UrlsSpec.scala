package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Pins [[Urls]] canonicalization + host/registered-domain semantics on
  * the edge cases the q205/q206 fixtures cannot plant (they build
  * well-formed URLs by construction): malformed values, ports that are
  * NOT default, multi-slash tails, empty queries, deep ccTLD hosts. */
class UrlsSpec extends AnyFunSuite with SparkSpec {

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("url").select(Urls.canonicalize(col("url"))).as[String].collect().toSeq
  }

  private def hostDomain(urls: String*): Seq[(String, String)] = {
    import spark.implicits._
    urls.toDF("url").select(Urls.host(col("url")).as("h"))
      .select(col("h"), Urls.registeredDomain(col("h")))
      .as[(String, String)].collect().toSeq
  }

  test("canonicalize: case, default port, trailing slash, query sort, fragment") {
    assert(canon(
      "HTTPS://Www.Example.COM:443/A/b/?b=2&a=1#frag",
      "https://www.example.com/A/b?a=1&b=2",
      "http://example.com:80/",
      "http://example.com",
      "https://example.com:8443/x/",          // NON-default port stays
      "http://example.com:443/x",             // 443 is not http's default
      "https://example.com/x//",              // trailing-slash RUN strips
      "https://example.com/x?&&",             // empty params drop
      "https://example.com/x?single") == Seq(
      "https://www.example.com/A/b?a=1&b=2",
      "https://www.example.com/A/b?a=1&b=2",
      "http://example.com",
      "http://example.com",
      "https://example.com:8443/x",
      "http://example.com:443/x",
      "https://example.com/x",
      "https://example.com/x",
      "https://example.com/x?single"))
  }

  test("canonicalize strips tracking params (utm_*/fbclid/gclid/msclkid) " +
      "but never CONTENT values that merely mention them") {
    assert(canon(
      "https://example.com/x?utm_source=feed&b=2&fbclid=z123",
      "https://example.com/x?utm_source=a&utm_medium=b&gclid=1&msclkid=2",
      "https://example.com/x?q=utm_source&b=2", // utm_ as a VALUE survives
      "https://example.com/x?gclid=only") == Seq(
      "https://example.com/x?b=2",
      "https://example.com/x",
      "https://example.com/x?b=2&q=utm_source",
      "https://example.com/x"))
  }

  test("canonicalize: path case is preserved (paths are case-sensitive; " +
      "only scheme and host fold)") {
    assert(canon("HTTP://EXAMPLE.COM/CaseSensitive/Path") ==
      Seq("http://example.com/CaseSensitive/Path"))
  }

  test("canonicalize: non-URL values pass through verbatim") {
    assert(canon("not a url", "ftp-like-no-scheme/x", "") ==
      Seq("not a url", "ftp-like-no-scheme/x", ""))
  }

  test("host + registered domain: plain, subdomained, ccTLD second-level, " +
      "single-label") {
    assert(hostDomain(
      "https://example.com/x",
      "https://a.b.news.example.com/x",
      "https://Media.Example.CO.UK/x",
      "https://deep.sub.example.co.uk/x",
      "https://example.ac.jp/x",
      "https://localhost/x",
      "https://co.uk/x" // a bare suffix host: nothing above it to take
    ) == Seq(
      ("example.com", "example.com"),
      ("a.b.news.example.com", "example.com"),
      ("media.example.co.uk", "example.co.uk"),
      ("deep.sub.example.co.uk", "example.co.uk"),
      ("example.ac.jp", "example.ac.jp"),
      ("localhost", "localhost"),
      ("co.uk", "co.uk")))
  }

  test("canonicalize over the full component lattice (5376 URLs): matches " +
      "an independent JVM reference and is idempotent") {
    import spark.implicits._
    // independent reference: plain-JVM string logic, no shared code with
    // the Column implementation (the TextStats property-test discipline)
    def ref(u: String): String = {
      val m = "^([A-Za-z][A-Za-z0-9+.-]*)://".r.findFirstMatchIn(u)
      if (m.isEmpty) return u
      val sch = m.get.group(1).toLowerCase
      val rest = u.substring(m.get.end)
      val auth = rest.takeWhile(c => c != '/' && c != '?' && c != '#')
      val (host, port) = auth.indexOf(':') match {
        case -1 => (auth.toLowerCase, "")
        case i => (auth.take(i).toLowerCase, auth.drop(i + 1))
      }
      val afterAuth = rest.drop(auth.length)
      val path0 = afterAuth.takeWhile(c => c != '?' && c != '#')
      val path = path0.reverse.dropWhile(_ == '/').reverse
      val qRaw = afterAuth.drop(path0.length) match {
        case s if s.startsWith("?") => s.drop(1).takeWhile(_ != '#')
        case _ => ""
      }
      val params = qRaw.split("&").filter(p => p.nonEmpty &&
        !p.matches("(utm_[a-z]+|fbclid|gclid|msclkid)=.*")).sorted
      val portPart =
        if (port.isEmpty || (sch == "http" && port == "80") ||
          (sch == "https" && port == "443")) "" else ":" + port
      sch + "://" + host + portPart + path +
        (if (params.nonEmpty) "?" + params.mkString("&") else "")
    }
    val urls = for {
      sch <- Seq("https", "HTTPS", "Http", "http")
      host <- Seq("Example.COM", "sub.Example.co.uk", "LOCALHOST", "a.b.C.net")
      port <- Seq("", ":443", ":80", ":8080")
      path <- Seq("", "/", "/A/b", "/A/b/", "/x//", "/p/1")
      q <- Seq("", "?", "?a=1&b=2", "?b=2&a=1", "?b=2&utm_source=x&a=1",
        "?utm_source=x", "?a=1&&b=2")
      frag <- Seq("", "#f")
    } yield s"$sch://$host$port$path$q$frag"
    assert(urls.length == 5376)
    val got = urls.toDF("url")
      .select(col("url"), Urls.canonicalize(col("url")).as("c"))
      .select(col("url"), col("c"), Urls.canonicalize(col("c")).as("cc"))
      .as[(String, String, String)].collect()
    got.foreach { case (u, c, cc) =>
      assert(c == ref(u), s"engine vs reference diverged on $u: $c != ${ref(u)}")
      assert(cc == c, s"not idempotent on $u: $c -> $cc")
    }
  }

  test("host strips ports and is lowercased; query/path/port extractors " +
      "return '' when absent") {
    import spark.implicits._
    val r = Seq("HTTPS://HOST.Example.COM:8080")
      .toDF("url")
      .select(Urls.host(col("url")), Urls.port(col("url")),
        Urls.path(col("url")), Urls.query(col("url")))
      .as[(String, String, String, String)].collect().head
    assert(r == (("host.example.com", "8080", "", "")))
  }
}
