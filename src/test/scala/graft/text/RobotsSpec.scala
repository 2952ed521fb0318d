package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Pins [[Robots]] — RFC 9309 core parsing + group selection — on the
  * stateful edges the q227 fixture exercises end-to-end and a few it
  * cannot (rules before any User-agent, unknown fields mid-group, CRLF,
  * the expression ≡ JVM-walk equality). */
class RobotsSpec extends AnyFunSuite with SparkSpec {

  test("parseLines: stacking, case-insensitive fields, comments, CRLF, " +
      "unknown fields ignored, rules before any group dropped") {
    val txt = Seq(
      "Disallow: /orphan",            // before any UA: dropped
      "User-agent: alpha",
      "User-Agent: beta",             // stacks onto the same group
      "Crawl-delay: 10",              // unknown field: ignored, no break
      "disallow: /x/\r",              // CRLF + lowercase field
      "",                             // blank line does NOT end the group
      "Allow: /x/ok # trailing note", // comment stripped
      "User-agent: gamma",            // rule seen -> NEW group
      "Disallow: /y/").mkString("\n")
    assert(Robots.parseLines(txt) == Seq(
      ("beta", "disallow", "/x/"), ("alpha", "disallow", "/x/"),
      ("beta", "allow", "/x/ok"), ("alpha", "allow", "/x/ok"),
      ("gamma", "disallow", "/y/")))
  }

  test("expression form == JVM walk; null-safe") {
    import spark.implicits._
    val txt = "User-agent: *\nDisallow: /a/\nAllow: /a/1\n"
    val got = Seq(txt).toDF("t")
      .select(explode(Robots.parseRules(col("t"))).as("r"))
      .select(col("r.ua"), col("r.dir"), col("r.pfx"))
      .as[(String, String, String)].collect().toSeq
    assert(got == Robots.parseLines(txt))
  }

  test("group selection: an agent-specific group SILENCES the * group; " +
      "empty patterns match nothing and drop; agent match is " +
      "case-insensitive via the lowercased token") {
    import spark.implicits._
    val txt = "User-agent: GraftBot\nDisallow: /private/\n" +
      "User-agent: *\nDisallow:\nDisallow: /all/\n"
    def applicable(agent: String): Seq[(String, String)] =
      Seq(txt).toDF("t")
        .select(explode(Robots.applicableRules(
          Robots.parseRules(col("t")), agent)).as("r"))
        .select(col("r.dir"), col("r.pfx"))
        .as[(String, String)].collect().toSeq
    assert(applicable("graftbot") == Seq(("disallow", "/private/")))
    // another crawler falls through to * (the bare Disallow: dropped)
    assert(applicable("otherbot") == Seq(("disallow", "/all/")))
  }

  test("gate tie-break: equal-length Allow beats Disallow (RFC 9309)") {
    import spark.implicits._
    val rules = Seq(("h", "disallow", "/a/"), ("h", "allow", "/a/"))
      .toDF("host", "dir", "pfx")
    val doc = Seq((1L, "h", "/a/x")).toDF("doc_id", "host", "path")
    val w = doc.join(rules, Seq("host"))
      .where(col("path").startsWith(col("pfx")))
      .groupBy("doc_id")
      .agg(max(struct(length(col("pfx")).as("l"),
        (col("dir") === "allow").as("a"), col("dir").as("dir"),
        col("pfx").as("pfx"))).as("w"))
      .select(col("w.a")).head().getBoolean(0)
    assert(w, "equal-length Allow must win the tie")
  }
}
