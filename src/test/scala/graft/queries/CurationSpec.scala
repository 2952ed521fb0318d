package graft.queries

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property-style pins for the curation layer's tokenization and planning
  * helpers against independent Scala references — the ANSI slice guards
  * (negative lengths throw in Spark 4) and the next-fit grouping rule are
  * exactly the places a refactor would silently bend.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(42)

  /** Random "text" including empty tokens (consecutive spaces), single
    * tokens, and empty strings — the split-on-' ' contract's edge cases. */
  private def randomTexts(n: Int): Seq[(Long, String)] =
    (0L until n.toLong).map { i =>
      val nTok = rnd.nextInt(6) // 0..5 tokens
      val toks = Seq.fill(nTok)(
        if (rnd.nextInt(5) == 0) "" // empty token (double space)
        else (1 to 1 + rnd.nextInt(4)).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)
      (i, toks.mkString(" "))
    }

  test("bigramsOf ≡ sliding(2) over split-on-' ' for hostile texts") {
    val docs = randomTexts(60).toDF("doc_id", "text")
    val got = CurationQueries.bigramsOf(docs, "doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq.sorted
    val ref = docs.collect().flatMap { r =>
      val ws = r.getString(1).split(" ", -1) // keep empty tokens, like Spark
      if (ws.length < 2) Seq.empty
      else ws.sliding(2).map(p => (r.getLong(0), p(0), p(1))).toSeq
    }.toSeq.sorted
    assert(got == ref)
  }

  test("trigramsOf ≡ sliding(3) over split-on-' ' for hostile texts") {
    val docs = randomTexts(60).toDF("doc_id", "text")
    val got = CurationQueries.trigramsOf(docs, "doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
      .toSeq.sorted
    val ref = docs.collect().flatMap { r =>
      val ws = r.getString(1).split(" ", -1)
      if (ws.length < 3) Seq.empty
      else ws.sliding(3).map(p => (r.getLong(0), p(0), p(1), p(2))).toSeq
    }.toSeq.sorted
    assert(got == ref)
  }

  test("REGISTERED q150 ≡ next-fit reference grouping on random sizes") {
    // drive the REGISTERED query over a synthetic documents table (temp
    // parquet dir) so a refactor of the production window logic — not a
    // copy of it — is what the reference grouping pins. Target = 2000
    // (the query's CompactTarget constant).
    val target = 2000L
    val files = (0L until 200L).map(i =>
      (s"s${i % 5}", i, 1L + rnd.nextInt(900).toLong))
    val dir = tempDir("graft-q150").toString
    files.toDF("source", "doc_id", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = CurationQueries.queries("q150_compaction_plan")(spark, dir)
      .collect().map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    val ref = files.groupBy(_._1).flatMap { case (src, fs) =>
      var prefix = 0L
      fs.sortBy(_._2).map { case (_, _, b) =>
        val g = prefix / target; prefix += b; (src, g, b)
      }.groupBy(_._2).map { case (g, rows) =>
        ((src, g), (rows.length.toLong, rows.map(_._3).sum))
      }
    }
    assert(got == ref)
    // every group holds at least one file and groups tile the file count
    assert(got.values.map(_._1).sum == files.length)
    assert(got.values.forall(_._1 >= 1))
  }
}
