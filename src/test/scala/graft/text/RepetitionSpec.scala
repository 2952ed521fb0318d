package graft.text

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Repetition.repetitionStats

class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  private def statsOf(text: String): Row =
    Seq(text).toDF("t").select(repetitionStats($"t").as("r"))
      .select("r.*").head()

  test("word and distinct counts, top 2- and 3-grams") {
    // "a b a b a" → 5 words, 2 distinct; 2-grams: "a b"×2, "b a"×2 (tie →
    // binary-smallest gram "a b"); 3-grams: "a b a"×2 > "b a b"×1
    val r = statsOf("a b a b a")
    assert(r === Row(5, 2, "a b", 2, "a b a", 2))
  }

  test("fewer than n words yields null top-gram fields") {
    assert(statsOf("solo") === Row(1, 1, null, null, null, null))
    assert(statsOf("two words") === Row(2, 2, "two words", 1, null, null))
  }

  test("empty tokens are words, exactly like string_split on a space") {
    // "a  b" splits to ["a", "", "b"] — 3 words, 3 distinct; 2-grams
    // "a " and " b" (with the empty middle token), tie → binary-smallest
    // " b" (space sorts below 'a')
    val r = statsOf("a  b")
    assert(r === Row(3, 3, " b", 1, "a  b", 1))
  }

  test("highest count wins over lexicographic order") {
    // "z z"×2 beats the binary-smaller "a b"×1
    val r = statsOf("z z z a b")
    assert(r.getString(2) === "z z")
    assert(r.getInt(3) === 2)
  }

  test("q57 fractions derive from the struct with exact integer division") {
    val df = Seq((1L, "x x x x")).toDF("doc_id", "text")
      .select(col("doc_id"), length(col("text")).as("n_chars"),
        repetitionStats(col("text")).as("rep"))
      .select(
        ((col("rep.n_words") - col("rep.n_distinct_words")).cast("double") /
          col("rep.n_words").cast("double")).as("dup_word_frac"),
        ((col("rep.top2_cnt") * length(col("rep.top2_gram"))).cast("double") /
          col("n_chars").cast("double")).as("top2_frac"))
    assert(df.head() === Row(0.75, 9.0 / 7.0)) // "x x"×3 · 3 chars / 7 chars
  }
}
