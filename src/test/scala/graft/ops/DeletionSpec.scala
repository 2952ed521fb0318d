package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Mix64

class DeletionSpec extends SparkSpec {
  import Deletion.Subject
  import spark.implicits._

  private val fact = Seq(
    (1L, 10L, "click"), (2L, 10L, "view"), (3L, 20L, "click"),
    (4L, 30L, "purchase"), (5L, 20L, "view")
  ).toDF("event_id", "user_id", "event_type")

  test("scrub drops exactly the requested subjects' rows") {
    val req = Seq(20L, 20L, 99L).toDF("user_id") // dupes + a no-op key
    val left = Deletion.scrub(fact, col("user_id"), req)
      .select("event_id").as[Long].collect().sorted
    assert(left.toSeq == Seq(1L, 2L, 4L))
  }

  test("propagate: audit counts and checksum match a manual recompute") {
    val req = Seq(10L).toDF("user_id")
    val derived = fact.groupBy("user_id").agg(count(lit(1)).as("n"))
    val got = Deletion.propagate(Seq(
        Subject("fact", fact, col("user_id"), col("event_id")),
        Subject("per_user", derived, col("user_id"), col("user_id"))),
        req)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // fact: user 10 owns events 1,2 → 5 before, 3 after
    assert(got("fact")._1 == 5L && got("fact")._2 == 3L && got("fact")._3 == 2L)
    assert(got("fact")._4 == Seq(3L, 4L, 5L).map(Mix64.hash(_) % 1048576L).sum)
    // per_user: 3 users before, 2 after
    assert(got("per_user") == ((3L, 2L, 1L,
      Seq(20L, 30L).map(Mix64.hash(_) % 1048576L).sum)))
  }

  test("propagate checksum == coord-sum over the scrubbed frame") {
    val req = Seq(20L).toDF("user_id")
    val audit = Deletion.propagate(
      Seq(Subject("fact", fact, col("user_id"), col("event_id"))), req)
      .collect().head
    val scrubSum = Deletion.scrub(fact, col("user_id"), req)
      .agg(sum(pmod(Mix64.sampleCoord(col("event_id")), lit(1048576L))))
      .as[Long].collect().head
    assert(audit.getLong(4) == scrubSum)
  }

  test("propagate: empty request list deletes nothing; empty subjects rejected") {
    val audit = Deletion.propagate(
      Seq(Subject("fact", fact, col("user_id"), col("event_id"))),
      Seq.empty[Long].toDF("user_id")).collect().head
    assert(audit.getLong(1) == 5L && audit.getLong(2) == 5L
      && audit.getLong(3) == 0L)
    intercept[IllegalArgumentException] {
      Deletion.propagate(Seq.empty, Seq(1L).toDF("user_id"))
    }
    intercept[IllegalArgumentException] {
      Deletion.propagate(
        Seq(Subject("fact", fact, col("user_id"), col("event_id"))),
        Seq((1L, 2L)).toDF("a", "b"))
    }
  }
}
