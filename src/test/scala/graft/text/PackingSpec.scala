package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("next-fit on a hand-built shard: overflow starts a new pack, oversized doc rides alone") {
    val docs = Seq(
      ("s1", 1L, 50L), ("s1", 2L, 60L),  // 50+60 > 100 → doc 2 starts pack 1
      ("s1", 3L, 40L),                    // 60+40 = 100 ≤ 100 → stays pack 1
      ("s1", 4L, 250L),                   // oversized → own pack 2
      ("s1", 5L, 10L),                    // pack 3 (never joins an overflowed pack)
      ("s2", 6L, 10L), ("s2", 7L, 10L))   // fresh shard restarts at pack 0
      .toDF("src", "id", "nt")
    val out = Packing.packNextFit(docs, col("src"), col("id"), col("nt"), budget = 100)
      .orderBy("shard", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(out.toSeq == Seq(
      ("s1", 1L, 0L), ("s1", 2L, 1L), ("s1", 3L, 1L),
      ("s1", 4L, 2L), ("s1", 5L, 3L),
      ("s2", 6L, 0L), ("s2", 7L, 0L)))
  }

  test("invariants on the real corpus: budget respected, pack ids contiguous per shard") {
    val docs = spark.read.parquet(sf("documents"))
    val out = graft.SparkEntry.queries("q52_seq_packing")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length == docs.count())
    out.groupBy(r => (r._1, r._4)).foreach { case ((shard, pack), members) =>
      // a pack over budget must be a single oversized doc
      val tot = members.map(_._3).sum
      assert(tot <= 120 || members.length == 1,
        s"pack ($shard, $pack): ${members.length} docs, $tot tokens")
    }
    out.groupBy(_._1).foreach { case (shard, rows) =>
      val packs = rows.map(_._4).distinct.sorted.toSeq
      assert(packs == (0L until packs.length),
        s"shard $shard pack ids not contiguous: ${packs.take(10).mkString(",")}")
    }
    // the walk is deterministic: same assignment on a different layout
    val again = graft.SparkEntry.queries("q52_seq_packing")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == again.toSeq)
  }
}
