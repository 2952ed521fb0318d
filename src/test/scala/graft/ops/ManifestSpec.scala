package graft.ops

import graft.SparkSpec

class ManifestSpec extends SparkSpec {
  import spark.implicits._

  private def manifest(dir: String) =
    graft.SparkEntry.queries("q117_shard_manifest")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap

  test("q117 manifest: shard assignment is the documented pure function of doc_id") {
    val rows = graft.SparkEntry.queries("q117_shard_manifest")(spark, sfDir)
    // every doc lands where Mix64 says it does: re-derive the assignment
    // independently and compare per-shard doc counts
    val expected = spark.read.parquet(sf("documents")).select("doc_id")
      .collect().map(_.getLong(0))
      .groupBy(id => graft.functions.Mix64.hash(id) % 16)
      .view.mapValues(_.length.toLong).toMap
    val got = rows.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("q117 manifest: single-doc corruption flips exactly that shard's checksum") {
    val base = java.nio.file.Files.createTempDirectory("q117a").toString
    val edit = java.nio.file.Files.createTempDirectory("q117b").toString
    val docs = (1L to 200L).map(i => (i, s"doc number $i payload"))
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$base/documents.parquet")
    // same corpus, one doc's content silently altered (counts unchanged)
    docs.map { case (i, t) => (i, if (i == 7L) t + "!" else t) }.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$edit/documents.parquet")
    val (a, b) = (manifest(base), manifest(edit))
    assert(a.keySet == b.keySet)
    val hit = graft.functions.Mix64.hash(7L) % 16
    a.keySet.foreach { sh =>
      val (na, nb) = (a(sh), b(sh))
      assert(na._1 == nb._1, s"shard $sh doc count")
      if (sh == hit) assert(na._3 != nb._3, s"shard $sh checksum must catch the edit")
      else assert(na == nb, s"shard $sh must be untouched")
    }
  }
}
