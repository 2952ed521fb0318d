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

  test("q118 manifest apply: every statistic recombines; XOR retracts a doc exactly") {
    import org.apache.spark.sql.functions._
    // the driver-checked bit at sf0.001: base⊕delta lands on the full
    // manifest for every shard
    val ok = graft.SparkEntry.queries("q118_manifest_apply")(spark, sfDir)
      .agg(min(col("incremental_ok"))).head().getBoolean(0)
    assert(ok, "base⊕delta must equal the directly-computed manifest")
    // XOR is its own inverse: manifest(corpus − doc) = manifest(corpus)
    // with the removed doc's fingerprint XORed back OUT — the retraction
    // path a GDPR delete or a recalled batch takes, no corpus re-read
    val dir = tempDir("q118r").toString
    val docs = (1L to 100L).map(i => (i, s"retract test doc $i"))
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val dropDir = tempDir("q118s").toString
    docs.filterNot(_._1 == 7L).toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dropDir/documents.parquet")
    val fp7 = Seq(docs(6)).toDF("doc_id", "text")
      .select(graft.text.TextAnalysis.contentFingerprint(col("text")))
      .head().getLong(0)
    val sh7 = graft.functions.Mix64.hash(7L) % 16
    val before = manifest(dir)(sh7)
    val after = manifest(dropDir)(sh7)
    assert(after._1 == before._1 - 1, "doc count decrements")
    assert(after._3 == (before._3 ^ fp7), "checksum retracts via XOR")
  }

  test("q117 manifest: single-doc corruption flips exactly that shard's checksum") {
    val base = tempDir("q117a").toString
    val edit = tempDir("q117b").toString
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
