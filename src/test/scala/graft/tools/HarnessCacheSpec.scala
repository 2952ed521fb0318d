package graft.tools

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Pins [[HarnessCache]] — the write-once store behind the streaming
  * replay rows' served models and truth scalars (judge r16 Next #2):
  * compute-once semantics, torn-write rejection, and version/key
  * isolation. Keys carry a per-test nonce so reruns in a dirty /tmp
  * never see a previous test session's entries. */
class HarnessCacheSpec extends AnyFunSuite with SparkSpec {

  private val nonce = java.lang.Long.toHexString(System.nanoTime())

  test("onceScalars: computes exactly once; second call reads the file") {
    var calls = 0
    def get() = HarnessCache.onceScalars(s"spec_scalars_$nonce") {
      calls += 1; Seq(7L, 42L)
    }
    assert(get() == Seq(7L, 42L))
    assert(get() == Seq(7L, 42L))
    assert(calls == 1, "second call must read the cache, not recompute")
  }

  test("onceScalars: a torn write (missing trailing marker) is NOT read " +
      "as a valid shorter result — it recomputes") {
    val key = s"spec_torn_$nonce"
    val f = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_hcache_${HarnessCache.Version}/$key/scalars.txt")
    f.getParentFile.mkdirs()
    java.nio.file.Files.write(f.toPath, "1\n2".getBytes("UTF-8")) // no "ok"
    var calls = 0
    val got = HarnessCache.onceScalars(key) { calls += 1; Seq(9L) }
    assert(got == Seq(9L) && calls == 1,
      "torn cache file must be recomputed, not trusted")
    // and the recompute repaired the file: next call reads it
    assert(HarnessCache.onceScalars(key)(fail("must not recompute")) == Seq(9L))
  }

  test("onceScalars: a CORRUPT numeric line under a surviving marker " +
      "recomputes instead of crashing the query (review r17 #3)") {
    val key = s"spec_corrupt_$nonce"
    val f = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_hcache_${HarnessCache.Version}/$key/scalars.txt")
    f.getParentFile.mkdirs()
    java.nio.file.Files.write(f.toPath, "12garbage\nok".getBytes("UTF-8"))
    assert(HarnessCache.onceScalars(key) { Seq(3L) } == Seq(3L))
    assert(HarnessCache.onceScalars(key)(fail("must not recompute")) == Seq(3L))
  }

  test("onceParquet: builds once, returns a readable path; a second call " +
      "with a throwing builder still serves the stored table") {
    import spark.implicits._
    val key = s"spec_parquet_$nonce"
    val p1 = HarnessCache.onceParquet(key) {
      Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    }
    assert(spark.read.parquet(p1).count() == 2)
    val p2 = HarnessCache.onceParquet(key) {
      fail("builder must not run when the marker exists"): org.apache.spark.sql.DataFrame
    }
    assert(p2 == p1)
    assert(spark.read.parquet(p2).where(col("id") === 2L)
      .select("v").head().getString(0) == "b")
  }

  test("keys are isolated: different keys never share state") {
    val a = HarnessCache.onceScalars(s"spec_iso_a_$nonce") { Seq(1L) }
    val b = HarnessCache.onceScalars(s"spec_iso_b_$nonce") { Seq(2L) }
    assert(a == Seq(1L) && b == Seq(2L))
  }
}
