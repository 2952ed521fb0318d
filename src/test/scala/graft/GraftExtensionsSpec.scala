package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SQL surface of the native expressions. Uses registerTemp on the shared
  * test session — `withExtensions` only applies to a NEW session, and under
  * a full suite run `getOrCreate` returns the shared extension-less one
  * (registerTemp exists exactly for that situation). */
class GraftExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = graft.SparkSpec.session
    GraftExtensions.registerTemp(s)
    s
  }

  test("custom functions callable from SQL") {
    spark.sparkContext.setLogLevel("WARN")
    val row = spark.sql(
      """SELECT
        |  base26(28L) AS letters,
        |  simhash64(array('a','b')) AS sh,
        |  rolling_hash64('hello') AS rh,
        |  size(minhash_ngrams(array('a','b','c','d'), 2, 16)) AS m,
        |  cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS cos,
        |  sorted_jaccard(ngram_hashes(array('a','b','c'), 2),
        |                 ngram_hashes(array('a','b','c'), 2)) AS jacc,
        |  hyperplane_sig(array(CAST(1.0 AS FLOAT), CAST(0.5 AS FLOAT)), 16, 42L) AS hp
        |""".stripMargin).collect()(0)
    assert(row.getAs[String]("letters") == "ab")
    assert(row.getAs[Long]("sh") != 0L)
    assert(row.getAs[Long]("rh") == graft.functions.RollingHash.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString("hello")))
    assert(row.getAs[Int]("m") == 16)
    assert(row.getAs[Double]("cos") == 1.0)
    assert(row.getAs[Double]("jacc") == 1.0)
    assert(row.getAs[Long]("hp") != 0L)
  }

  test("portable-family and sampling functions callable from SQL") {
    val row = spark.sql(
      """SELECT
        |  simhash64_portable(array('a','b')) AS shp,
        |  size(minhash_ngrams_portable(array('a','b','c','d'), 2, 16)) AS mp,
        |  size(winnow_fingerprints_portable('abcdefghij', 4, 2)) AS wp,
        |  sample_coord(42L) AS sc
        |""".stripMargin).collect()(0)
    assert(row.getAs[Long]("shp") ==
      graft.functions.PortableSimHash.ofArray(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          Array[Any](org.apache.spark.unsafe.types.UTF8String.fromString("a"),
            org.apache.spark.unsafe.types.UTF8String.fromString("b")))))
    assert(row.getAs[Int]("mp") == 16)
    assert(row.getAs[Int]("wp") > 0)
    assert(row.getAs[Long]("sc") == graft.functions.Mix64.hash(42L))
    assert(row.getAs[Long]("sc") >= 0L && row.getAs[Long]("sc") < 4294967296L)
  }

  test("SQL type errors are analysis-time and name the function") {
    val e = intercept[Exception](spark.sql("SELECT base26('not a number')").collect())
    assert(e.getMessage.toLowerCase.contains("base26") ||
      e.getMessage.contains("BIGINT"))
  }
}
