package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, struct, xxhash64}

/** Benchmark main (driver contract): times every registered query at the
  * given scale-factor dir and prints ONE JSON line. A generic warmup action
  * runs first so JVM/session/codegen initialization isn't charged to
  * whichever query happens to run first.
  *
  * Timing forces FULL materialization: a bare `count()` lets Catalyst prune
  * every unreferenced column, so projection-only queries would measure little
  * more than the Parquet scan. Instead each query is reduced to
  * `bit_xor(xxhash64(struct(*)))` — every output column of every row is
  * computed, hashed and aggregated (xor: overflow-free under ANSI mode),
  * while the shuffle back to the driver stays one row.
  *
  * Each query runs SPARK_GRAFT_BENCH_REPS times (default 3) and reports the
  * per-query MEDIAN — single runs on this host vary ±20–30% (BASELINE.md),
  * so a one-shot total can't distinguish a real 1.3× regression from noise.
  */
object Bench {

  /** Evaluate every column of every row of `df` (collapsing to one row). */
  def materialize(df: DataFrame): Unit = {
    val h = xxhash64(struct(df.columns.map(col): _*))
    df.select(h.as("h")).agg(expr("bit_xor(h)")).collect()
    ()
  }
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect() // JVM/codegen warmup
    // initialize the parquet datasource path (reader classloading, footer
    // codecs) on the 5-row region table so one-time init isn't charged to
    // whichever query happens to scan parquet first — data stays cold
    try spark.read.parquet(s"$sfDir/region.parquet").count()
    catch { case _: Exception => () }
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { materialize(fn(spark, sfDir)); true }
          catch { case e: Exception =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            false
          }
        // a failed query reports -1, never a plausible-looking elapsed time
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }
      // median of the successful reps; -1 only if every rep failed
      val good = times.filter(_ >= 0.0).sorted
      name -> (if (good.isEmpty) -1.0 else good(good.length / 2))
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
