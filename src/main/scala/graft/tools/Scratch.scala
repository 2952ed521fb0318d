package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc drive/profiling scratchpad (not part of the engine surface).
  * Current drive: dump one registered query's result to parquet for a
  * direct DuckDB-oracle comparison. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q48_minhash_portable")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val out = args.lift(2).getOrElse(s"/tmp/scratch_q")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-scratch")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.coalesce(1).write.mode("overwrite").parquet(out)
    println(s"$name rows=${spark.read.parquet(out).count()}")
    spark.stop()
  }
}
