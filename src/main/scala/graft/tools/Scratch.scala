package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc drive/profiling scratchpad (not part of the engine surface).
  * Current drive: reproduce the q44 Verify-path failure (query + coalesced
  * parquet write, exactly as Verify does it). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-scratch")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val df = graft.SparkEntry.queries("q44_bucketed_join")(spark, sfDir)
      df.coalesce(1).write.mode("overwrite").parquet("/tmp/scratch_q44")
      println("q44 OK")
    } catch {
      case e: Throwable =>
        println(s"q44 FAILED: ${e.getClass.getName}: ${e.getMessage}")
        e.printStackTrace()
    }
    spark.stop()
  }
}
