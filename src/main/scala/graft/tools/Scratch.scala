package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc drive/profiling scratchpad (not part of the engine surface).
  * Current drive: the SparkSessionExtensions SQL path. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ext-drive")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sql(
      """SELECT base26(703L) AS l, rolling_hash64('x') AS rh,
        |  sorted_jaccard(ngram_hashes(array('a','b','c'), 2),
        |                 ngram_hashes(array('a','b','x'), 2)) AS j
        |""".stripMargin).show(truncate = false)
    println("DESCRIBE: " + spark.sql("DESCRIBE FUNCTION base26").collect().mkString("; "))
    spark.stop()
  }
}
