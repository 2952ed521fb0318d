package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc registry-query inspector (not part of the engine surface):
  * materializes named SparkEntry queries and prints their rows — the
  * builder-side loop for eyeballing a new query's output at any SF before
  * wiring its oracle. Usage: ShowQuery <sfDir> <q1,q2,...> [maxRows] */
object ShowQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.lift(1).map(_.split(",").toSeq).getOrElse(Seq.empty)
    val maxRows = args.lift(2).map(_.toInt).getOrElse(50)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-show")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- names) {
      println(s"== $name @ $sfDir")
      graft.SparkEntry.queries(name)(spark, sfDir).show(maxRows, false)
    }
    spark.stop()
  }
}
