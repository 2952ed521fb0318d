package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc executed-plan inspector (not part of the engine surface): prints
  * the formatted executed plan of named registry queries — the builder-side
  * loop for iterating a plan shape before pinning it in PlanSpec.
  * Usage: PlanDump <sfDir> <q1,q2,...> [--out=<dir> [--suffix=<sfx>]]
  * With --out, each query's `.explain("formatted")` output is also written
  * to <dir>/<name><sfx>.txt (the plans/r17 before/after evidence files). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = args.lift(1).map(_.split(",").toSeq).getOrElse(Seq.empty)
    val outDir = args.find(_.startsWith("--out=")).map(_.stripPrefix("--out="))
    val suffix = args.find(_.startsWith("--suffix="))
      .map(_.stripPrefix("--suffix=")).getOrElse("")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- names) {
      println(s"== $name @ $sfDir")
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      println(df.queryExecution.executedPlan.toString)
      outDir.foreach { d =>
        new java.io.File(d).mkdirs()
        java.nio.file.Files.write(
          java.nio.file.Paths.get(d, s"$name$suffix.txt"),
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode).getBytes("UTF-8"))
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
