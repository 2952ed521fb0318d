package graft.tools

import org.apache.spark.sql.SparkSession

/** Builder-side planning-cost probe (optimization r17): constructs a named
  * registry query N times and times `df.queryExecution.executedPlan` —
  * pure driver-side analysis/optimization/physical-planning cost, no job
  * runs. Separates "the plan is expensive to MAKE" from "the plan is
  * expensive to RUN" (guide §7.3: very large expression trees make
  * planning itself the bottleneck).
  * Usage: PlanTime <sfDir> <q1,q2,...> [reps] */
object PlanTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).map(_.split(",").toSeq).getOrElse(Seq.empty)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-plantime")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // one throwaway plan to absorb first-touch rule/codegen classloading
    spark.range(10).selectExpr("sum(id)").queryExecution.executedPlan
    for (name <- names; r <- 1 to reps) {
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan
      val t2 = System.nanoTime()
      println(f"plantime query=$name rep=$r construct=${(t1 - t0) / 1e3}%.0fus " +
        f"plan=${(t2 - t1) / 1e3}%.0fus")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
