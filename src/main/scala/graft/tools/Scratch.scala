package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc drive/profiling scratchpad (not part of the engine surface).
  * Current drive: bench-style timing (fn construction + full materialize)
  * of named queries — RunOne times only the count of an already-built df,
  * which misses work done inside the query function (e.g. the streaming
  * replays). Usage: Scratch <sfDir> <q1,q2,...> [reps] */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).map(_.split(",").toSeq)
      .getOrElse(Seq("q92_stream_sessionize", "q94_stream_kmv"))
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-scratch")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    for (name <- names; r <- 1 to reps) {
      val t0 = System.nanoTime()
      graft.Bench.materialize(graft.SparkEntry.queries(name)(spark, sfDir))
      println(f"[scratch] $name rep=$r ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
