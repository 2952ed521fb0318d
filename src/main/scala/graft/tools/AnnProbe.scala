package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.similarity.Ann

/** Builder-side measurement tool: recall@10 of the sampled vs trained IVF
  * coarse quantizer at an operating point, against brute-force truth — the
  * numbers that back q192's guarantee booleans and its scaladoc table.
  *
  * Usage: runMain graft.tools.AnnProbe <sfDir> [nCentroids] [nProbe] [iters]
  */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val nCent = args.lift(1).map(_.toInt).getOrElse(16)
    val nProbe = args.lift(2).map(_.toInt).getOrElse(4)
    val iters = args.lift(3).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = emb.where(col("vec_id") < 20)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val bf = pairs(Ann.bruteForceTopK(q, emb, "vec_id", "embedding", 10))
    val sampled = pairs(Ann.ivfTopK(q, emb, "vec_id", "embedding", 10, nCent, nProbe))
    val trained = pairs(Ann.ivfTopK(q, emb, "vec_id", "embedding", 10, nCent, nProbe,
      trainIters = iters))
    println(f"sf=$sfDir cells=$nCent probes=$nProbe iters=$iters " +
      f"n_true=${bf.size} sampled=${(bf & sampled).size} " +
      f"(${(bf & sampled).size.toDouble / bf.size}%.3f) " +
      f"trained=${(bf & trained).size} " +
      f"(${(bf & trained).size.toDouble / bf.size}%.3f)")
    spark.stop()
  }
}
