package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Ad-hoc profiling scratchpad (not part of the engine surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val sh = docs.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
      .where(size(col("sh")) > 0)
    timed("shingles only")(sh.select(sum(size(col("sh")))).collect())
    val sigs = sh.select(col("doc_id"), Dedup.minhashSignature(col("sh"), 32).as("sig")).cache()
    timed("signatures (32)")(sigs.select(sum(size(col("sig")))).collect())
    val buckets = Dedup.lshBuckets(sigs, col("doc_id"), col("sig"), 8, 4)
    timed("buckets")(buckets.count())
    timed("bucket histogram")(
      buckets.groupBy("band", "bucket").count()
        .groupBy("count").agg(count(lit(1)).as("n_buckets"))
        .orderBy(desc("count")).show(10))
    val cands = Dedup.lshCandidatePairs(buckets)
    timed("candidate pairs")(println("pairs=" + cands.count()))
    spark.stop()
  }
}
