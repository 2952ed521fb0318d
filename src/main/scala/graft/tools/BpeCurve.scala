package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Builder-side measurement of BPE training's round-cost curve (judge r13
  * Next #6): trains at increasing merge counts over the SPARK_GRAFT_SF_DIR
  * corpus and prints seconds per depth — the evidence behind train()'s
  * documented linear cost model and its 256-round practical ceiling
  * (BASELINE.md records the numbers). Not part of the driver contract. */
object BpeCurve {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val words = graft.text.Bpe.wordTable(docs, col("text"))
    println(s"word table rows: ${words.count()}")
    // warm one tiny run so JVM/codegen ramp isn't charged to the curve
    graft.text.Bpe.train(words, 2)
    for (rounds <- Seq(8, 16, 32, 64, 128, 256)) {
      val t0 = System.nanoTime()
      val m = graft.text.Bpe.train(words, rounds)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"rounds=$rounds%3d merges=${m.length}%3d " +
        f"sec=$sec%7.2f sec_per_round=${sec / m.length.max(1)}%.3f")
    }
    spark.stop()
  }
}
