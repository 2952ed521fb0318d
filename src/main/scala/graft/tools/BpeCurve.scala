package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Builder-side measurement of BPE training's round-cost curve (judge r13
  * Next #6; depth extension judge r14 Next #4): prints seconds per depth —
  * the evidence behind train()'s documented linear cost model
  * (BASELINE.md records the numbers). Two modes:
  *
  *   - default: trains at increasing merge counts over the
  *     SPARK_GRAFT_SF_DIR corpus (bounded by that corpus's vocabulary —
  *     sf0.1 exhausts at 89 merges, which is why the depth mode exists);
  *   - `deep`: trains to 1024 rounds over a SYNTHETIC 3·10^4-unique-word
  *     Zipf-weighted table (deterministic xxhash64 letters, lengths 6–18,
  *     cnt = N/(rank+1)), measuring the MARGINAL sec/round between
  *     cumulative depths 64→128→256→512→1024. Done-bar from the judge:
  *     marginal cost flat (±20%) from 256→1024 — evidence the bounded-
  *     lineage fix holds at depth, not just at q211's 64 rounds.
  *
  * Not part of the driver contract. */
object BpeCurve {

  /** Deterministic synthetic word table: `n` ids → pseudo-random [a-z]
    * words (xxhash64-seeded letters, so the table is identical on every
    * run), Zipf-ish counts; collisions merge via the groupBy, so the
    * unique-word count lands within a hair of `n`. */
  def syntheticWords(spark: SparkSession, n: Int): DataFrame =
    spark.range(n.toLong).toDF("id")
      .withColumn("len", (col("id") % 13 + 6).cast("int"))
      .withColumn("word", expr(
        "array_join(transform(sequence(1, len), " +
          "j -> char(97 + pmod(xxhash64(id, j), 26))), '')"))
      .groupBy("word")
      .agg(sum(expr("greatest(1L, 30000L div (id + 1))")).as("cnt"))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.contains("deep")) {
      val words = syntheticWords(spark, 30000)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"synthetic word table rows: ${words.count()}")
      graft.text.Bpe.train(words, 2) // JVM/codegen warm
      var prev = (0, 0.0) // (rounds, sec) of the previous cumulative run
      for (rounds <- Seq(64, 128, 256, 512, 1024)) {
        val t0 = System.nanoTime()
        val m = graft.text.Bpe.train(words, rounds)
        val sec = (System.nanoTime() - t0) / 1e9
        val marginal = (sec - prev._2) / (rounds - prev._1).max(1)
        println(f"rounds=$rounds%4d merges=${m.length}%4d sec=$sec%8.2f " +
          f"sec_per_round=${sec / m.length.max(1)}%.3f " +
          f"marginal_sec_per_round=$marginal%.3f")
        prev = (rounds, sec)
      }
    } else {
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
    }
    spark.stop()
  }
}
