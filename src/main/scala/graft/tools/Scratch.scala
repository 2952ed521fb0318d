package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc drive/profiling scratchpad (not part of the engine surface).
  * Current drive: stage-by-stage timing of q70's multimodal pipeline to
  * localize the r6 bench regression. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-scratch")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.multimodal.Multimodal

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    for (round <- 1 to 3) {
      println(s"--- round $round ---")
      val assets = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id")).as[Long]
        .map { id =>
          val nFrames = (id % 3 + 1).toInt
          val frames = Array.tabulate(nFrames) { f =>
            Array.tabulate(3 * 16 * 16)(i =>
              graft.queries.MultimodalQueries.payloadByte(id, f, i))
          }
          (s"asset_$id", id,
            Multimodal.FakeCodec.encode(if (nFrames > 1) 1 else 0, 3, 16, 16, frames))
        }
        .toDF("asset_id", "doc_id", "content")
      time("assets synth count")(assets.count())
      val frames = Multimodal.decodeFrames(assets)
      time("decode count")(frames.count())
      val sampled = Multimodal.sampleFrames(frames, stride = 2)
      val feats = Multimodal.extractFeatures(sampled, thumb = 4)
      time("features count (no sort)")(feats.count())
      val full = graft.SparkEntry.queries("q70_multimodal_features")(spark, sfDir)
      time("full q70 count")(full.count())
    }
    spark.stop()
  }
}
