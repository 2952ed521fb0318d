package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc drive/profiling scratchpad (not part of the engine surface).
  * Current drive: hostile-header multimodal assets through the decode
  * pipeline (poison-safety check). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/vfy/poison")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-poison-drive")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val assets = graft.multimodal.Multimodal.readAssetDir(spark, dir, glob = "*.grft")
    println(s"assets_listed=${assets.count()}")
    val frames = graft.multimodal.Multimodal.decodeFrames(assets)
    println(s"frames_decoded=${frames.count()}")
    spark.stop()
  }
}
