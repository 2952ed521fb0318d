package graft.raster

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.tiling.TileJobs

/** E2/E3 end-to-end over REAL TIFF bytes: band grids are encoded with
  * TiffEncoder to .tif files on disk, ingested through the binaryFile
  * source + TiffDecoder, stacked in beta band order, assembled into pair
  * rows and tiled — the full reference dataflow (raster read → stack →
  * crop → quality filter) with no fixture shortcuts. */
class TiffPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("TIFF files → ingest → stack → pair → tiles") {
    val hrH = 30; val hrW = 30; val lrH = 10; val lrW = 10
    def grid(n: Int, seed: Int): Array[Float] =
      Array.tabulate(n)(i => ((i * 31 + seed * 7) % 997 + 1).toFloat)

    val dir = tempDir("tiffpipe")
    val hrDir = Files.createDirectory(dir.resolve("s2"))
    val lrDir = Files.createDirectory(dir.resolve("hls"))
    Bands.SentinelBands.zipWithIndex.foreach { case (b, i) =>
      Files.write(hrDir.resolve(s"scene1_${b}.tif"),
        TiffEncoder.encode(hrH, hrW, grid(hrH * hrW, i)))
    }
    Bands.LandsatBands.zipWithIndex.foreach { case (b, i) =>
      Files.write(lrDir.resolve(s"scene1_${b}.tif"),
        TiffEncoder.encode(lrH, lrW, grid(lrH * lrW, 100 + i)))
    }

    val hrBands = TiffDecoder.readTiffDir(spark, hrDir.toString, Bands.SentinelBands, glob = "*.tif")
      .toDF().select(lit("scene1").as("image_id"), col("band"), col("h"), col("w"), col("pixels"))
    val lrBands = TiffDecoder.readTiffDir(spark, lrDir.toString, Bands.LandsatBands, glob = "*.tif")
      .toDF().select(lit("scene1").as("image_id"), col("band"), col("h"), col("w"), col("pixels"))
    val hr = Bands.stack(hrBands, Bands.SentinelBands, "S2")
      .withColumn("image_id", concat(col("image_id"), lit("_hr")))
    val lr = Bands.stack(lrBands, Bands.LandsatBands, "L8")
      .withColumn("image_id", concat(col("image_id"), lit("_lr")))
    assert(hr.count() == 1 && lr.count() == 1)

    // centerline mask: rows 13..17 fully hit (D5 row, HR resolution)
    val mask = Seq(("m1", hrH, hrW,
      Array.tabulate(hrH * hrW)(i => if (i / hrW >= 13 && i / hrW <= 17) 1.0f else 0.0f)))
      .toDF("mask_id", "h", "w", "pixels")
    val pairTable = Seq(("p1", "scene1_hr", "scene1_lr", "m1"))
      .toDF("pair_id", "hr_image_id", "lr_image_id", "mask_id")
    val pairs = TileJobs.assemblePairs(spark, pairTable, hr.unionByName(lr), mask)
    val tiles = TileJobs.tilePairs(pairs, TileJobs.Config(batch = 6, scale = 3)).collect()

    assert(tiles.nonEmpty, "dense centerline must yield accepted tiles")
    tiles.foreach { t =>
      assert(t.hr.length == 4 * 6 * 6 && t.lr.length == 4 * 2 * 2)
      assert(t.hr.forall(v => v >= 1.0f && v <= 997.0f)) // decoded, not garbage
    }

    // …and finish at the reference's ACTUAL artifact: torch.save's
    // TensorDataset(train, target) (main_code.py:75–78), validated through
    // the stub-torch unpickler — scenes → tiles → .pth, the complete
    // migration loop a reference user runs
    val pth = dir.resolve("dataset.pth").toString
    val n = graft.tiling.TorchExport.writeTileDatasetPth(
      tiles.toSeq.toDS(), pth, nBands = 4)
    assert(n == tiles.length.toLong)
    val ordered = tiles.sortBy(t => (t.pair_id, t.tile_id))
    def md5LE(a: Array[Float]): String = {
      val bb = java.nio.ByteBuffer.allocate(a.length * 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      a.foreach(bb.putFloat)
      java.security.MessageDigest.getInstance("MD5").digest(bb.array())
        .map("%02x".format(_)).mkString
    }
    val expected = dir.resolve("expected.json")
    Files.writeString(expected,
      s"""{"tensors": [
         |  {"shape": [$n, 4, 2, 2], "md5": "${md5LE(ordered.flatMap(_.lr).toArray)}"},
         |  {"shape": [$n, 4, 6, 6], "md5": "${md5LE(ordered.flatMap(_.hr).toArray)}"}]}""".stripMargin)
    import scala.sys.process._
    assert(Seq("python3", "scripts/check_pth.py", pth, expected.toString).! == 0,
      "stub-torch checker rejected the pipeline's .pth")
  }
}
