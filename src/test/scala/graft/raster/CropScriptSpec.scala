package graft.raster

import graft.SparkSpec

class CropScriptSpec extends SparkSpec {
  import spark.implicits._

  private val listing = Seq(
    ("acq1", "band_B02.tif"),
    ("acq1", "band_B02.tif.xml"),
    ("acq1", "band_B02.jp2"),
    ("acq2", "band_B03.tif")).toDF("acq_dir", "file_name")

  test("Landsat mode: tif-only, same output name") {
    val lines = CropScript.gdalwarpLines(listing, "/x/cut.gpkg", "/in/L8", "/out/L8",
      requireTif = true, appendTifSuffix = false).as[String].collect().sorted
    assert(lines.toSeq == Seq(
      "gdalwarp -cutline /x/cut.gpkg -crop_to_cutline /in/L8/acq1/band_B02.tif /out/L8/acq1/band_B02.tif",
      "gdalwarp -cutline /x/cut.gpkg -crop_to_cutline /in/L8/acq2/band_B03.tif /out/L8/acq2/band_B03.tif"))
  }

  test("Sentinel mode: all non-xml, .tif appended to output") {
    val lines = CropScript.gdalwarpLines(listing, "/x/cut.gpkg", "/in/S2", "/out/S2",
      requireTif = false, appendTifSuffix = true).as[String].collect().sorted
    assert(lines.length == 3) // jp2 kept, xml dropped
    assert(lines.contains(
      "gdalwarp -cutline /x/cut.gpkg -crop_to_cutline /in/S2/acq1/band_B02.jp2 /out/S2/acq1/band_B02.jp2.tif"))
  }
}
