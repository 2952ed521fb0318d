package graft.raster

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** O3 write-back: encode → decode must be pixel-exact (including NaN/±inf
  * payloads and nodata sentinels), and re-encoding a decoded golden fixture
  * must reproduce its grid (decoder-envelope idempotence). */
class TiffEncoderSpec extends SparkSpec {

  private val res = "src/test/resources/tiff"

  test("encode → decode round-trips pixel-exact") {
    val px = Array.tabulate(7 * 11)(i => (i * 0.37f) - 3.5f)
    px(3) = Float.NaN; px(10) = Float.PositiveInfinity
    px(20) = Float.NegativeInfinity; px(30) = -9999.0f
    val Right(t) = TiffDecoder.decode(TiffEncoder.encode(7, 11, px))
    assert((t.h, t.w) == (7, 11))
    // compare raw bits so NaN round-trip is checked too
    assert(t.pixels.map(java.lang.Float.floatToRawIntBits).toSeq ==
      px.map(java.lang.Float.floatToRawIntBits).toSeq)
  }

  test("golden fixture → decode → encode → decode is stable") {
    val bytes = Files.readAllBytes(Paths.get(res, "scene_B04.f32.tif"))
    val Right(t0) = TiffDecoder.decode(bytes)
    val Right(t1) = TiffDecoder.decode(TiffEncoder.encode(t0.h, t0.w, t0.pixels))
    assert((t1.h, t1.w) == (t0.h, t0.w))
    assert(t1.pixels.toSeq == t0.pixels.toSeq)
  }

  test("distributed sink writes decoder-readable files") {
    import spark.implicits._
    val out = Files.createTempDirectory("tiff_out").toString
    val rows = Seq(
      TiffDecoder.BandFile("/x/a_B02.tif", "B02", 4, 3, Array.tabulate(12)(_.toFloat)),
      TiffDecoder.BandFile("/x/b_B03.tif", "B03", 2, 5, Array.tabulate(10)(i => i * 2.0f)))
    TiffEncoder.writeTiffDir(rows.toDS(), out)
    val back = TiffDecoder.readTiffDir(spark, s"$out/B02", Seq("B02")).collect()
    assert(back.length == 1)
    assert(back.head.h == 4 && back.head.w == 3)
    assert(back.head.pixels.toSeq == (0 until 12).map(_.toFloat))
  }
}
