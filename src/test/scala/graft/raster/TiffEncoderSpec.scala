package graft.raster

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** O3 write-back: encode → decode must be pixel-exact (including NaN/±inf
  * payloads and nodata sentinels), and re-encoding a decoded golden fixture
  * must reproduce its grid (decoder-envelope idempotence). */
class TiffEncoderSpec extends SparkSpec {

  private val res = "src/main/resources/tiff"

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

  test("BigTIFF: encodeBig → decode round-trips pixel-exact; classic and " +
      "BigTIFF encodings of one grid decode identically; hostile variants " +
      "reject loudly") {
    val px = Array.tabulate(9 * 13)(i => (i * 0.61f) - 7.25f)
    px(5) = Float.NaN; px(17) = -9999.0f
    val bigBytes = TiffEncoder.encodeBig(9, 13, px)
    // header really is BigTIFF: magic 43, offset size 8
    assert(bigBytes(2) == 43.toByte && bigBytes(3) == 0.toByte)
    val Right(tb) = TiffDecoder.decode(bigBytes)
    assert((tb.h, tb.w) == (9, 13))
    assert(tb.pixels.map(java.lang.Float.floatToRawIntBits).toSeq ==
      px.map(java.lang.Float.floatToRawIntBits).toSeq)
    // the two containers are different bytes, the same raster (raw bits:
    // NaN != NaN under ==)
    val Right(tc) = TiffDecoder.decode(TiffEncoder.encode(9, 13, px))
    assert(tb.pixels.map(java.lang.Float.floatToRawIntBits).toSeq ==
      tc.pixels.map(java.lang.Float.floatToRawIntBits).toSeq)
    // hostile: truncated mid-IFD and mid-strip must fail, not mis-place
    assert(TiffDecoder.decode(bigBytes.take(40)).isLeft)
    assert(TiffDecoder.decode(bigBytes.dropRight(8)).isLeft)
    // hostile: bad offset size (BigTIFF requires 8)
    val badHdr = bigBytes.clone(); badHdr(4) = 4.toByte
    assert(TiffDecoder.decode(badHdr) ==
      Left("bad BigTIFF header (offset size != 8)"))
    // a LONG8 entry type inside a CLASSIC file is rejected (type gate):
    // classic IFD at 8, entry 5 (tag 273 strip offsets) at 8+2+5*12 = 70,
    // its type field at 72 — flipping LONG→LONG8 must drop the entry and
    // fail as missing, never read an 8-byte value slot that isn't there
    val classic = TiffEncoder.encode(9, 13, px)
    assert(TiffDecoder.decode(classic).isRight) // sanity before mutation
    val classicL8 = classic.clone()
    classicL8(72) = 16.toByte; classicL8(73) = 0.toByte
    // the entry drops to empty → zero strips place zero pixels → loud Left
    // (the exact message is the coverage check's, not the type gate's)
    assert(TiffDecoder.decode(classicL8).isLeft)
    // hostile LONG8 WRAP: strip offset (1<<32)|16 would .toInt to 16 —
    // inside the buffer — and misplace pixels; must reject on the Long
    val wrapOff = bigBytes.clone()
    val wb = java.nio.ByteBuffer.wrap(wrapOff).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    wb.putLong(24 + 5 * 20 + 12, (1L << 32) | 16L) // entry 5 = tag 273
    val wrapRes = TiffDecoder.decode(wrapOff)
    assert(wrapRes.isLeft && wrapRes.swap.exists(_.contains("outside the buffer")),
      wrapRes.toString)
    // hostile LONG8 wrap of WIDTH ((1<<32)|13 → 13 under .toInt): the
    // safeInt gate must turn it into a missing-dimension reject
    val wrapW = bigBytes.clone()
    val wwb = java.nio.ByteBuffer.wrap(wrapW).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    wwb.putShort(24 + 2, 16.toShort) // entry 0 = tag 256: type LONG→LONG8
    wwb.putLong(24 + 12, (1L << 32) | 13L)
    assert(TiffDecoder.decode(wrapW) == Left("missing dimensions"))
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
    val out = tempDir("tiff_out").toString
    val rows = Seq(
      TiffDecoder.BandFile("/x/a_B02.tif", "B02", 4, 3, Array.tabulate(12)(_.toFloat)),
      TiffDecoder.BandFile("/x/b_B03.tif", "B03", 2, 5, Array.tabulate(10)(i => i * 2.0f)))
    TiffEncoder.writeTiffDir(rows.toDS(), out)
    val back = TiffDecoder.readTiffDir(spark, s"$out/B02", Seq("B02")).collect()
    assert(back.length == 1)
    assert(back.head.h == 4 && back.head.w == 3)
    assert(back.head.pixels.toSeq == (0 until 12).map(_.toFloat))
  }

  test("int16 write-back: whole-number grid round-trips as int16") {
    // dtype copy (ref fct_data_extraction.py:17-20): an int16 source decodes
    // to whole-number floats; writing it back as I16 must round-trip exactly
    // including negatives, and the re-read file must carry 16-bit samples
    val px = Array.tabulate(5 * 6)(i => (i * 1103 % 65536 - 32768).toFloat)
    val bytes = TiffEncoder.encode(5, 6, px, GeoMeta.empty, TiffEncoder.I16)
    val Right(t) = TiffDecoder.decode(bytes)
    assert((t.h, t.w) == (5, 6))
    assert(t.pixels.toSeq == px.toSeq)
    // bits/sample tag really is 16: the strip is half the float32 form's
    assert(bytes.length ==
      TiffEncoder.encode(5, 6, px.map(_ => 0.0f)).length - 5 * 6 * 2)
  }

  test("uint16 write-back round-trips, 16-bit fixture re-encodes exactly") {
    val src = Files.readAllBytes(Paths.get(res, "scene_B03.be16.tif"))
    val Right(t0) = TiffDecoder.decode(src) // 0..25000 gradient
    val Right(t1) = TiffDecoder.decode(
      TiffEncoder.encode(t0.h, t0.w, t0.pixels, GeoMeta.empty, TiffEncoder.U16))
    assert(t1.pixels.toSeq == t0.pixels.toSeq)
  }

  test("int16 write-back refuses lossy grids loudly") {
    for (bad <- Seq(0.5f, 40000.0f, -40000.0f, Float.NaN)) {
      val px = Array(1.0f, bad, 3.0f, 4.0f)
      assertThrows[IllegalArgumentException] {
        TiffEncoder.encode(2, 2, px, GeoMeta.empty, TiffEncoder.I16)
      }
    }
    assertThrows[IllegalArgumentException] { // negative under unsigned
      TiffEncoder.encode(1, 2, Array(-1.0f, 2.0f), GeoMeta.empty, TiffEncoder.U16)
    }
  }

  test("geo meta: fixture tags decode verbatim and survive the round-trip") {
    val bytes = Files.readAllBytes(Paths.get(res, "scene_geo.f32.tif"))
    val Right((t0, m0)) = TiffDecoder.decodeWithMeta(bytes)
    // the generator's constants: UTM 32N, 10 m pixels, S2-style tile origin
    assert(m0.pixelScale.toSeq == Seq(10.0, 10.0, 0.0))
    assert(m0.tiepoints.toSeq == Seq(0.0, 0.0, 0.0, 600000.0, 5090220.0, 0.0))
    assert(m0.geoKeys.toSeq == Seq(1, 1, 0, 3, 1024, 0, 1, 1,
      1025, 0, 1, 1, 3072, 0, 1, 32632))
    assert(m0.geoAscii == "WGS 84 / UTM zone 32N|")
    assert(m0.transform.isEmpty && m0.geoDoubles.isEmpty)
    // re-encode WITH the meta: pixels exact, meta verbatim — array2raster's
    // profile copy (reference data_pair/fct_data_extraction.py:15-20)
    val Right((t1, m1)) =
      TiffDecoder.decodeWithMeta(TiffEncoder.encode(t0.h, t0.w, t0.pixels, m0))
    assert((t1.h, t1.w) == (t0.h, t0.w))
    assert(t1.pixels.toSeq == t0.pixels.toSeq)
    assert(m1.sameAs(m0), s"meta drifted: $m1 vs $m0")
    // the pixel grid matches the untagged sibling fixture (same generator
    // values), so geo tags change metadata only, never placement
    val Right(plain) =
      TiffDecoder.decode(Files.readAllBytes(Paths.get(res, "scene_B04.f32.tif")))
    assert(t0.pixels.toSeq == plain.pixels.toSeq)
  }

  test("geo meta: empty meta keeps the pixel-only byte layout (golden stability)") {
    val px = Array.tabulate(6)(_.toFloat)
    assert(TiffEncoder.encode(2, 3, px).toSeq ==
      TiffEncoder.encode(2, 3, px, GeoMeta.empty).toSeq)
  }

  test("geo meta: carried through the distributed read → write path") {
    val out = tempDir("tiff_geo_out").toString
    // stage the geo fixture under a band-matched name, read it
    // distributed, write it back distributed, decode the written file
    val staged = tempDir("tiff_geo_in")
    Files.copy(Paths.get(res, "scene_geo.f32.tif"), staged.resolve("x_B04.geo.tif"))
    val rows = TiffDecoder.readTiffDir(spark, staged.toString, Seq("B04"), glob = "*")
    TiffEncoder.writeTiffDir(rows, out)
    val written = Files.readAllBytes(Paths.get(out, "B04", "x_B04.geo.tif"))
    val Right((t, m)) = TiffDecoder.decodeWithMeta(written)
    assert(m.pixelScale.toSeq == Seq(10.0, 10.0, 0.0))
    assert(m.geoKeys.toSeq.takeRight(4) == Seq(3072, 0, 1, 32632))
    assert(m.geoAscii == "WGS 84 / UTM zone 32N|")
    assert((t.h, t.w) == (6, 5))
  }
}
