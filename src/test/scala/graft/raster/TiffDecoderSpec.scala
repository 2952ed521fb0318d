package graft.raster

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** TiffDecoder against hand-rolled baseline TIFF fixtures
  * (scripts/make_tiff_fixtures.py): both byte orders, 8/16-bit integer and
  * 32-bit float samples, multi-strip organization. The expected pixel grid
  * is the generator's formula: v(r,c) = (7r + 3c) mod 251 on 5×6.
  */
class TiffDecoderSpec extends SparkSpec {

  private val res = "src/main/resources/tiff"
  private val grad: Array[Float] =
    Array.tabulate(6 * 5)(i => ((i / 5 * 7 + i % 5 * 3) % 251).toFloat)

  private def decodeFile(f: String) =
    TiffDecoder.decode(Files.readAllBytes(Paths.get(res, f)))

  test("little-endian 8-bit") {
    val Right(t) = decodeFile("scene_B02.le8.tif")
    assert((t.h, t.w) == (6, 5))
    assert(t.pixels.toSeq == grad.toSeq)
  }

  test("big-endian 16-bit") {
    val Right(t) = decodeFile("scene_B03.be16.tif")
    assert(t.pixels.toSeq == grad.map(_ * 100).toSeq)
  }

  test("32-bit float samples") {
    val Right(t) = decodeFile("scene_B04.f32.tif")
    assert(t.pixels.toSeq == grad.map(_ / 4.0f).toSeq)
  }

  test("multi-strip organization") {
    val Right(t) = decodeFile("scene_B05.strips.tif")
    assert(t.pixels.toSeq == grad.toSeq)
  }

  test("deflate: single-strip 16-bit") {
    val Right(t) = decodeFile("deflate_one.tif")
    assert((t.h, t.w) == (6, 5))
    assert(t.pixels.toSeq == grad.map(_ * 100).toSeq)
  }

  test("deflate: multi-strip (each strip its own zlib stream)") {
    val Right(t) = decodeFile("deflate_strips.tif")
    assert(t.pixels.toSeq == grad.toSeq)
  }

  test("deflate: big-endian float samples") {
    val Right(t) = decodeFile("deflate_be_f32.tif")
    assert(t.pixels.toSeq == grad.map(_ / 4.0f).toSeq)
  }

  test("deflate: corrupt stream is dropped, not thrown") {
    val good = Files.readAllBytes(Paths.get(res, "deflate_one.tif"))
    // the strip starts at offset 8 (header) in the generator's layout —
    // wreck the zlib stream body
    val bad = good.clone()
    bad(12) = (bad(12) ^ 0x55).toByte
    bad(13) = (bad(13) ^ 0x55).toByte
    assert(TiffDecoder.decode(bad).isLeft)
  }

  test("deflate: a strip inflating past RowsPerStrip is rejected, not shifted") {
    // strip 0's stream decompresses to the WHOLE image (30 bytes vs the
    // declared 2 rows × 5 px); accepting it would write into strips 1-2's
    // pixel positions
    assert(decodeFile("deflate_overlong.tif") ==
      Left("deflate strip inflates past its declared size"))
  }

  test("lzw: single-strip 16-bit") {
    val Right(t) = decodeFile("lzw_one.tif")
    assert((t.h, t.w) == (6, 5))
    assert(t.pixels.toSeq == grad.map(_ * 100).toSeq)
  }

  test("lzw: multi-strip (each strip its own code stream)") {
    val Right(t) = decodeFile("lzw_strips.tif")
    assert(t.pixels.toSeq == grad.toSeq)
  }

  test("lzw: big-endian float samples") {
    val Right(t) = decodeFile("lzw_be_f32.tif")
    assert(t.pixels.toSeq == grad.map(_ / 4.0f).toSeq)
  }

  test("lzw: 48x48 low-repetition image crosses every code-width transition") {
    // dictionary growth passes 511, 1023 and 2047 — the 9→10→11→12-bit
    // early-change switches must stay in lockstep with the writer's
    val Right(t) = decodeFile("lzw_wide.tif")
    val expect = for (r <- 0 until 48; c <- 0 until 48)
      yield ((r * 31 + c * 17 + (r * c) % 7) % 251).toFloat
    assert((t.h, t.w) == (48, 48))
    assert(t.pixels.toSeq == expect)
  }

  test("lzw: a strip decoding past RowsPerStrip is rejected, not shifted") {
    assert(decodeFile("lzw_overlong.tif") ==
      Left("lzw strip decodes past its declared size"))
  }

  test("lzw: truncated stream is dropped, not thrown") {
    assert(decodeFile("lzw_corrupt.tif").isLeft)
  }

  test("jpeg: compression-7 strip with garbage bytes is rejected, not thrown") {
    // (fixture predates JPEG support: raw non-JPEG strip under tag 259=7 —
    // now a hostile-stream case rather than an unsupported-compression one)
    assert(decodeFile("jpeg_unsupported.tif") == Left("jpeg: missing SOI"))
  }

  // ---- JPEG-in-TIFF (Compression=7): expected_*.bin are the committed
  // byte-exact outputs of the fixture generator's decoder model, whose
  // float pipeline JpegDecoder mirrors exactly (pinned cosine basis)

  private def expectJpeg(name: String): Seq[Int] =
    Files.readAllBytes(Paths.get(res, s"expected_$name.bin")).toSeq.map(_ & 0xFF)

  private def decodedInts(f: String): Seq[Int] = {
    val Right(t) = decodeFile(f)
    assert((t.h, t.w) == (18, 21))
    t.pixels.toSeq.map(_.toInt)
  }

  test("jpeg: single strip, inline tables, standard quantization") {
    assert(decodedInts("jpeg_single.tif") == expectJpeg("jpeg_single"))
  }

  test("jpeg: flat quantization (near-lossless, large coefficients)") {
    assert(decodedInts("jpeg_flat.tif") == expectJpeg("jpeg_flat"))
  }

  test("jpeg: multi-strip, one complete stream per strip") {
    assert(decodedInts("jpeg_strips.tif") == expectJpeg("jpeg_strips"))
  }

  test("jpeg: shared tables via tag 347 (abbreviated strip streams)") {
    assert(decodedInts("jpeg_shared_tables.tif") == expectJpeg("jpeg_shared_tables"))
  }

  test("jpeg: restart markers (DRI=2) reset DC prediction") {
    assert(decodedInts("jpeg_restart.tif") == expectJpeg("jpeg_restart"))
  }

  test("jpeg: truncated scan is rejected, not thrown or spun") {
    assert(decodeFile("jpeg_truncated.tif").isLeft)
  }

  // ---- color (YCbCr) JPEG-in-TIFF: expected_*.bin are the R plane (what
  // TiffDecoder returns — band 1, rasterio read(1) parity) and
  // expected_*_rgb.bin the full interleaved model output

  private def expectRgb(name: String): Seq[Int] =
    Files.readAllBytes(Paths.get(res, s"expected_${name}_rgb.bin")).toSeq.map(_ & 0xFF)

  for (name <- Seq("jpeg_color444", "jpeg_color422", "jpeg_color420",
      "jpeg_color420_rst")) {
    test(s"$name: R plane through the TIFF path is model-exact") {
      assert(decodedInts(s"$name.tif") == expectJpeg(name))
    }
  }

  test("jpeg color: decodeAll yields the model's full RGB (all samplings)") {
    for (name <- Seq("jpeg_color444", "jpeg_color422", "jpeg_color420",
        "jpeg_color420_rst")) {
      val tif = Files.readAllBytes(Paths.get(res, s"$name.tif"))
      // the single-strip color fixtures place the JPEG stream at offset 8
      // with StripByteCounts = stream length; re-decode it standalone
      val Right((t, _)) = TiffDecoder.decodeWithMeta(tif): @unchecked
      assert((t.h, t.w) == (18, 21))
      val exp = expectRgb(name)
      // extract the stream via the committed .jpg (444) or by re-reading
      // the strip: offset 8, take until FFD9 inclusive scan from IFD info
      // — simpler: decodeAll on the raw strip bytes for the 444 fixture
      if (name == "jpeg_color444") {
        val jp = Files.readAllBytes(Paths.get(res, s"$name.jpg"))
        val Right((w, h, planes)) = JpegDecoder.decodeAll(jp): @unchecked
        assert((w, h) == (21, 18) && planes.length == 3)
        val got = (0 until w * h).flatMap(i =>
          Seq(planes(0)(i) & 0xFF, planes(1)(i) & 0xFF, planes(2)(i) & 0xFF))
        assert(got == exp)
      } else {
        // R plane must equal the RGB bin's R channel for every fixture
        val rOnly = exp.grouped(3).map(_.head).toSeq
        assert(decodedInts(s"$name.tif") == rOnly)
      }
    }
  }

  test("jpeg color: TILED 4:2:0 organization (full-size edge tiles, padding discarded)") {
    assert(decodedInts("jpeg_color_tiled.tif") == expectJpeg("jpeg_color_tiled"))
  }

  test("jpeg color 4:4:4 cross-validated against javax.imageio (independent decoder)") {
    // only the no-subsampling shape: javax/libjpeg uses fancy (bilinear)
    // chroma upsampling, which legitimately diverges from the model's
    // replication on subsampled fixtures; at 4:4:4 both decoders see the
    // same chroma samples, so agreement within the integer-IDCT band
    // (±2 per channel) is a real bitstream check
    val jp = Files.readAllBytes(Paths.get(res, "jpeg_color444.jpg"))
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jp))
    assert(img != null, "imageio could not decode the color fixture")
    val Right((w, h, planes)) = JpegDecoder.decodeAll(jp): @unchecked
    assert((img.getWidth, img.getHeight) == (w, h))
    var maxDelta = 0
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y)
      val deltas = Seq(
        math.abs(((rgb >> 16) & 0xFF) - (planes(0)(y * w + x) & 0xFF)),
        math.abs(((rgb >> 8) & 0xFF) - (planes(1)(y * w + x) & 0xFF)),
        math.abs((rgb & 0xFF) - (planes(2)(y * w + x) & 0xFF)))
      maxDelta = math.max(maxDelta, deltas.max)
    }
    assert(maxDelta <= 2, s"max per-channel delta $maxDelta vs imageio")
  }

  test("jpeg color: hostile sampling geometries are rejected, not thrown") {
    val jp = Files.readAllBytes(Paths.get(res, "jpeg_color444.jpg")).clone()
    // SOF0 luma sampling byte: find FFC0, comp-1 h/v at body+7 (see
    // parseStream); corrupt it to 3x1 (out of envelope)
    var i = 2
    var sof = -1
    while (sof < 0 && i + 1 < jp.length) {
      if ((jp(i) & 0xFF) == 0xFF && (jp(i + 1) & 0xFF) == 0xC0) sof = i
      i += 1
    }
    assert(sof > 0)
    jp(sof + 2 + 2 + 6 + 1) = 0x31.toByte // comp 1 hv := 3x1
    val r = JpegDecoder.decodeAll(jp)
    assert(r == Left("jpeg: unsupported sampling geometry"), r)
  }

  test("jpeg: tiled organization (full-size edge tiles, padding discarded)") {
    assert(decodedInts("jpeg_tiled.tif") == expectJpeg("jpeg_tiled"))
  }

  test("jpeg: band file reads through the distributed readTiffDir path") {
    val staged = tempDir("tiff_jpeg_in")
    Files.copy(Paths.get(res, "jpeg_single.tif"), staged.resolve("x_B04.jp.tif"))
    val rows = TiffDecoder.readTiffDir(spark, staged.toString, Seq("B04"), glob = "*").collect()
    assert(rows.length == 1)
    assert((rows.head.h, rows.head.w) == (18, 21))
    assert(rows.head.pixels.toSeq.map(_.toInt) == expectJpeg("jpeg_single"))
  }

  test("jpeg: fuzz sweep — random and mutated streams never throw or hang") {
    // the poison-safety contract: decode is TOTAL (Either, bounded time).
    // Seeded: failures are reproducible.
    val rng = new scala.util.Random(0xC0FFEE)
    val valid = Files.readAllBytes(Paths.get(res, "jpeg_single.jpg"))
    var lefts = 0
    for (_ <- 1 to 300) { // pure random garbage (with a plausible SOI)
      val len = 4 + rng.nextInt(400)
      val b = new Array[Byte](len)
      rng.nextBytes(b)
      if (rng.nextBoolean()) { b(0) = 0xFF.toByte; b(1) = 0xD8.toByte }
      JpegDecoder.decode(b) match {
        case Left(_) => lefts += 1
        case Right(_) => () // vanishingly unlikely but legal
      }
    }
    assert(lefts > 250, s"random garbage mostly decodes? lefts=$lefts")
    for (_ <- 1 to 300) { // single-byte mutations of a real stream
      val b = valid.clone()
      b(rng.nextInt(b.length)) = rng.nextInt(256).toByte
      JpegDecoder.decode(b) // must return, never throw — Left or Right ok
    }
    for (_ <- 1 to 100) { // truncations
      val cut = 2 + rng.nextInt(valid.length - 2)
      JpegDecoder.decode(java.util.Arrays.copyOf(valid, cut))
    }
  }

  test("jpeg: bitstream cross-validated against javax.imageio (independent decoder)") {
    // the generator's streams must be REAL JPEG, not merely self-consistent
    // with our decoder: the JDK's libjpeg-derived reader decodes them too,
    // within integer-IDCT variance (±2 counts)
    for (name <- Seq("jpeg_single", "jpeg_restart")) {
      val stream = Files.readAllBytes(Paths.get(res, s"$name.jpg"))
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(stream))
      assert(img != null, s"$name: ImageIO could not read the stream")
      assert((img.getWidth, img.getHeight) == (21, 18))
      val Right((jw, jh, ours)) = JpegDecoder.decode(stream)
      assert((jw, jh) == (21, 18))
      val raster = img.getRaster
      var maxDiff = 0
      for (y <- 0 until 18; x <- 0 until 21) {
        val d = math.abs(raster.getSample(x, y, 0) - (ours(y * 21 + x) & 0xFF))
        maxDiff = math.max(maxDiff, d)
      }
      assert(maxDiff <= 2, s"$name: ImageIO divergence $maxDiff")
    }
  }

  test("tiled: 4x4 tiles over 5x6 with edge padding discarded") {
    val Right(t) = decodeFile("tiled_plain.tif")
    assert((t.h, t.w) == (6, 5))
    assert(t.pixels.toSeq == grad.toSeq)
  }

  test("tiled: deflate-compressed 16-bit tiles") {
    val Right(t) = decodeFile("tiled_deflate_16.tif")
    assert(t.pixels.toSeq == grad.map(_ * 100).toSeq)
  }

  test("tiled: lzw float tiles") {
    val Right(t) = decodeFile("tiled_lzw_f32.tif")
    assert(t.pixels.toSeq == grad.map(_ / 4.0f).toSeq)
  }

  test("tiled: 48x48 lzw in 16x16 tiles (9 tiles, per-tile code streams)") {
    val Right(t) = decodeFile("tiled_lzw_wide.tif")
    val expect = for (r <- 0 until 48; c <- 0 until 48)
      yield ((r * 31 + c * 17 + (r * c) % 7) % 251).toFloat
    assert(t.pixels.toSeq == expect)
  }

  // PackBits (Compression=32773) fixtures use a run-heavy pattern so both
  // replicate (-1..-127) and literal (0..127) control bytes appear:
  // v(r,c) = ((r/2)*9) mod 251 for c<3 else (7r+3c) mod 251
  private val runs: Array[Float] = Array.tabulate(6 * 5) { i =>
    val r = i / 5; val c = i % 5
    (if (c < 3) (r / 2) * 9 % 251 else (r * 7 + c * 3) % 251).toFloat
  }

  test("packbits: single-strip 8-bit") {
    val Right(t) = decodeFile("packbits_one.tif")
    assert((t.h, t.w) == (6, 5))
    assert(t.pixels.toSeq == runs.toSeq)
  }

  test("packbits: multi-strip (each strip its own RLE stream)") {
    val Right(t) = decodeFile("packbits_strips.tif")
    assert(t.pixels.toSeq == runs.toSeq)
  }

  test("packbits: big-endian 16-bit samples") {
    val Right(t) = decodeFile("packbits_be16.tif")
    assert(t.pixels.toSeq == runs.map(_ * 100).toSeq)
  }

  test("packbits: float samples") {
    val Right(t) = decodeFile("packbits_f32.tif")
    assert(t.pixels.toSeq == runs.map(_ / 4.0f).toSeq)
  }

  test("packbits: tiled organization with edge padding discarded") {
    val Right(t) = decodeFile("packbits_tiled.tif")
    assert(t.pixels.toSeq == runs.toSeq)
  }

  test("packbits: multi-strip with NO RowsPerStrip tag decodes (advisor r11 #1)") {
    // per-strip cap falls back to ALL remaining image bytes, so each strip
    // but the last decodes short of cap — the per-block truncation check
    // must defer to the aggregate coverage check, not reject
    val Right(t) = decodeFile("packbits_strips_norps.tif")
    assert((t.h, t.w) == (6, 5))
    assert(t.pixels.toSeq == runs.toSeq)
  }

  test("packbits: a strip decoding past RowsPerStrip is rejected, not shifted") {
    assert(decodeFile("packbits_overlong.tif") ==
      Left("packbits strip decodes past its declared size"))
  }

  test("packbits: truncated stream is dropped, not thrown") {
    assert(decodeFile("packbits_truncated.tif").isLeft)
  }

  test("jp2 input is rejected with the gdalwarp route named") {
    val jp2Box = Array[Byte](0, 0, 0, 0x0C, 0x6A, 0x50, 0x20, 0x20,
      0x0D, 0x0A, 0x87.toByte, 0x0A, 1, 2, 3)
    val soc = Array[Byte](0xFF.toByte, 0x4F, 0xFF.toByte, 0x51, 0, 0, 0, 0)
    for (b <- Seq(jp2Box, soc)) {
      val Left(reason) = TiffDecoder.decode(b)
      assert(reason.contains("gdalwarp"), reason)
    }
  }

  test("rejects non-TIFF bytes with a reason") {
    assert(TiffDecoder.decode("garbage bytes".getBytes).isLeft)
    assert(TiffDecoder.decode(Array[Byte](0x49, 0x49)).isLeft)
  }

  test("q167 fixture lists cover every committed .tif (none silently untested)") {
    import graft.queries.RasterQueries
    val onDisk = new java.io.File(res).listFiles()
      .map(_.getName).filter(_.endsWith(".tif")).toSet
    val listed = RasterQueries.DecodableFixtures.toSet ++
      RasterQueries.RejectedFixtures.toSet
    assert(listed.subsetOf(onDisk),
      s"q167 lists missing files: ${listed -- onDisk}")
    assert(onDisk.subsetOf(listed),
      s"fixtures not covered by the q167 oracle row: ${onDisk -- listed}")
  }

  test("readTiffDir: binaryFile ingestion + band matching + poison tolerance") {
    val rows = TiffDecoder.readTiffDir(spark, res, Bands.LandsatBands, glob = "*")
      .collect().map(b => b.band -> b).toMap
    // B07 not in the requested band list; the .xml is not a TIFF → both dropped
    assert(rows.keySet == Set("B02", "B03", "B04", "B05"))
    assert(rows("B02").pixels.toSeq == grad.toSeq)
    assert(rows.values.forall(b => b.h == 6 && b.w == 5))
  }
}
