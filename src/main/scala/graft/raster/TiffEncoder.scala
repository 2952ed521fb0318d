package graft.raster

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Dataset

/** O3 — `array2raster` (reference: data_pair/fct_data_extraction.py:15–20):
  * write a float32 pixel grid back out as a GeoTIFF. The reference delegates
  * to rasterio with the source file's profile (`kwargs = raster.meta` —
  * the output inherits the source's CRS and transform); this encoder emits
  * the exact envelope [[TiffDecoder]] reads — baseline TIFF, little-endian,
  * uncompressed, one sample per pixel (32-bit float by default; int16/uint16
  * via [[SampleType]] for dtype-copying writes), single strip — and
  * writes the source's [[GeoMeta]] tags back verbatim, so
  * read→transform→write round-trips pixel-exactly AND keeps the output
  * georeferenced for GDAL/QGIS consumers, without GDAL.
  */
object TiffEncoder {

  /** Output sample type. The reference's `array2raster` copies the SOURCE
    * dtype through `raster.meta` (fct_data_extraction.py:17–20) — rasters
    * read as int16 write back as int16. F32 is this encoder's historical
    * default (the reference pipeline only ever writes float arrays); I16/U16
    * close the decode/encode asymmetry for int sources. Integer types
    * require every pixel to be a whole number in range — a lossy write is a
    * loud error, never a silent wrap (numpy would wrap; documented
    * divergence in favor of correctness). */
  sealed abstract class SampleType(val bits: Int, val fmtCode: Int)
  case object F32 extends SampleType(32, 3)
  case object I16 extends SampleType(16, 2)
  case object U16 extends SampleType(16, 1)

  /** Encode a row-major float32 grid as a minimal baseline TIFF (no
    * georeferencing — the pixel-only envelope). */
  def encode(h: Int, w: Int, pixels: Array[Float]): Array[Byte] =
    encode(h, w, pixels, GeoMeta.empty)

  def encode(h: Int, w: Int, pixels: Array[Float], meta: GeoMeta): Array[Byte] =
    encode(h, w, pixels, meta, F32)

  /** [[encode]] carrying the source's georeferencing tags verbatim — the
    * write half of the reference's meta-copy (decode with
    * [[TiffDecoder.decodeWithMeta]]). With an empty meta the output is
    * byte-identical to the pixel-only form (golden-fixture stability). */
  def encode(h: Int, w: Int, pixels: Array[Float], meta: GeoMeta,
             sampleType: SampleType): Array[Byte] = {
    require(h > 0 && w > 0, s"bad dimensions ${w}x$h")
    require(pixels.length == h * w, s"pixels ${pixels.length} != $h*$w")
    // geo entries, ascending tag order (all above the base tags):
    // (tag, type, count, payload bytes — LE)
    def dbls(a: Array[Double]): Array[Byte] = {
      val b = ByteBuffer.allocate(a.length * 8).order(ByteOrder.LITTLE_ENDIAN)
      a.foreach(b.putDouble); b.array()
    }
    def shorts(a: Array[Int]): Array[Byte] = {
      val b = ByteBuffer.allocate(a.length * 2).order(ByteOrder.LITTLE_ENDIAN)
      a.foreach(x => b.putShort(x.toShort)); b.array()
    }
    val asciiBytes =
      if (meta.geoAscii.isEmpty) Array.emptyByteArray
      else (meta.geoAscii + "\u0000")
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val geoEntries: Seq[(Int, Int, Int, Array[Byte])] = Seq(
      (33550, 12, meta.pixelScale.length, dbls(meta.pixelScale)),
      (33922, 12, meta.tiepoints.length, dbls(meta.tiepoints)),
      (34264, 12, meta.transform.length, dbls(meta.transform)),
      (34735, 3, meta.geoKeys.length, shorts(meta.geoKeys)),
      (34736, 12, meta.geoDoubles.length, dbls(meta.geoDoubles)),
      (34737, 2, asciiBytes.length, asciiBytes)
    ).filter(_._3 > 0)

    // layout: header(8) | IFD | out-of-line geo values | pixel strip
    // entries sorted by tag id (TIFF requirement):
    // 256 width, 257 height, 258 bits, 259 compression, 262 photometric,
    // 273 strip offset, 277 samples/px, 278 rows/strip, 279 strip bytes,
    // 339 sample format, then the geo tags
    val nEntries = 10 + geoEntries.length
    val ifdOff = 8
    val ifdSize = 2 + nEntries * 12 + 4
    val extraOff = ifdOff + ifdSize
    val extraLen = geoEntries.map(g => if (g._4.length > 4) g._4.length else 0).sum
    val dataOff = extraOff + extraLen
    val bytesPerPx = sampleType.bits / 8
    val dataLen = pixels.length * bytesPerPx
    val bb = ByteBuffer.allocate(dataOff + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(0x49.toByte).put(0x49.toByte).putShort(42).putInt(ifdOff)
    bb.putShort(nEntries.toShort)
    def entry(tag: Int, typ: Int, count: Int, value: Long): Unit = {
      bb.putShort(tag.toShort).putShort(typ.toShort).putInt(count)
      typ match {
        case 3 => bb.putShort(value.toShort).putShort(0.toShort) // SHORT, padded
        case 4 => bb.putInt(value.toInt) // LONG
        case other => throw new IllegalArgumentException(s"unsupported entry type $other")
      }
    }
    entry(256, 4, 1, w.toLong)
    entry(257, 4, 1, h.toLong)
    entry(258, 3, 1, sampleType.bits.toLong) // bits per sample
    entry(259, 3, 1, 1L) // no compression
    entry(262, 3, 1, 1L) // BlackIsZero
    entry(273, 4, 1, dataOff.toLong) // strip offset
    entry(277, 3, 1, 1L) // samples per pixel
    entry(278, 4, 1, h.toLong) // rows per strip (single strip)
    entry(279, 4, 1, dataLen.toLong) // strip byte count
    entry(339, 3, 1, sampleType.fmtCode.toLong) // sample format
    var extraCursor = extraOff
    geoEntries.foreach { case (tag, typ, count, payload) =>
      bb.putShort(tag.toShort).putShort(typ.toShort).putInt(count)
      if (payload.length <= 4) {
        val pad = java.util.Arrays.copyOf(payload, 4)
        bb.put(pad)
      } else {
        bb.putInt(extraCursor)
        val save = bb.position()
        bb.position(extraCursor); bb.put(payload); bb.position(save)
        extraCursor += payload.length
      }
    }
    bb.putInt(0) // no next IFD
    bb.position(dataOff)
    var i = 0
    sampleType match {
      case F32 =>
        while (i < pixels.length) { bb.putFloat(pixels(i)); i += 1 }
      case I16 =>
        while (i < pixels.length) {
          val v = pixels(i)
          require(v == Math.rint(v) && v >= Short.MinValue && v <= Short.MaxValue,
            s"pixel $i = $v not representable as int16 (lossy write refused)")
          bb.putShort(v.toInt.toShort); i += 1
        }
      case U16 =>
        while (i < pixels.length) {
          val v = pixels(i)
          require(v == Math.rint(v) && v >= 0 && v <= 0xFFFF,
            s"pixel $i = $v not representable as uint16 (lossy write refused)")
          bb.putShort(v.toInt.toShort); i += 1
        }
    }
    bb.array()
  }

  /** BigTIFF (magic 43) writer — the f32 pixel-only envelope with 8-byte
    * offsets, a 64-bit entry count and 20-byte IFD entries, strip
    * offset/count as LONG8 (type 16) so the reader's BigTIFF type path is
    * exercised, not just its header path. Functionally the single-band
    * float strip GDAL emits under BIGTIFF=YES; exists so the BigTIFF read
    * support has an in-repo round-trip anchor (in-memory grids stay under
    * 2 GiB — the FORMAT is what changes, not the size). */
  def encodeBig(h: Int, w: Int, pixels: Array[Float]): Array[Byte] = {
    require(h > 0 && w > 0, s"bad dimensions ${w}x$h")
    require(pixels.length == h * w, s"pixels ${pixels.length} != $h*$w")
    val nEntries = 10
    val ifdOff = 16
    val ifdSize = 8 + nEntries * 20 + 8
    val dataOff = ifdOff + ifdSize
    val dataLen = pixels.length * 4
    val bb = ByteBuffer.allocate(dataOff + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(0x49.toByte).put(0x49.toByte).putShort(43)
      .putShort(8).putShort(0).putLong(ifdOff.toLong)
    bb.putLong(nEntries.toLong)
    def entry(tag: Int, typ: Int, value: Long): Unit = {
      bb.putShort(tag.toShort).putShort(typ.toShort).putLong(1L)
      typ match {
        case 3 => bb.putShort(value.toShort).putShort(0.toShort).putInt(0)
        case 4 => bb.putInt(value.toInt).putInt(0)
        case 16 => bb.putLong(value)
        case other => throw new IllegalArgumentException(s"unsupported entry type $other")
      }
    }
    entry(256, 4, w.toLong)
    entry(257, 4, h.toLong)
    entry(258, 3, 32L)
    entry(259, 3, 1L)
    entry(262, 3, 1L)
    entry(273, 16, dataOff.toLong)
    entry(277, 3, 1L)
    entry(278, 4, h.toLong)
    entry(279, 16, dataLen.toLong)
    entry(339, 3, 3L)
    bb.putLong(0L) // no next IFD
    bb.position(dataOff)
    var i = 0
    while (i < pixels.length) { bb.putFloat(pixels(i)); i += 1 }
    bb.array()
  }

  /** Executor-side TIFF sink: one file `<outDir>/<band>/<leaf(path)>` per D3
    * row — the dataflow counterpart of the reference's per-file
    * rasterio write loop. `outDir` must be a filesystem path reachable from
    * every executor (local-mode tests: any local dir; a cluster: shared FS).
    */
  def writeTiffDir(rows: Dataset[TiffDecoder.BandFile], outDir: String): Unit =
    rows.foreachPartition { (it: Iterator[TiffDecoder.BandFile]) =>
      it.foreach { r =>
        val leaf = r.path.substring(r.path.lastIndexOf('/') + 1)
        val dir = java.nio.file.Paths.get(outDir, r.band)
        java.nio.file.Files.createDirectories(dir)
        java.nio.file.Files.write(dir.resolve(leaf), encode(r.h, r.w, r.pixels, r.meta))
      }
    }
}
