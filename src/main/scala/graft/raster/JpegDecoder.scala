package graft.raster

/** Baseline JPEG decoder (ITU T.81 sequential DCT, Huffman entropy coding,
  * 8-bit precision, grayscale OR 3-component YCbCr) for JPEG-in-TIFF strips
  * and tiles — TIFF Compression=7 ("new-style JPEG": every strip/tile is a
  * complete JPEG interchange or abbreviated stream, shared tables may ride
  * in tag 347 JPEGTables). Closes the last [[TiffDecoder]] envelope gap a
  * reference user would hit: rasterio/GDAL read JPEG-compressed HLS
  * granules transparently (reference data_pair/fct_data_extraction.py:22–26
  * reads whatever rasterio opens).
  *
  * Color scope (round 10): interleaved single-scan YCbCr with luma
  * sampling 1×1 / 2×1 / 1×2 / 2×2 and 1×1 chroma (4:4:4, 4:2:2, 4:2:0 —
  * the shapes real YCbCr TIFF archives carry), chroma upsampled by pixel
  * replication, converted with the pinned float transform
  * R = Y + 1.402·(Cr−128) / G = Y − 0.344136·(Cb−128) − 0.714136·(Cr−128)
  * / B = Y + 1.772·(Cb−128), floor(v+0.5), clamp — mirrored verbatim in
  * the fixture model. Progressive/arithmetic/12-bit/other component
  * geometries return Left (poison-safe, like every other unsupported
  * shape).
  *
  * The inverse DCT mirrors scripts/make_jpeg_fixtures.py's decoder model
  * EXACTLY — same pinned hex-double cosine basis (platform libm and JVM
  * Math.cos can differ in the last ulp), same accumulation order, same
  * floor(v + 0.5) rounding — so the committed expected outputs are
  * byte-exact contracts, not tolerances. The spec additionally
  * cross-validates the bitstream against javax.imageio's independent
  * libjpeg-derived decoder (±2 counts, integer-IDCT variance).
  *
  * Hostile-input discipline matches the rest of the raster surface: all
  * reads are bounds-checked, the bit reader treats exhaustion as an error
  * (never a spin), Huffman decode aborts after 16 bits without a match,
  * and output size is bounded by the declared dimensions up front.
  */
object JpegDecoder {

  /** zigzag index → natural (row-major) index. */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** cos((2x+1)·u·π/16) pinned as hex doubles — the shared basis with the
    * fixture model (see object doc). */
  private val Cos: Array[Array[Double]] = {
    val hex =
      """0x1.0000000000000p+0 0x1.0000000000000p+0 0x1.0000000000000p+0 0x1.0000000000000p+0 0x1.0000000000000p+0 0x1.0000000000000p+0 0x1.0000000000000p+0 0x1.0000000000000p+0
        |0x1.f6297cff75cb0p-1 0x1.a9b66290ea1a3p-1 0x1.1c73b39ae68c9p-1 0x1.8f8b83c69a60dp-3 -0x1.8f8b83c69a608p-3 -0x1.1c73b39ae68c6p-1 -0x1.a9b66290ea1a4p-1 -0x1.f6297cff75cb0p-1
        |0x1.d906bcf328d46p-1 0x1.87de2a6aea964p-2 -0x1.87de2a6aea962p-2 -0x1.d906bcf328d46p-1 -0x1.d906bcf328d47p-1 -0x1.87de2a6aea96dp-2 0x1.87de2a6aea967p-2 0x1.d906bcf328d44p-1
        |0x1.a9b66290ea1a3p-1 -0x1.8f8b83c69a608p-3 -0x1.f6297cff75cb0p-1 -0x1.1c73b39ae68c8p-1 0x1.1c73b39ae68c5p-1 0x1.f6297cff75cb0p-1 0x1.8f8b83c69a61dp-3 -0x1.a9b66290ea1a2p-1
        |0x1.6a09e667f3bcdp-1 -0x1.6a09e667f3bccp-1 -0x1.6a09e667f3bcep-1 0x1.6a09e667f3bcbp-1 0x1.6a09e667f3bcep-1 -0x1.6a09e667f3bc5p-1 -0x1.6a09e667f3bc9p-1 0x1.6a09e667f3bc4p-1
        |0x1.1c73b39ae68c9p-1 -0x1.f6297cff75cb0p-1 0x1.8f8b83c69a60cp-3 0x1.a9b66290ea1a5p-1 -0x1.a9b66290ea1a2p-1 -0x1.8f8b83c69a602p-3 0x1.f6297cff75cb2p-1 -0x1.1c73b39ae68c2p-1
        |0x1.87de2a6aea964p-2 -0x1.d906bcf328d47p-1 0x1.d906bcf328d44p-1 -0x1.87de2a6aea965p-2 -0x1.87de2a6aea971p-2 0x1.d906bcf328d46p-1 -0x1.d906bcf328d43p-1 0x1.87de2a6aea95fp-2
        |0x1.8f8b83c69a60dp-3 -0x1.1c73b39ae68c8p-1 0x1.a9b66290ea1a5p-1 -0x1.f6297cff75cb2p-1 0x1.f6297cff75cb0p-1 -0x1.a9b66290ea1a1p-1 0x1.1c73b39ae68c2p-1 -0x1.8f8b83c69a616p-3"""
        .stripMargin
    hex.split('\n').map(_.trim.split(' ').map(java.lang.Double.parseDouble))
  }
  private val InvSqrt2 = java.lang.Double.parseDouble("0x1.6a09e667f3bccp-1")

  /** Canonical Huffman table: JPEG spec F.2.2.3 decode arrays. */
  private final class Huff(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17) // -1 = no codes at this length
    val valPtr = new Array[Int](17)
    val values: Array[Int] = vals
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l) == 0) { maxCode(l) = -1 }
        else {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l)
          k += bits(l)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
  }

  /** Mutable shared-table state (DQT/DHT may come from a JPEGTables stream
    * or inline; later definitions override). */
  final class Tables private[JpegDecoder] (
      private[JpegDecoder] val quant: Array[Array[Int]],   // id → 64 natural
      private[JpegDecoder] val dc: Array[Huff],
      private[JpegDecoder] val ac: Array[Huff])

  def emptyTables: Tables =
    new Tables(new Array[Array[Int]](4), new Array[Huff](4), new Array[Huff](4))

  /** Parse an abbreviated tables stream (TIFF tag 347: SOI, DQT/DHT
    * segments, EOI) into a shared [[Tables]]. */
  def parseTables(bytes: Array[Byte]): Either[String, Tables] = {
    val t = emptyTables
    parseStream(bytes, t, framesAllowed = false).map(_ => t)
  }

  /** Decode one complete baseline JPEG stream (optionally resolving tables
    * from `shared`). Returns (width, height, row-major u8 pixels) — the
    * MCU padding is already cropped to the SOF dimensions. For a COLOR
    * (YCbCr) stream this is the R plane: the band-1 view, matching what
    * `rasterio.read(1)` gives the reference on a color JPEG TIFF; use
    * [[decodeAll]] for every plane. */
  def decode(bytes: Array[Byte],
             shared: Tables = emptyTables): Either[String, (Int, Int, Array[Byte])] =
    decodeAll(bytes, shared).map { case (w, h, planes) => (w, h, planes(0)) }

  /** [[decode]] returning every output plane: Array(gray) for a
    * single-component stream, Array(R, G, B) for a YCbCr stream. */
  def decodeAll(bytes: Array[Byte], shared: Tables = emptyTables)
      : Either[String, (Int, Int, Array[Array[Byte]])] = {
    // copy the shared tables so per-strip definitions can't leak across
    val t = new Tables(shared.quant.clone(), shared.dc.clone(), shared.ac.clone())
    // total like TiffDecoder.decode: any residual exception from hostile
    // structure becomes a Left, never an executor-killing throw
    try parseStream(bytes, t, framesAllowed = true)
    catch { case e: Exception => Left(s"corrupt jpeg: ${e.getClass.getSimpleName}") }
  }

  // ----------------------------------------------------------- internals

  /** One frame component: sampling factors + quant table id (from SOF),
    * entropy table slots (from SOS). */
  private final class Comp(val id: Int, val hi: Int, val vi: Int, val tq: Int) {
    var dcT: Huff = null
    var acT: Huff = null
    var quant: Array[Int] = null
  }

  /** Marker walk. With framesAllowed=false only tables segments are legal
    * (the tag-347 shape) and the result payload is null. */
  private def parseStream(bytes: Array[Byte], t: Tables, framesAllowed: Boolean)
      : Either[String, (Int, Int, Array[Array[Byte]])] = {
    if (bytes.length < 4) return Left("jpeg: too short")
    if ((bytes(0) & 0xFF) != 0xFF || (bytes(1) & 0xFF) != 0xD8)
      return Left("jpeg: missing SOI")
    var p = 2
    var sofW = -1; var sofH = -1
    var comps: Array[Comp] = null
    var restartInterval = 0
    def u8(i: Int): Int = bytes(i) & 0xFF
    def u16(i: Int): Int = ((bytes(i) & 0xFF) << 8) | (bytes(i + 1) & 0xFF)
    while (p + 1 < bytes.length) {
      if (u8(p) != 0xFF) return Left(s"jpeg: expected marker at $p")
      val m = u8(p + 1)
      p += 2
      if (m == 0xD9) { // EOI
        return if (framesAllowed) Left("jpeg: EOI before scan")
               else Right((0, 0, null))
      } else if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) {
        () // TEM/RSTn: no payload
      } else {
          if (p + 2 > bytes.length) return Left("jpeg: truncated segment")
          val len = u16(p)
          if (len < 2 || p + len > bytes.length) return Left("jpeg: bad segment length")
          val body = p + 2
          val bodyLen = len - 2
          m match {
            case 0xDB => // DQT
              var q = body
              while (q < body + bodyLen) {
                val pqtq = u8(q)
                val prec = pqtq >> 4
                val id = pqtq & 15
                if (prec != 0) return Left("jpeg: 16-bit quant tables unsupported")
                if (id > 3 || q + 65 > body + bodyLen) return Left("jpeg: bad DQT")
                val tbl = new Array[Int](64)
                var k = 0
                while (k < 64) { tbl(Zigzag(k)) = u8(q + 1 + k); k += 1 }
                t.quant(id) = tbl
                q += 65
              }
            case 0xC4 => // DHT
              var q = body
              while (q < body + bodyLen) {
                val tcth = u8(q)
                val cls = tcth >> 4
                val id = tcth & 15
                if (cls > 1 || id > 3 || q + 17 > body + bodyLen)
                  return Left("jpeg: bad DHT")
                val bits = new Array[Int](17)
                var total = 0
                var l = 1
                while (l <= 16) { bits(l) = u8(q + l); total += bits(l); l += 1 }
                if (total > 256 || q + 17 + total > body + bodyLen)
                  return Left("jpeg: bad DHT counts")
                val vals = Array.tabulate(total)(i => u8(q + 17 + i))
                val h = new Huff(bits, vals)
                if (cls == 0) t.dc(id) = h else t.ac(id) = h
                q += 17 + total
              }
            case 0xDD => // DRI
              if (bodyLen < 2) return Left("jpeg: bad DRI")
              restartInterval = u16(body)
            case 0xC0 => // SOF0 baseline
              if (!framesAllowed) return Left("jpeg: frame in tables stream")
              if (bodyLen < 8) return Left("jpeg: bad SOF")
              if (u8(body) != 8) return Left("jpeg: only 8-bit precision supported")
              sofH = u16(body + 1); sofW = u16(body + 3)
              val ncomp = u8(body + 5)
              if (ncomp != 1 && ncomp != 3)
                return Left(s"jpeg: $ncomp components unsupported (grayscale or YCbCr)")
              if (bodyLen < 6 + 3 * ncomp) return Left("jpeg: bad SOF")
              comps = Array.tabulate(ncomp) { c =>
                val cid = u8(body + 6 + 3 * c)
                val hv = u8(body + 7 + 3 * c)
                new Comp(cid, hv >> 4, hv & 15, u8(body + 8 + 3 * c))
              }
              if (ncomp == 1) {
                if (comps(0).hi != 1 || comps(0).vi != 1)
                  return Left("jpeg: subsampling unsupported")
              } else {
                // YCbCr envelope: 1x1 chroma, luma up to 2x2 (4:4:4 /
                // 4:2:2 / 4:4:0 / 4:2:0 — the shapes real archives carry)
                val l = comps(0)
                if (l.hi < 1 || l.hi > 2 || l.vi < 1 || l.vi > 2 ||
                    comps.drop(1).exists(c => c.hi != 1 || c.vi != 1))
                  return Left("jpeg: unsupported sampling geometry")
              }
              if (comps.exists(_.tq > 3)) return Left("jpeg: bad quant id")
              if (sofW <= 0 || sofH <= 0 || sofW.toLong * sofH > (1 << 28))
                return Left("jpeg: implausible dimensions")
            case 0xC1 | 0xC2 | 0xC3 | 0xC5 | 0xC6 | 0xC7 |
                 0xC9 | 0xCA | 0xCB | 0xCD | 0xCE | 0xCF =>
              return Left(f"jpeg: SOF$m%02X unsupported (baseline sequential only)")
            case 0xDA => // SOS — entropy data follows
              if (!framesAllowed) return Left("jpeg: scan in tables stream")
              if (sofW < 0) return Left("jpeg: SOS before SOF")
              if (bodyLen < 4) return Left("jpeg: bad SOS")
              val ns = u8(body)
              if (ns != comps.length)
                return Left("jpeg: scan must cover every frame component")
              // length check BEFORE reading the selector bytes: a short
              // SOS segment must fail as "bad SOS", not read past its
              // declared boundary into whatever follows (advisor r10)
              if (bodyLen < 1 + 2 * ns + 3) return Left("jpeg: bad SOS")
              // T.81 requires distinct Csj: duplicate selectors would
              // decode one plane twice and leave another all-zero —
              // silently wrong pixels instead of the poison-safe Left
              val selIds = Array.tabulate(ns)(i => u8(body + 1 + 2 * i))
              if (selIds.distinct.length != ns)
                return Left("jpeg: duplicate component selector in scan")
              // interleave follows SCAN order; the output planes follow
              // FRAME order (comps) — decodeScan gets both
              val scanComps = new Array[Comp](ns)
              var ci = 0
              while (ci < ns) {
                val cs = u8(body + 1 + 2 * ci)
                val comp = comps.find(_.id == cs).orNull
                if (comp == null) return Left("jpeg: SOS names unknown component")
                val tdta = u8(body + 2 + 2 * ci)
                comp.dcT = t.dc(tdta >> 4)
                comp.acT = t.ac(tdta & 15)
                comp.quant = t.quant(comp.tq)
                if (comp.dcT == null || comp.acT == null)
                  return Left("jpeg: missing huffman table")
                if (comp.quant == null) return Left("jpeg: no quant table")
                scanComps(ci) = comp
                ci += 1
              }
              return decodeScan(bytes, body + bodyLen, sofW, sofH,
                comps, scanComps, restartInterval)
            case _ => () // APPn/COM/unknown-with-length: skip
          }
          p = body + bodyLen
      }
    }
    // (loop exit below handles running off the end without EOI/SOS)
    if (framesAllowed) Left("jpeg: no scan") else Right((0, 0, null))
  }

  /** Entropy-decode the (interleaved) scan starting at `start`: MCU-major,
    * within an MCU each SCAN-order component contributes vi×hi blocks in
    * raster order, each with its own DC predictor. Blocks land in padded
    * per-component planes; the tail converts to output planes (gray crop,
    * or replicated-chroma YCbCr→RGB — the fixture model's exact shape). */
  private def decodeScan(bytes: Array[Byte], start: Int, w: Int, h: Int,
                         frameComps: Array[Comp], scanComps: Array[Comp],
                         restartInterval: Int)
      : Either[String, (Int, Int, Array[Array[Byte]])] = {
    var maxH = 1; var maxV = 1
    frameComps.foreach { c =>
      if (c.hi > maxH) maxH = c.hi
      if (c.vi > maxV) maxV = c.vi
    }
    val mcux = (w + 8 * maxH - 1) / (8 * maxH)
    val mcuy = (h + 8 * maxV - 1) / (8 * maxV)
    // padded per-component planes (MCU grid), u8 values
    val planeW = frameComps.map(c => mcux * 8 * c.hi)
    val planes = frameComps.indices.map(i =>
      new Array[Byte](planeW(i) * mcuy * 8 * frameComps(i).vi)).toArray
    var p = start
    var acc = 0
    var nbits = 0
    var err: String = null

    // pull the next entropy byte, handling stuffing; RST markers are
    // consumed at restart boundaries only (see below)
    def fill(): Boolean = {
      while (nbits < 16 && err == null) {
        if (p >= bytes.length) return nbits > 0
        val b = bytes(p) & 0xFF
        if (b == 0xFF) {
          if (p + 1 >= bytes.length) { err = "jpeg: truncated at marker"; return false }
          val m = bytes(p + 1) & 0xFF
          if (m == 0x00) { acc = (acc << 8) | b; nbits += 8; p += 2 }
          else return nbits > 0 // a real marker: stop filling
        } else { acc = (acc << 8) | b; nbits += 8; p += 1 }
      }
      true
    }
    def readBit(): Int = {
      if (nbits == 0 && { fill(); nbits == 0 }) { if (err == null) err = "jpeg: out of bits"; return 0 }
      nbits -= 1
      (acc >> nbits) & 1
    }
    def readBits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n && err == null) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    def decodeHuff(hf: Huff): Int = {
      var code = 0
      var l = 0
      while (l < 16 && err == null) {
        code = (code << 1) | readBit()
        l += 1
        if (hf.maxCode(l) >= 0 && code <= hf.maxCode(l) && code >= hf.minCode(l))
          return hf.values(hf.valPtr(l) + code - hf.minCode(l))
      }
      if (err == null) err = "jpeg: invalid huffman code"
      0
    }
    def extend(v: Int, t: Int): Int =
      if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

    val coeffs = new Array[Int](64)
    val preds = new Array[Int](scanComps.length)
    var mcu = 0
    val nMcu = mcux * mcuy
    while (mcu < nMcu && err == null) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        // byte-align, then expect RSTn; ALL predictors reset
        nbits = 0; acc = 0
        if (p + 1 < bytes.length && (bytes(p) & 0xFF) == 0xFF) {
          val m = bytes(p + 1) & 0xFF
          if (m >= 0xD0 && m <= 0xD7) { p += 2; java.util.Arrays.fill(preds, 0) }
          else err = "jpeg: expected restart marker"
        } else err = "jpeg: expected restart marker"
      }
      if (err == null) {
        val mx = mcu % mcux
        val my = mcu / mcux
        var sc = 0
        while (sc < scanComps.length && err == null) {
          val comp = scanComps(sc)
          val fi = frameComps.indexOf(comp)
          var by = 0
          while (by < comp.vi && err == null) {
            var bx = 0
            while (bx < comp.hi && err == null) {
              java.util.Arrays.fill(coeffs, 0)
              val tdc = decodeHuff(comp.dcT)
              if (tdc > 11) { if (err == null) err = "jpeg: bad DC category" }
              else {
                val diff = extend(readBits(tdc), tdc)
                preds(sc) += diff
                coeffs(0) = preds(sc)
                var k = 1
                var done = false
                while (k < 64 && !done && err == null) {
                  val rs = decodeHuff(comp.acT)
                  val r = rs >> 4
                  val s = rs & 15
                  if (s == 0) {
                    if (r == 15) k += 16 else done = true // ZRL vs EOB
                  } else {
                    k += r
                    if (k > 63) { err = "jpeg: AC run past block" }
                    else { coeffs(Zigzag(k)) = extend(readBits(s), s); k += 1 }
                  }
                }
              }
              if (err == null)
                placeBlock(coeffs, comp.quant, planes(fi), planeW(fi),
                  mx * comp.hi + bx, my * comp.vi + by)
              bx += 1
            }
            by += 1
          }
          sc += 1
        }
        if (err == null) mcu += 1
      }
    }
    if (err != null) return Left(err)

    if (frameComps.length == 1) {
      // crop the padded plane to the SOF dimensions
      val out = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        System.arraycopy(planes(0), y * planeW(0), out, y * w, w)
        y += 1
      }
      Right((w, h, Array(out)))
    } else {
      // YCbCr → RGB: chroma sampled by pixel REPLICATION at
      // (y·vi/maxV, x·hi/maxH) — integer division, the fixture model's
      // exact upsample — then the pinned float transform
      val r = new Array[Byte](w * h)
      val g = new Array[Byte](w * h)
      val b = new Array[Byte](w * h)
      val yC = frameComps(0); val cbC = frameComps(1); val crC = frameComps(2)
      def clamp8(v: Double): Byte = {
        val iv = math.floor(v + 0.5)
        (if (iv < 0) 0 else if (iv > 255) 255 else iv.toInt).toByte
      }
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val yv = (planes(0)((y * yC.vi / maxV) * planeW(0) + x * yC.hi / maxH) & 0xFF).toDouble
          val cb = (planes(1)((y * cbC.vi / maxV) * planeW(1) + x * cbC.hi / maxH) & 0xFF).toDouble
          val cr = (planes(2)((y * crC.vi / maxV) * planeW(2) + x * crC.hi / maxH) & 0xFF).toDouble
          val i = y * w + x
          r(i) = clamp8(yv + 1.402 * (cr - 128.0))
          g(i) = clamp8(yv - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0))
          b(i) = clamp8(yv + 1.772 * (cb - 128.0))
          x += 1
        }
        y += 1
      }
      Right((w, h, Array(r, g, b)))
    }
  }

  /** Dequantize + IDCT + level shift, mirroring the fixture model's float
    * order EXACTLY, placing the full 8×8 block into a padded plane. */
  private def placeBlock(coeffs: Array[Int], quant: Array[Int],
                         plane: Array[Byte], planeW: Int,
                         bx: Int, by: Int): Unit = {
    val d = new Array[Double](64)
    var i = 0
    while (i < 64) { d(i) = coeffs(i).toDouble * quant(i); i += 1 }
    var y = 0
    while (y < 8) {
      val yy = by * 8 + y
      var x = 0
      while (x < 8) {
        val xx = bx * 8 + x
        var s = 0.0
        var u = 0
        while (u < 8) {
          val cu = if (u == 0) InvSqrt2 else 1.0
          var v = 0
          while (v < 8) {
            val cv = if (v == 0) InvSqrt2 else 1.0
            s += cu * cv * d(u * 8 + v) * Cos(v)(x) * Cos(u)(y)
            v += 1
          }
          u += 1
        }
        val value = 0.25 * s + 128.0
        val iv = math.floor(value + 0.5)
        val clamped = if (iv < 0) 0 else if (iv > 255) 255 else iv.toInt
        plane(yy * planeW + xx) = clamped.toByte
        x += 1
      }
      y += 1
    }
  }
}
