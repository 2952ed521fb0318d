#!/usr/bin/env python3
"""Driver-side fixture generator for JPEG-in-TIFF (Compression=7) decode:
hand-rolled baseline-JPEG encoder (ITU T.81 sequential DCT, Huffman,
8-bit, single grayscale component — no PIL/libjpeg in this container)
plus a reference DECODER MODEL whose float operation order the Scala
decoder mirrors exactly, so expected outputs are bit-exact, not
approximate.

Writes, per fixture: the .tif and an expected_<name>.bin (row-major u8
of the decoded image — what the Scala decoder must produce byte-for-
byte).

Usage: make_jpeg_fixtures.py <outdir>
"""
import math
import struct
import sys
from pathlib import Path

# ---------------------------------------------------------------- tables

# K.3.3.1 typical luminance tables
STD_DC_BITS = [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
STD_DC_VALS = list(range(12))
STD_AC_BITS = [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
STD_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]

# Annex K.1 luminance quantization table (quality ~50), in NATURAL order
STD_QUANT_ZZ = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99]

FLAT_QUANT = [1] * 64  # near-lossless variant

ZIGZAG = [  # zigzag index -> natural index
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63]

# cosine basis, the SHARED spec between encoder model and Scala decoder:
# C[u][x] = cos((2x+1) * u * pi / 16), pinned as hex doubles so the model
# and graft.raster.JpegDecoder use BIT-IDENTICAL constants (platform libm
# and JVM Math.cos may differ in the last ulp)
COS_HEX = """
0x1.0000000000000p+0 0x1.0000000000000p+0 0x1.0000000000000p+0 0x1.0000000000000p+0 0x1.0000000000000p+0 0x1.0000000000000p+0 0x1.0000000000000p+0 0x1.0000000000000p+0
0x1.f6297cff75cb0p-1 0x1.a9b66290ea1a3p-1 0x1.1c73b39ae68c9p-1 0x1.8f8b83c69a60dp-3 -0x1.8f8b83c69a608p-3 -0x1.1c73b39ae68c6p-1 -0x1.a9b66290ea1a4p-1 -0x1.f6297cff75cb0p-1
0x1.d906bcf328d46p-1 0x1.87de2a6aea964p-2 -0x1.87de2a6aea962p-2 -0x1.d906bcf328d46p-1 -0x1.d906bcf328d47p-1 -0x1.87de2a6aea96dp-2 0x1.87de2a6aea967p-2 0x1.d906bcf328d44p-1
0x1.a9b66290ea1a3p-1 -0x1.8f8b83c69a608p-3 -0x1.f6297cff75cb0p-1 -0x1.1c73b39ae68c8p-1 0x1.1c73b39ae68c5p-1 0x1.f6297cff75cb0p-1 0x1.8f8b83c69a61dp-3 -0x1.a9b66290ea1a2p-1
0x1.6a09e667f3bcdp-1 -0x1.6a09e667f3bccp-1 -0x1.6a09e667f3bcep-1 0x1.6a09e667f3bcbp-1 0x1.6a09e667f3bcep-1 -0x1.6a09e667f3bc5p-1 -0x1.6a09e667f3bc9p-1 0x1.6a09e667f3bc4p-1
0x1.1c73b39ae68c9p-1 -0x1.f6297cff75cb0p-1 0x1.8f8b83c69a60cp-3 0x1.a9b66290ea1a5p-1 -0x1.a9b66290ea1a2p-1 -0x1.8f8b83c69a602p-3 0x1.f6297cff75cb2p-1 -0x1.1c73b39ae68c2p-1
0x1.87de2a6aea964p-2 -0x1.d906bcf328d47p-1 0x1.d906bcf328d44p-1 -0x1.87de2a6aea965p-2 -0x1.87de2a6aea971p-2 0x1.d906bcf328d46p-1 -0x1.d906bcf328d43p-1 0x1.87de2a6aea95fp-2
0x1.8f8b83c69a60dp-3 -0x1.1c73b39ae68c8p-1 0x1.a9b66290ea1a5p-1 -0x1.f6297cff75cb2p-1 0x1.f6297cff75cb0p-1 -0x1.a9b66290ea1a1p-1 0x1.1c73b39ae68c2p-1 -0x1.8f8b83c69a616p-3
"""
COS = [[float.fromhex(v) for v in line.split()]
       for line in COS_HEX.strip().splitlines()]
INV_SQRT2 = float.fromhex("0x1.6a09e667f3bccp-1")


def fdct_quant(block, quant):
    """block: 64 ints 0..255 (natural order). Returns 64 quantized coeffs
    in natural order. Float order does not need to match the decoder (the
    encoder's rounding is baked into the bitstream)."""
    shifted = [v - 128.0 for v in block]
    out = [0] * 64
    for u in range(8):
        for v in range(8):
            s = 0.0
            for y in range(8):
                for x in range(8):
                    s += shifted[y * 8 + x] * COS[v][x] * COS[u][y]
            cu = INV_SQRT2 if u == 0 else 1.0
            cv = INV_SQRT2 if v == 0 else 1.0
            val = 0.25 * cu * cv * s
            q = quant[u * 8 + v]
            out[u * 8 + v] = int(round(val / q))
    return out


def idct_dequant(coeffs, quant):
    """The DECODER MODEL the Scala implementation mirrors exactly:
    dequantize (integer multiply), then the direct 2D IDCT with THIS loop
    order and double arithmetic, then round-half-up via floor(v+0.5),
    level shift inside, clamp. Returns 64 ints 0..255 natural order."""
    d = [coeffs[i] * quant[i] for i in range(64)]
    out = [0] * 64
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = INV_SQRT2 if u == 0 else 1.0
                    cv = INV_SQRT2 if v == 0 else 1.0
                    s += cu * cv * d[u * 8 + v] * COS[v][x] * COS[u][y]
            val = 0.25 * s + 128.0
            iv = math.floor(val + 0.5)
            out[y * 8 + x] = 0 if iv < 0 else (255 if iv > 255 else int(iv))
    return out


# K.3.3.2 typical chrominance tables (exercise the multi-table paths)
CHROMA_DC_BITS = [0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
CHROMA_DC_VALS = list(range(12))
CHROMA_AC_BITS = [0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
CHROMA_AC_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]

# Annex K.2 chrominance quantization (quality ~50), NATURAL order
CHROMA_QUANT = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99]

# YCbCr <-> RGB constants: plain decimal literals — Python float() and
# Java Double.parseDouble are both correctly-rounded, so the Scala decoder
# parses THE SAME doubles (the hex-pinning trick is unnecessary here)
CR_R, CB_G, CR_G, CB_B = 1.402, 0.344136, 0.714136, 1.772


def rgb_to_ycbcr(r, g, b):
    """Encoder-side forward transform (rounding baked into the bitstream —
    need not match any decoder)."""
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    clamp = lambda v: 0 if v < 0 else (255 if v > 255 else int(math.floor(v + 0.5)))
    return clamp(y), clamp(cb), clamp(cr)


def ycbcr_to_rgb_model(y, cb, cr):
    """The DECODER MODEL transform the Scala decoder mirrors exactly:
    double arithmetic in THIS order, floor(v+0.5), clamp."""
    r = y + CR_R * (cr - 128.0)
    g = y - CB_G * (cb - 128.0) - CR_G * (cr - 128.0)
    b = y + CB_B * (cb - 128.0)
    clamp = lambda v: 0 if v < 0 else (255 if v > 255 else int(math.floor(v + 0.5)))
    return clamp(r), clamp(g), clamp(b)


# ------------------------------------------------------------- huffman enc

def build_enc_table(bits, vals):
    """(bits[17], vals) -> {symbol: (code, length)} canonical JPEG codes."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            table[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


def magnitude(v):
    """JPEG coefficient coding: category (bit length) + offset bits."""
    if v == 0:
        return 0, 0
    a = abs(v)
    n = a.bit_length()
    bits = v if v > 0 else v + (1 << n) - 1
    return n, bits


class BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code, length):
        if length == 0:
            return
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def pad_to_byte(self):
        if self.n:
            self.put(0x7F, 8 - self.n)  # 1-bits padding


def encode_scan(blocks, quant, dri=0):
    """blocks: list of 64-int quantized coeff blocks (natural order).
    Returns entropy-coded bytes incl. restart markers every dri MCUs."""
    dc_t = build_enc_table(STD_DC_BITS, STD_DC_VALS)
    ac_t = build_enc_table(STD_AC_BITS, STD_AC_VALS)
    bw = BitWriter()
    pred = 0
    rst = 0
    for i, blk in enumerate(blocks):
        if dri and i > 0 and i % dri == 0:
            bw.pad_to_byte()
            bw.out.append(0xFF)
            bw.out.append(0xD0 + (rst % 8))
            rst += 1
            pred = 0
        # DC
        diff = blk[0] - pred
        pred = blk[0]
        n, bits = magnitude(diff)
        code, length = dc_t[n]
        bw.put(code, length)
        bw.put(bits, n)
        # AC in zigzag order
        zz = [blk[ZIGZAG[k]] for k in range(1, 64)]
        run = 0
        for v in zz:
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = ac_t[0xF0]
                bw.put(code, length)
                run -= 16
            n, bits = magnitude(v)
            code, length = ac_t[(run << 4) | n]
            bw.put(code, length)
            bw.put(bits, n)
            run = 0
        if run:
            code, length = ac_t[0x00]  # EOB
            bw.put(code, length)
    bw.pad_to_byte()
    return bytes(bw.out)


def seg(marker, payload):
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def dqt_seg(quant):
    # precision 0, table id 0; values in ZIGZAG order per spec
    return seg(0xDB, bytes([0x00] + [quant[ZIGZAG[k]] for k in range(64)]))


def dht_segs():
    dc = bytes([0x00] + STD_DC_BITS[1:] + STD_DC_VALS)
    ac = bytes([0x10] + STD_AC_BITS[1:] + STD_AC_VALS)
    return seg(0xC4, dc) + seg(0xC4, ac)


def sof0_seg(w, h):
    return seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))


def sos_seg():
    return seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))


def dri_seg(mcus):
    return seg(0xDD, struct.pack(">H", mcus))


def encode_jpeg(pixels, w, h, quant, tables_inline=True, dri=0):
    """pixels: row-major u8 list. Returns (jpeg_bytes, expected_u8_list)
    where expected is the decoder model's output cropped to w×h."""
    bw = (w + 7) // 8
    bh = (h + 7) // 8
    blocks = []
    for by in range(bh):
        for bx in range(bw):
            blk = []
            for y in range(8):
                for x in range(8):
                    yy = min(by * 8 + y, h - 1)
                    xx = min(bx * 8 + x, w - 1)  # edge replication padding
                    blk.append(pixels[yy * w + xx])
            blocks.append(fdct_quant(blk, quant))
    scan = encode_scan(blocks, quant, dri)
    body = b"\xFF\xD8"  # SOI
    if tables_inline:
        body += dqt_seg(quant) + dht_segs()
    if dri:
        body += dri_seg(dri)
    body += sof0_seg(w, h) + sos_seg() + scan + b"\xFF\xD9"  # EOI
    # expected output via the decoder model
    expected = [0] * (w * h)
    for bi, blk in enumerate(blocks):
        dec = idct_dequant(blk, quant)
        by, bx = bi // bw, bi % bw
        for y in range(8):
            for x in range(8):
                yy, xx = by * 8 + y, bx * 8 + x
                if yy < h and xx < w:
                    expected[yy * w + xx] = dec[y * 8 + x]
    return body, expected


def jpeg_tables_stream(quant):
    """Tag 347 payload: SOI + tables + EOI (abbreviated tables stream)."""
    return b"\xFF\xD8" + dqt_seg(quant) + dht_segs() + b"\xFF\xD9"


# --------------------------------------------------------------- color

def dqt_seg_id(quant, tid):
    return seg(0xDB, bytes([tid] + [quant[ZIGZAG[k]] for k in range(64)]))


def dht_segs_color():
    segs = b""
    for cls, tid, bits, vals in [
            (0, 0, STD_DC_BITS, STD_DC_VALS), (1, 0, STD_AC_BITS, STD_AC_VALS),
            (0, 1, CHROMA_DC_BITS, CHROMA_DC_VALS),
            (1, 1, CHROMA_AC_BITS, CHROMA_AC_VALS)]:
        segs += seg(0xC4, bytes([(cls << 4) | tid] + bits[1:] + vals))
    return segs


def encode_color_jpeg(rgb, w, h, hs, vs, dri=0):
    """rgb: row-major list of (r,g,b). (hs,vs) = luma sampling factors
    ((1,1)=4:4:4, (2,1)=4:2:2, (2,2)=4:2:0); chroma is 1x1. Y uses the
    luminance tables (quant id 0, huff id 0), Cb/Cr the chrominance ones
    (id 1). Returns (jpeg_bytes, expected_rgb) where expected_rgb is the
    DECODER MODEL's interleaved (r,g,b) output: per-block idct_dequant,
    chroma upsample by pixel REPLICATION (sample at (y//vs, x//hs)), then
    ycbcr_to_rgb_model per pixel."""
    yp = [0] * (w * h)
    cbf = [0] * (w * h)
    crf = [0] * (w * h)
    for i, (r, g, b) in enumerate(rgb):
        yp[i], cbf[i], crf[i] = rgb_to_ycbcr(r, g, b)
    # chroma subsample: box average over the hs x vs cover (edge-clamped)
    cw, ch = (w + hs - 1) // hs, (h + vs - 1) // vs
    cb = [0] * (cw * ch)
    cr = [0] * (cw * ch)
    for cy in range(ch):
        for cx in range(cw):
            sb = sr = n = 0
            for dy in range(vs):
                for dx in range(hs):
                    yy, xx = cy * vs + dy, cx * hs + dx
                    if yy < h and xx < w:
                        sb += cbf[yy * w + xx]
                        sr += crf[yy * w + xx]
                        n += 1
            cb[cy * cw + cx] = int(math.floor(sb / n + 0.5))
            cr[cy * cw + cx] = int(math.floor(sr / n + 0.5))
    mcux = (w + 8 * hs - 1) // (8 * hs)
    mcuy = (h + 8 * vs - 1) // (8 * vs)

    def block(plane, pw, ph, bx, by):
        return [plane[min(by * 8 + y, ph - 1) * pw + min(bx * 8 + x, pw - 1)]
                for y in range(8) for x in range(8)]

    # interleaved MCU encode with per-component predictors
    luma_dc = build_enc_table(STD_DC_BITS, STD_DC_VALS)
    luma_ac = build_enc_table(STD_AC_BITS, STD_AC_VALS)
    chroma_dc = build_enc_table(CHROMA_DC_BITS, CHROMA_DC_VALS)
    chroma_ac = build_enc_table(CHROMA_AC_BITS, CHROMA_AC_VALS)
    comps = [  # (plane, pw, ph, hi, vi, quant, dc_t, ac_t)
        (yp, w, h, hs, vs, STD_QUANT_ZZ, luma_dc, luma_ac),
        (cb, cw, ch, 1, 1, CHROMA_QUANT, chroma_dc, chroma_ac),
        (cr, cw, ch, 1, 1, CHROMA_QUANT, chroma_dc, chroma_ac)]
    bw_ = BitWriter()
    preds = [0, 0, 0]
    dec_planes = [[0] * (mcux * 8 * hs * mcuy * 8 * vs),
                  [0] * (mcux * 8 * mcuy * 8), [0] * (mcux * 8 * mcuy * 8)]
    rst = 0
    for mi in range(mcuy * mcux):
        if dri and mi > 0 and mi % dri == 0:
            bw_.pad_to_byte()
            bw_.out.append(0xFF)
            bw_.out.append(0xD0 + (rst % 8))
            rst += 1
            preds = [0, 0, 0]
        my, mx = mi // mcux, mi % mcux
        for ci, (plane, pw, ph, hi, vi, quant, dc_t, ac_t) in enumerate(comps):
            for by in range(vi):
                for bx in range(hi):
                    blk = fdct_quant(
                        block(plane, pw, ph, mx * hi + bx, my * vi + by), quant)
                    # DC
                    diff = blk[0] - preds[ci]
                    preds[ci] = blk[0]
                    n, bits = magnitude(diff)
                    code, length = dc_t[n]
                    bw_.put(code, length)
                    bw_.put(bits, n)
                    run = 0
                    for v in [blk[ZIGZAG[k]] for k in range(1, 64)]:
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            code, length = ac_t[0xF0]
                            bw_.put(code, length)
                            run -= 16
                        n, bits = magnitude(v)
                        code, length = ac_t[(run << 4) | n]
                        bw_.put(code, length)
                        bw_.put(bits, n)
                        run = 0
                    if run:
                        code, length = ac_t[0x00]
                        bw_.put(code, length)
                    # decoder-model plane (full padded grid)
                    dpw = mcux * 8 * hi
                    dec = idct_dequant(blk, quant)
                    gx, gy = mx * hi + bx, my * vi + by
                    for y in range(8):
                        for x in range(8):
                            dec_planes[ci][(gy * 8 + y) * dpw + gx * 8 + x] = \
                                dec[y * 8 + x]
    bw_.pad_to_byte()
    scan = bytes(bw_.out)

    body = b"\xFF\xD8"
    body += dqt_seg_id(STD_QUANT_ZZ, 0) + dqt_seg_id(CHROMA_QUANT, 1)
    body += dht_segs_color()
    if dri:
        body += dri_seg(dri)
    body += seg(0xC0, struct.pack(">BHHB", 8, h, w, 3) +
                bytes([1, (hs << 4) | vs, 0, 2, 0x11, 1, 3, 0x11, 1]))
    body += seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    body += scan + b"\xFF\xD9"

    expected = []
    ypw = mcux * 8 * hs
    cpw = mcux * 8
    for y in range(h):
        for x in range(w):
            yv = dec_planes[0][y * ypw + x]
            cbv = dec_planes[1][(y // vs) * cpw + (x // hs)]
            crv = dec_planes[2][(y // vs) * cpw + (x // hs)]
            expected.append(ycbcr_to_rgb_model(yv, cbv, crv))
    return body, expected


def write_color_jpeg_tiff(path, w, h, jpeg, hs, vs, tile_size=None, tiles=None):
    """YCbCr JPEG TIFF: SamplesPerPixel=3, Photometric=6,
    BitsPerSample=(8,8,8), YCbCrSubSampling=(hs,vs). Single strip by
    default; tile_size=(tw,th) + tiles=[streams] for the COG layout."""
    bo = "<"
    off = 8
    streams = tiles if tiles is not None else [jpeg]
    offsets = []
    body = b""
    for s in streams:
        offsets.append(off)
        body += s
        off += len(s)
    ifd_off = off

    def short(v):
        return struct.pack(bo + "H", v)

    def long_(v):
        return struct.pack(bo + "I", v)

    so = b"".join(long_(o) for o in offsets)
    sc = b"".join(long_(len(s)) for s in streams)
    tags = [
        (256, 3, 1, short(w)),
        (257, 3, 1, short(h)),
        (258, 3, 3, short(8) + short(8) + short(8)),
        (259, 3, 1, short(7)),
        (262, 3, 1, short(6)),  # YCbCr
        (277, 3, 1, short(3)),
        (284, 3, 1, short(1)),  # chunky
        (530, 3, 2, short(hs) + short(vs)),
    ]
    if tile_size:
        tags += [(322, 3, 1, short(tile_size[0])),
                 (323, 3, 1, short(tile_size[1])),
                 (324, 4, len(streams), so),
                 (325, 4, len(streams), sc)]
    else:
        tags += [(273, 4, len(streams), so),
                 (278, 3, 1, short(h)),
                 (279, 4, len(streams), sc)]
    tags.sort()
    n_entries = len(tags)
    entries = []
    extra = b""
    for tag, typ, cnt, vb in tags:
        if len(vb) <= 4:
            entries.append(struct.pack(bo + "HHI", tag, typ, cnt) + vb.ljust(4, b"\0"))
        else:
            eo = ifd_off + 2 + n_entries * 12 + 4 + len(extra)
            entries.append(struct.pack(bo + "HHI", tag, typ, cnt) + struct.pack(bo + "I", eo))
            extra += vb
    ifd = struct.pack(bo + "H", n_entries) + b"".join(entries) + struct.pack(bo + "I", 0)
    header = struct.pack(bo + "2sHI", b"II", 42, ifd_off)
    Path(path).write_bytes(header + body + ifd + extra)


# ----------------------------------------------------------------- tiff

def write_jpeg_tiff(path, w, h, strips, rows_per_strip, jpeg_tables=None,
                    tile_size=None):
    """strips: list of complete JPEG streams, one per strip (or per tile
    when tile_size=(tw, th) — tags 322/323/324/325 instead of 273/278/279)."""
    bo = "<"
    header_ifd_off_patch = 8
    off = 8
    body = b""
    strip_offsets = []
    for s in strips:
        strip_offsets.append(off)
        body += s
        off += len(s)
    ifd_off = off

    def short(v):
        return struct.pack(bo + "H", v)

    def long_(v):
        return struct.pack(bo + "I", v)

    tags = [
        (256, 3, 1, short(w)),
        (257, 3, 1, short(h)),
        (258, 3, 1, short(8)),
        (259, 3, 1, short(7)),  # new-style JPEG
        (262, 3, 1, short(1)),
        (277, 3, 1, short(1)),
    ]
    so = b"".join(long_(o) for o in strip_offsets)
    sc = b"".join(long_(len(s)) for s in strips)
    if tile_size:
        tags += [(322, 3, 1, short(tile_size[0])),
                 (323, 3, 1, short(tile_size[1])),
                 (324, 4, len(strips), so),
                 (325, 4, len(strips), sc)]
    else:
        tags += [(278, 3, 1, short(rows_per_strip)),
                 (273, 4, len(strips), so),
                 (279, 4, len(strips), sc)]
    if jpeg_tables is not None:
        tags.append((347, 7, len(jpeg_tables), jpeg_tables))
    tags.sort()
    n_entries = len(tags)

    entries = []
    extra = b""
    for tag, typ, cnt, vb in tags:
        if len(vb) <= 4:
            entries.append(struct.pack(bo + "HHI", tag, typ, cnt) + vb.ljust(4, b"\0"))
        else:
            eo = ifd_off + 2 + n_entries * 12 + 4 + len(extra)
            entries.append(struct.pack(bo + "HHI", tag, typ, cnt) + struct.pack(bo + "I", eo))
            extra += vb
    ifd = struct.pack(bo + "H", n_entries) + b"".join(entries) + struct.pack(bo + "I", 0)
    header = struct.pack(bo + "2sHI", b"II", 42, ifd_off)
    Path(path).write_bytes(header + body + ifd + extra)


def main():
    out = Path(sys.argv[1])
    out.mkdir(parents=True, exist_ok=True)
    w, h = 21, 18
    pix = [(x * 7 + y * 13 + ((x * y) % 5) * 11) % 256
           for y in range(h) for x in range(w)]

    # 1. single strip, tables inline, standard quant (+ raw stream for the
    # spec's independent javax.imageio cross-validation)
    jp, exp = encode_jpeg(pix, w, h, STD_QUANT_ZZ)
    write_jpeg_tiff(out / "jpeg_single.tif", w, h, [jp], h)
    (out / "expected_jpeg_single.bin").write_bytes(bytes(exp))
    (out / "jpeg_single.jpg").write_bytes(jp)

    # 2. flat quant (near-lossless) — large coefficient magnitudes
    jp, exp = encode_jpeg(pix, w, h, FLAT_QUANT)
    write_jpeg_tiff(out / "jpeg_flat.tif", w, h, [jp], h)
    (out / "expected_jpeg_flat.bin").write_bytes(bytes(exp))

    # 3. multi-strip: rows_per_strip=8, each strip its own complete stream
    rps = 8
    strips = []
    exp_all = [0] * (w * h)
    r = 0
    while r < h:
        rows = min(rps, h - r)
        sp = [pix[(r + y) * w + x] for y in range(rows) for x in range(w)]
        jp, exp = encode_jpeg(sp, w, rows, STD_QUANT_ZZ)
        strips.append(jp)
        for i, v in enumerate(exp):
            exp_all[r * w + i] = v
        r += rows
    write_jpeg_tiff(out / "jpeg_strips.tif", w, h, strips, rps)
    (out / "expected_jpeg_strips.bin").write_bytes(bytes(exp_all))

    # 4. shared tables via tag 347 (abbreviated strip streams)
    rps = 8
    strips = []
    exp_all = [0] * (w * h)
    r = 0
    while r < h:
        rows = min(rps, h - r)
        sp = [pix[(r + y) * w + x] for y in range(rows) for x in range(w)]
        jp, exp = encode_jpeg(sp, w, rows, STD_QUANT_ZZ, tables_inline=False)
        strips.append(jp)
        for i, v in enumerate(exp):
            exp_all[r * w + i] = v
        r += rps
    write_jpeg_tiff(out / "jpeg_shared_tables.tif", w, h, strips, rps,
                    jpeg_tables=jpeg_tables_stream(STD_QUANT_ZZ))
    (out / "expected_jpeg_shared_tables.bin").write_bytes(bytes(exp_all))

    # 5. restart markers: DRI=2 (marker every 2 MCUs)
    jp, exp = encode_jpeg(pix, w, h, STD_QUANT_ZZ, dri=2)
    write_jpeg_tiff(out / "jpeg_restart.tif", w, h, [jp], h)
    (out / "expected_jpeg_restart.bin").write_bytes(bytes(exp))
    (out / "jpeg_restart.jpg").write_bytes(jp)

    # 6. tiled organization: 16x16 JPEG tiles over 21x18 -> 2x2 tile grid,
    # edge tiles stored FULL-SIZE (the COG-with-JPEG layout); expected =
    # model decode of each full tile, padding discarded on placement
    tw, th = 16, 16
    tiles = []
    exp_all = [0] * (w * h)
    for ty in range(0, h, th):
        for tx in range(0, w, tw):
            tp = []
            for y in range(th):
                for x in range(tw):
                    yy, xx = min(ty + y, h - 1), min(tx + x, w - 1)
                    tp.append(pix[yy * w + xx])  # replicate into padding
            jp, exp = encode_jpeg(tp, tw, th, STD_QUANT_ZZ)
            tiles.append(jp)
            for y in range(th):
                for x in range(tw):
                    yy, xx = ty + y, tx + x
                    if yy < h and xx < w:
                        exp_all[yy * w + xx] = exp[y * tw + x]
    write_jpeg_tiff(out / "jpeg_tiled.tif", w, h, tiles, 0, tile_size=(tw, th))
    (out / "expected_jpeg_tiled.bin").write_bytes(bytes(exp_all))

    # 7. hostile: truncated scan (decoder must Left, not loop/crash)
    jp, _ = encode_jpeg(pix, w, h, STD_QUANT_ZZ)
    write_jpeg_tiff(out / "jpeg_truncated.tif", w, h, [jp[: len(jp) // 3]], h)

    # 8. COLOR (YCbCr): 4:4:4, 4:2:2, 4:2:0 (+ a DRI'd 4:2:0). Expected
    # bins: the R PLANE under the existing expected_jpeg_<name>.bin naming
    # (what TiffDecoder returns — rasterio/GDAL's band 1 for a YCbCr JPEG
    # TIFF, the reference's raster.read(1)), plus the full interleaved RGB
    # as expected_<name>_rgb.bin for the JpegDecoder.decodeAll spec.
    rgbpix = [((x * 11 + y * 5) % 256,
               (x * 3 + y * 17 + 60) % 256,
               (x * 13 + y * 7 + ((x * y) % 3) * 40) % 256)
              for y in range(h) for x in range(w)]
    for name, hs, vs, dri in [("jpeg_color444", 1, 1, 0),
                              ("jpeg_color422", 2, 1, 0),
                              ("jpeg_color420", 2, 2, 0),
                              ("jpeg_color420_rst", 2, 2, 2)]:
        jp, exp = encode_color_jpeg(rgbpix, w, h, hs, vs, dri=dri)
        write_color_jpeg_tiff(out / f"{name}.tif", w, h, jp, hs, vs)
        (out / f"expected_{name}.bin").write_bytes(bytes(r for r, _, _ in exp))
        (out / f"expected_{name}_rgb.bin").write_bytes(
            bytes(v for t in exp for v in t))
        if name == "jpeg_color444":
            (out / f"{name}.jpg").write_bytes(jp)  # imageio cross-check

    # 9. COLOR + TILED (the COG-with-color-JPEG layout): 16x16 4:2:0 tiles
    # over 21x18 -> 2x2 grid, edge tiles full-size (replicated padding);
    # each tile a complete color stream; expected = per-tile model decode,
    # padding discarded on placement (R plane committed)
    tw, th = 16, 16
    tiles = []
    expR = [0] * (w * h)
    for ty in range(0, h, th):
        for tx in range(0, w, tw):
            tp = []
            for y in range(th):
                for x in range(tw):
                    yy, xx = min(ty + y, h - 1), min(tx + x, w - 1)
                    tp.append(rgbpix[yy * w + xx])
            jp, exp = encode_color_jpeg(tp, tw, th, 2, 2)
            tiles.append(jp)
            for y in range(th):
                for x in range(tw):
                    yy, xx = ty + y, tx + x
                    if yy < h and xx < w:
                        expR[yy * w + xx] = exp[y * tw + x][0]
    write_color_jpeg_tiff(out / "jpeg_color_tiled.tif", w, h, None, 2, 2,
                          tile_size=(tw, th), tiles=tiles)
    (out / "expected_jpeg_color_tiled.bin").write_bytes(bytes(expR))

    print("jpeg fixtures written to", out)


if __name__ == "__main__":
    main()
