#!/usr/bin/env python3
"""Driver-side fixture generator: hand-rolled baseline TIFF writer (no PIL/
rasterio in this container) producing uncompressed strip-organized
single-band files in several layouts, for the TiffDecoder spec.

Usage: make_tiff_fixtures.py <outdir>
"""
import struct
import sys
from pathlib import Path


def tiff_lzw_compress(data: bytes) -> bytes:
    """TIFF 6.0 LZW: MSB-first bit packing, 9->12-bit codes, ClearCode=256,
    EOI=257, EARLY CHANGE (width bumps when the next free code reaches
    2^width - 1). Fixture-scale only: asserts the table never fills (no
    mid-stream Clear needed)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    bitbuf = 0
    nbits = 0
    width = 9

    def put(code):
        nonlocal bitbuf, nbits
        bitbuf = (bitbuf << width) | code
        nbits += width
        while nbits >= 8:
            out.append((bitbuf >> (nbits - 8)) & 0xFF)
            nbits -= 8
        bitbuf &= (1 << nbits) - 1

    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    put(CLEAR)
    w = b""
    for byte in data:
        wc = w + bytes([byte])
        if wc in table:
            w = wc
        else:
            put(table[w])
            table[wc] = next_code
            next_code += 1
            assert next_code < 4094, "fixture too large for clear-free LZW"
            if next_code == (1 << width) - 1 and width < 12:
                width += 1
            w = bytes([byte])
    if w:
        put(table[w])
    put(EOI)
    if nbits > 0:
        out.append((bitbuf << (8 - nbits)) & 0xFF)
    return bytes(out)


def packbits_compress(data: bytes) -> bytes:
    """TIFF 6.0 §9 PackBits: literal runs (control 0..127 -> n+1 literals)
    and replicate runs (control -1..-127 -> next byte repeated 1-n times).
    Standard greedy encoder: replicate for runs >= 3, else literal."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out.append(256 + (1 - run))  # -(run-1) as unsigned byte
            out.append(data[i])
            i += run
        else:
            lit0 = i
            while i < n and i - lit0 < 128:
                # stop a literal when a >=3 replicate run starts
                if i + 2 < n and data[i] == data[i + 1] == data[i + 2]:
                    break
                i += 1
            if i == lit0:  # at a replicate boundary immediately
                i = lit0 + 1
            out.append(i - lit0 - 1)
            out += data[lit0:i]
    return bytes(out)


def write_tiff(path, w, h, pixels, bits=8, fmt=1, little=True, rows_per_strip=None,
               compression=1, overlong_first_strip=False, truncate_lzw=False,
               raw_strip_bytes=False, tile_size=None, geo=None,
               omit_rows_per_strip=False):
    """pixels: list of ints/floats, row-major, len w*h.
    compression: 1 = none, 8 = deflate (zlib per strip), 5 = TIFF LZW;
    other values (or raw_strip_bytes=True) write raw strip data as-is
    (for unsupported-compression / corrupt-stream tests).
    overlong_first_strip: hostile variant — strip 0's stream decodes to the
    WHOLE image (more than RowsPerStrip rows); decoders must reject it
    rather than shift later strips' pixel placement.
    truncate_lzw: cut the LZW stream short (corrupt-stream test).
    tile_size: (tw, th) -> tiled organization (tags 322/323/324/325) instead
    of strips; edge tiles are stored full-size with zero padding.
    geo: optional dict with keys pixel_scale (3 doubles, tag 33550),
    tiepoint (6k doubles, 33922), geokeys (4n shorts, 34735) and
    ascii (str, 34737 — NUL appended) for GeoTIFF-tagged fixtures."""
    import zlib
    bo = "<" if little else ">"
    bpp = bits // 8
    rps = rows_per_strip or h

    def pack(v):
        if bits == 8:
            return struct.pack(bo + ("b" if fmt == 2 else "B"), v)
        elif bits == 16:
            return struct.pack(bo + ("h" if fmt == 2 else "H"), v)
        elif bits == 32 and fmt == 3:
            return struct.pack(bo + "f", v)
        return struct.pack(bo + ("i" if fmt == 2 else "I"), v)

    raw_strips = []
    if tile_size:
        tw, th = tile_size
        for row0 in range(0, h, th):
            for col0 in range(0, w, tw):
                data = b""
                for r in range(th):
                    for c in range(tw):
                        rr, cc = row0 + r, col0 + c
                        v = pixels[rr * w + cc] if rr < h and cc < w else 0
                        data += pack(v)
                raw_strips.append(data)
    else:
        r = 0
        while r < h:
            rows = min(rps, h - r)
            data = b""
            for rr in range(r, r + rows):
                for cc in range(w):
                    data += pack(pixels[rr * w + cc])
            raw_strips.append(data)
            r += rows
    if compression == 8:
        strips = [zlib.compress(d, 6) for d in raw_strips]
        if overlong_first_strip:
            strips[0] = zlib.compress(b"".join(raw_strips), 6)
    elif compression == 5 and not raw_strip_bytes:
        strips = [tiff_lzw_compress(d) for d in raw_strips]
        if overlong_first_strip:
            strips[0] = tiff_lzw_compress(b"".join(raw_strips))
        if truncate_lzw:
            strips[0] = strips[0][: max(2, len(strips[0]) // 3)]
    elif compression == 32773 and not raw_strip_bytes:
        strips = [packbits_compress(d) for d in raw_strips]
        if overlong_first_strip:
            strips[0] = packbits_compress(b"".join(raw_strips))
        if truncate_lzw:  # reused flag: cut the PackBits stream mid-run
            strips[0] = strips[0][: max(1, len(strips[0]) // 3)]
    else:
        strips = raw_strips

    # layout: header(8) | strip data | IFD | out-of-line values
    header = struct.pack(bo + "2sHI", b"II" if little else b"MM", 42, 0)  # patch IFD off
    strip_offsets = []
    off = 8
    body = b""
    for sdata in strips:
        strip_offsets.append(off)
        body += sdata
        off += len(sdata)
    ifd_off = off

    def entry(tag, typ, cnt, value_bytes, extra):
        # value_bytes must be <= 4 bytes (padded) or an offset into extra area
        if len(value_bytes) <= 4:
            return struct.pack(bo + "HHI", tag, typ, cnt) + value_bytes.ljust(4, b"\0"), extra
        eo = ifd_off + 2 + n_entries * 12 + 4 + len(extra)
        return struct.pack(bo + "HHI", tag, typ, cnt) + struct.pack(bo + "I", eo), extra + value_bytes

    entries = []
    extra = b""
    def short(v): return struct.pack(bo + "H", v)
    def long_(v): return struct.pack(bo + "I", v)
    tags = [
        (256, 3, 1, short(w)),
        (257, 3, 1, short(h)),
        (258, 3, 1, short(bits)),
        (259, 3, 1, short(compression)),
        (262, 3, 1, short(1)),
        (277, 3, 1, short(1)),
        (339, 3, 1, short(fmt)),
    ]
    so = b"".join(long_(o) for o in strip_offsets)
    sc = b"".join(long_(len(s)) for s in strips)
    if tile_size:
        tags.append((322, 3, 1, short(tile_size[0])))
        tags.append((323, 3, 1, short(tile_size[1])))
        tags.append((324, 4, len(strips), so))
        tags.append((325, 4, len(strips), sc))
    else:
        # TIFF 6.0: RowsPerStrip defaults to "infinity" (all rows) when the
        # tag is absent; a multi-strip file may legally omit it and readers
        # must fall back to sequential placement (advisor r11 #1 fixture)
        if not omit_rows_per_strip:
            tags.append((278, 3, 1, short(rps)))
        tags.append((273, 4, len(strips), so))
        tags.append((279, 4, len(strips), sc))
    if geo:
        def dbl(vals): return b"".join(struct.pack(bo + "d", v) for v in vals)
        if "pixel_scale" in geo:
            tags.append((33550, 12, len(geo["pixel_scale"]), dbl(geo["pixel_scale"])))
        if "tiepoint" in geo:
            tags.append((33922, 12, len(geo["tiepoint"]), dbl(geo["tiepoint"])))
        if "geokeys" in geo:
            tags.append((34735, 3, len(geo["geokeys"]),
                         b"".join(short(k) for k in geo["geokeys"])))
        if "ascii" in geo:
            ab = geo["ascii"].encode("ascii") + b"\x00"
            tags.append((34737, 2, len(ab), ab))
    tags.sort()
    n_entries = len(tags)
    for tag, typ, cnt, vb in tags:
        e, extra = entry(tag, typ, cnt, vb, extra)
        entries.append(e)
    ifd = struct.pack(bo + "H", n_entries) + b"".join(entries) + struct.pack(bo + "I", 0)
    header = struct.pack(bo + "2sHI", b"II" if little else b"MM", 42, ifd_off)
    Path(path).write_bytes(header + body + ifd + extra)


def main():
    out = Path(sys.argv[1])
    out.mkdir(parents=True, exist_ok=True)
    grad = [(r * 7 + c * 3) % 251 for r in range(6) for c in range(5)]
    write_tiff(out / "scene_B02.le8.tif", 5, 6, grad, bits=8, little=True)
    write_tiff(out / "scene_B03.be16.tif", 5, 6, [v * 100 for v in grad], bits=16, little=False)
    write_tiff(out / "scene_B04.f32.tif", 5, 6, [v / 4.0 for v in grad], bits=32, fmt=3)
    write_tiff(out / "scene_B05.strips.tif", 5, 6, grad, bits=8, rows_per_strip=2)
    write_tiff(out / "scene_B07.ignored.tif", 5, 6, grad, bits=8)  # band not requested
    (out / "scene_B02.xmlish.xml").write_bytes(b"<not a tiff/>")
    # deflate-compressed variants (kept OUT of the band-matched names so the
    # readTiffDir band-count assertions stay unchanged)
    write_tiff(out / "deflate_one.tif", 5, 6, [v * 100 for v in grad], bits=16,
               compression=8)
    write_tiff(out / "deflate_strips.tif", 5, 6, grad, bits=8, rows_per_strip=2,
               compression=8)
    write_tiff(out / "deflate_be_f32.tif", 5, 6, [v / 4.0 for v in grad], bits=32,
               fmt=3, little=False, compression=8)
    write_tiff(out / "deflate_overlong.tif", 5, 6, grad, bits=8, rows_per_strip=2,
               compression=8, overlong_first_strip=True)
    # LZW variants (real TIFF 6.0 early-change LZW per strip)
    write_tiff(out / "lzw_one.tif", 5, 6, [v * 100 for v in grad], bits=16,
               compression=5)
    write_tiff(out / "lzw_strips.tif", 5, 6, grad, bits=8, rows_per_strip=2,
               compression=5)
    write_tiff(out / "lzw_be_f32.tif", 5, 6, [v / 4.0 for v in grad], bits=32,
               fmt=3, little=False, compression=5)
    # 48x48 low-repetition pattern: the dictionary crosses 511 AND 1023 AND
    # 2047, exercising every code-width transition (9->10->11->12)
    wide = [(r * 31 + c * 17 + (r * c) % 7) % 251 for r in range(48) for c in range(48)]
    write_tiff(out / "lzw_wide.tif", 48, 48, wide, bits=8, compression=5)
    write_tiff(out / "lzw_overlong.tif", 5, 6, grad, bits=8, rows_per_strip=2,
               compression=5, overlong_first_strip=True)
    write_tiff(out / "lzw_corrupt.tif", 5, 6, grad, bits=8, compression=5,
               truncate_lzw=True)
    write_tiff(out / "jpeg_unsupported.tif", 5, 6, grad, bits=8, compression=7,
               raw_strip_bytes=True)
    # PackBits RLE variants (Compression=32773): a run-heavy image so both
    # replicate and literal controls appear, every supported dtype, strips,
    # tiles, and the two hostile shapes (over-long stream / truncated run)
    runs = [(r // 2) * 9 % 251 if c < 3 else (r * 7 + c * 3) % 251
            for r in range(6) for c in range(5)]
    write_tiff(out / "packbits_one.tif", 5, 6, runs, bits=8, compression=32773)
    write_tiff(out / "packbits_strips.tif", 5, 6, runs, bits=8,
               rows_per_strip=2, compression=32773)
    write_tiff(out / "packbits_be16.tif", 5, 6, [v * 100 for v in runs],
               bits=16, little=False, compression=32773)
    write_tiff(out / "packbits_f32.tif", 5, 6, [v / 4.0 for v in runs],
               bits=32, fmt=3, compression=32773)
    write_tiff(out / "packbits_tiled.tif", 5, 6, runs, bits=8,
               compression=32773, tile_size=(4, 4))
    write_tiff(out / "packbits_overlong.tif", 5, 6, runs, bits=8,
               rows_per_strip=2, compression=32773, overlong_first_strip=True)
    write_tiff(out / "packbits_truncated.tif", 5, 6, runs, bits=8,
               compression=32773, truncate_lzw=True)
    # multi-strip PackBits WITHOUT the RowsPerStrip tag (legal per TIFF 6.0:
    # the tag defaults to all-rows, but strip offsets/counts still describe
    # 3 strips): per-strip size is unknowable, so the decoder's per-block
    # truncation check must defer to the aggregate coverage check
    # (advisor r11 #1 — the outN<cap rejection falsely failed these)
    write_tiff(out / "packbits_strips_norps.tif", 5, 6, runs, bits=8,
               rows_per_strip=2, compression=32773, omit_rows_per_strip=True)
    # tiled organization (the COG layout): 4x4 tiles over 5x6 -> 2x2 tile
    # grid with padded edge tiles; uncompressed, deflate and LZW variants
    write_tiff(out / "tiled_plain.tif", 5, 6, grad, bits=8, tile_size=(4, 4))
    write_tiff(out / "tiled_deflate_16.tif", 5, 6, [v * 100 for v in grad],
               bits=16, compression=8, tile_size=(4, 4))
    write_tiff(out / "tiled_lzw_f32.tif", 5, 6, [v / 4.0 for v in grad],
               bits=32, fmt=3, compression=5, tile_size=(4, 4))
    write_tiff(out / "tiled_lzw_wide.tif", 48, 48, wide, bits=8,
               compression=5, tile_size=(16, 16))
    # GeoTIFF-tagged scene: UTM 32N pixel grid at 10 m — decode must carry
    # the tags verbatim and encode must write them back (the meta-copy
    # round-trip of the reference's array2raster)
    write_tiff(out / "scene_geo.f32.tif", 5, 6, [v / 4.0 for v in grad],
               bits=32, fmt=3, geo={
                   "pixel_scale": (10.0, 10.0, 0.0),
                   "tiepoint": (0.0, 0.0, 0.0, 600000.0, 5090220.0, 0.0),
                   "geokeys": [1, 1, 0, 3,
                               1024, 0, 1, 1,
                               1025, 0, 1, 1,
                               3072, 0, 1, 32632],
                   "ascii": "WGS 84 / UTM zone 32N|",
               })
    print("tiff fixtures written to", out)


if __name__ == "__main__":
    main()
