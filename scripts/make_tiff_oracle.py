#!/usr/bin/env python3
"""Driver-side tooling: compute the q167_tiff_decode const-oracle rows
INDEPENDENTLY of the Scala decoder, from the fixture generators' pixel
formulas (make_tiff_fixtures.py) and the committed expected_jpeg_*.bin
decoder-model outputs (make_jpeg_fixtures.py, cross-validated against
javax.imageio in TiffDecoderSpec).

Per decodable fixture: (file, ok=1, h, w, n_px, sum_q, px_md5) where
q = round(pixel*4) (exact: int fixtures are whole numbers, f32 fixtures
are quarters) and px_md5 = md5 of the comma-joined row-major q values.
Hostile fixtures emit (file, ok=0, NULL, ...).

Prints the DuckDB oracle SQL to paste into RasterQueries.scala.

Usage: make_tiff_oracle.py [fixture_dir]   (default src/main/resources/tiff)
"""
import hashlib
import sys
from pathlib import Path

GRAD = [(r * 7 + c * 3) % 251 for r in range(6) for c in range(5)]
RUNS = [(r // 2) * 9 % 251 if c < 3 else (r * 7 + c * 3) % 251
        for r in range(6) for c in range(5)]
WIDE = [(r * 31 + c * 17 + (r * c) % 7) % 251 for r in range(48) for c in range(48)]


def main():
    res = Path(sys.argv[1] if len(sys.argv) > 1 else "src/main/resources/tiff")

    def jpeg(name):  # committed decoder-model output, row-major u8, 18x21
        b = res.joinpath(f"expected_{name}.bin").read_bytes()
        assert len(b) == 18 * 21, name
        return 18, 21, [v * 4 for v in b]

    # (file, h, w, q-values) — q = 4*pixel
    decodable = [
        ("scene_B02.le8.tif", 6, 5, [v * 4 for v in GRAD]),
        ("scene_B03.be16.tif", 6, 5, [v * 400 for v in GRAD]),
        ("scene_B04.f32.tif", 6, 5, [v for v in GRAD]),
        ("scene_B05.strips.tif", 6, 5, [v * 4 for v in GRAD]),
        ("scene_B07.ignored.tif", 6, 5, [v * 4 for v in GRAD]),
        ("scene_geo.f32.tif", 6, 5, [v for v in GRAD]),
        ("deflate_one.tif", 6, 5, [v * 400 for v in GRAD]),
        ("deflate_strips.tif", 6, 5, [v * 4 for v in GRAD]),
        ("deflate_be_f32.tif", 6, 5, [v for v in GRAD]),
        ("lzw_one.tif", 6, 5, [v * 400 for v in GRAD]),
        ("lzw_strips.tif", 6, 5, [v * 4 for v in GRAD]),
        ("lzw_be_f32.tif", 6, 5, [v for v in GRAD]),
        ("lzw_wide.tif", 48, 48, [v * 4 for v in WIDE]),
        ("tiled_plain.tif", 6, 5, [v * 4 for v in GRAD]),
        ("tiled_deflate_16.tif", 6, 5, [v * 400 for v in GRAD]),
        ("tiled_lzw_f32.tif", 6, 5, [v for v in GRAD]),
        ("tiled_lzw_wide.tif", 48, 48, [v * 4 for v in WIDE]),
        ("packbits_one.tif", 6, 5, [v * 4 for v in RUNS]),
        ("packbits_strips.tif", 6, 5, [v * 4 for v in RUNS]),
        ("packbits_be16.tif", 6, 5, [v * 400 for v in RUNS]),
        ("packbits_f32.tif", 6, 5, [v for v in RUNS]),
        ("packbits_tiled.tif", 6, 5, [v * 4 for v in RUNS]),
        ("packbits_strips_norps.tif", 6, 5, [v * 4 for v in RUNS]),
    ] + [(f"{n}.tif",) + jpeg(n) for n in
         ["jpeg_single", "jpeg_flat", "jpeg_strips",
          "jpeg_shared_tables", "jpeg_restart", "jpeg_tiled",
          # color fixtures: the expected bin is the R PLANE (band 1 —
          # rasterio read(1) parity, what TiffDecoder returns)
          "jpeg_color444", "jpeg_color422", "jpeg_color420",
          "jpeg_color420_rst", "jpeg_color_tiled"]]
    rejected = ["deflate_overlong.tif", "lzw_overlong.tif", "lzw_corrupt.tif",
                "jpeg_unsupported.tif", "jpeg_truncated.tif",
                "packbits_overlong.tif", "packbits_truncated.tif"]

    rows = []
    for f, h, w, q in decodable:
        assert len(q) == h * w, f
        md5 = hashlib.md5(",".join(str(v) for v in q).encode()).hexdigest()
        rows.append((f, 1, h, w, len(q), sum(q), f"'{md5}'"))
    for f in rejected:
        rows.append((f, 0, "NULL", "NULL", "NULL", "NULL", "NULL"))
    rows.sort()

    sels = []
    for f, ok, h, w, n, s, md5 in rows:
        sels.append(
            f"SELECT '{f}' AS file, CAST({ok} AS BIGINT) AS ok, "
            f"CAST({h} AS BIGINT) AS h, CAST({w} AS BIGINT) AS w, "
            f"CAST({n} AS BIGINT) AS n_px, CAST({s} AS BIGINT) AS sum_q, "
            f"{md5} AS px_md5")
    print("\nUNION ALL\n".join(sels) + "\nORDER BY file")


if __name__ == "__main__":
    main()
