#!/usr/bin/env python3
"""Driver-side test-oracle generator (never shipped in the engine): a
mechanical numpy translation of the reference tiling operator
(/root/reference/data_pair/fct_data_extraction.py, class little_pair —
batch_index:61-74, no_overlap:75-88, crop_pair_hv:90-157) with torch tensors
replaced by numpy arrays, preserving control flow line by line. Used once to
pin expected outputs for the Scala TileKernel spec on deterministic fixtures.

Prints, per fixture: accepted (r,c) list and an md5 over the concatenated
HR/LR tile bytes.
"""
import hashlib

import numpy as np


class LittlePair:
    def __init__(self, centerline, batch_size, scale, overlap, percentage_overlap):
        self.square_crop_dict_1 = []
        self.square_crop_dict_2 = []
        self.overlap = overlap
        self.scale = scale
        self.batch_size = batch_size
        self.centerline = centerline
        self.percentage_overlap = 1 if percentage_overlap is None else percentage_overlap
        self.accepted = []
        self.batch_index()

    def batch_index(self):
        r_array_tmp, c_array_tmp = np.where(self.centerline == 1)
        half_batch = int(self.batch_size / 2)
        upper_c_limit = len(c_array_tmp) - 1 - half_batch
        upper_r_limit = len(r_array_tmp) - 1 - half_batch
        self.r_array = []
        self.c_array = []
        for i in range(len(r_array_tmp)):
            if (r_array_tmp[i] > half_batch and c_array_tmp[i] > half_batch
                    and r_array_tmp[i] < upper_r_limit and c_array_tmp[i] < upper_c_limit):
                self.r_array.append(int(r_array_tmp[i]))
                self.c_array.append(int(c_array_tmp[i]))

    def no_overlap(self, a, b):
        indices_2_remove = []
        for index, value in enumerate(self.r_array):
            if a <= value <= b:
                indices_2_remove.append(index)
        self.r_array = [v for idx, v in enumerate(self.r_array) if idx not in indices_2_remove]
        self.c_array = [v for idx, v in enumerate(self.c_array) if idx not in indices_2_remove]
        indices_2_remove = []
        for index, value in enumerate(self.c_array):
            if a <= value <= b:
                indices_2_remove.append(index)
        self.r_array = [v for idx, v in enumerate(self.r_array) if idx not in indices_2_remove]
        self.c_array = [v for idx, v in enumerate(self.c_array) if idx not in indices_2_remove]

    def crop_pair_hv(self, t1, t2):
        # t1: HR (1, n, H, W) float32; t2: LR (1, n, h, w)
        assert t1.shape[2] // t2.shape[2] == self.scale
        d, n, r, c = t2.shape
        half_size = self.batch_size // 2
        nb_data = 0
        i = -1
        while len(self.r_array) > 0:
            i = i + 1
            tmp_1 = self.r_array[i]
            tmp_2 = self.c_array[i]
            r1 = tmp_1 - half_size; r2 = tmp_1 + half_size
            c1 = tmp_2 - half_size; c2 = tmp_2 + half_size
            sq1 = np.zeros((1, n, self.batch_size, self.batch_size), dtype=np.float32)
            sq1[0, :, :, :] = t1[0, :, r1:r2, c1:c2]
            lr1 = r1 // self.scale; lr2 = r2 // self.scale
            lc1 = c1 // self.scale; lc2 = c2 // self.scale
            sq2 = np.zeros((1, n, self.batch_size // self.scale, self.batch_size // self.scale),
                           dtype=np.float32)
            sq2[0, :, :, :] = t2[0, :, lr1:lr2, lc1:lc2]
            pz1 = (np.count_nonzero(sq1) * 100) / (sq1.shape[2] * sq1.shape[3] * n)
            pz2 = (np.count_nonzero(sq2) * 100) / (sq2.shape[2] * sq2.shape[3] * n)
            p9 = (np.sum(sq2 == -9999) * 100) / (sq2.shape[2] * sq2.shape[3] * n)
            pinf = (np.sum(np.isinf(sq1)) * 100) / (sq2.shape[2] * sq1.shape[3] * n)
            if pz1 >= 99 and pz2 >= 99 and p9 <= 1 and pinf <= 1:
                self.square_crop_dict_1.append(sq1)
                self.square_crop_dict_2.append(sq2)
                self.accepted.append((tmp_1, tmp_2))
                nb_data += 1
                if self.overlap is not None:
                    a = self.r_array[i] + self.batch_size * self.percentage_overlap
                    b = self.c_array[i] + self.batch_size * self.percentage_overlap
                    self.no_overlap(a, b)
            if i >= len(self.r_array) - 1:
                break
        return nb_data


def report(name, lp):
    h = hashlib.md5()
    for a, b in zip(lp.square_crop_dict_1, lp.square_crop_dict_2):
        h.update(a.tobytes()); h.update(b.tobytes())
    print(f"{name}: accepted={lp.accepted} md5={h.hexdigest()}")


def rng_image(shape, seed):
    r = np.random.RandomState(seed)
    return (r.rand(*shape).astype(np.float32) + 0.5)  # strictly nonzero


def v1_walk(tensor, centerline, number_pairs, size):
    """Mechanical translation of v1_Landsat_class_operator.py:27-75
    (column-stride walk, band 0, abort-empty on border violation)."""
    d, n, r, c = tensor.shape
    half = size // 2
    shift = half
    out = []
    nb = 0
    while nb < number_pairs - 1:
        nb += 1
        rarr = np.where(centerline[:, shift] == 1)[0]
        if len(rarr) == 0:
            return []
        r0 = int(rarr[0])
        r1, r2, c1, c2 = r0 - half, r0 + half, shift - half, shift + half
        if r1 < 0 or r2 > r or c1 < 0 or c2 > c:
            return []
        out.append((r0, shift, tensor[0, 0, r1:r2, c1:c2].copy()))
        shift += half
    return out


def export_fixtures(outdir, images, masks, expected):
    """Write parquet fixtures + expected-results json for the Scala spec."""
    import json
    from pathlib import Path

    import pyarrow as pa
    import pyarrow.parquet as pq
    Path(outdir).mkdir(parents=True, exist_ok=True)
    img_rows = {
        "image_id": [], "sensor": [], "bands": [], "c": [], "h": [], "w": [], "pixels": []}
    for iid, sensor, bands, arr in images:  # arr: (1, n, H, W) float32
        _, n, h, w = arr.shape
        img_rows["image_id"].append(iid)
        img_rows["sensor"].append(sensor)
        img_rows["bands"].append(bands)
        img_rows["c"].append(n)
        img_rows["h"].append(h)
        img_rows["w"].append(w)
        img_rows["pixels"].append(arr.reshape(-1).tolist())
    schema = pa.schema([
        ("image_id", pa.string()), ("sensor", pa.string()),
        ("bands", pa.list_(pa.string())), ("c", pa.int32()), ("h", pa.int32()),
        ("w", pa.int32()), ("pixels", pa.list_(pa.float32()))])
    pq.write_table(pa.table(img_rows, schema=schema), f"{outdir}/images.parquet")
    mask_rows = {"mask_id": [], "h": [], "w": [], "pixels": []}
    for mid, arr in masks:
        mask_rows["mask_id"].append(mid)
        mask_rows["h"].append(arr.shape[0])
        mask_rows["w"].append(arr.shape[1])
        mask_rows["pixels"].append(arr.astype(np.float32).reshape(-1).tolist())
    mschema = pa.schema([
        ("mask_id", pa.string()), ("h", pa.int32()), ("w", pa.int32()),
        ("pixels", pa.list_(pa.float32()))])
    pq.write_table(pa.table(mask_rows, schema=mschema), f"{outdir}/masks.parquet")
    Path(outdir, "expected.json").write_text(json.dumps(expected, indent=1))
    # simple line format for the Scala spec: name \t md5 \t r,c;r,c;...
    lines = []
    for name, v in expected.items():
        pts = ";".join(f"{r},{c}" for r, c in v["accepted"])
        lines.append(f"{name}\t{v.get('md5', '')}\t{pts}")
    Path(outdir, "expected.tsv").write_text("\n".join(lines) + "\n")


def main():
    n = 4
    # F1: horizontal centerline row 15, all-ones images
    mask = np.zeros((30, 30)); mask[15, :] = 1
    hr = np.ones((1, n, 30, 30), np.float32); lr = np.ones((1, n, 10, 10), np.float32)
    lp = LittlePair(mask, 6, 3, 1, 0.7); lp.crop_pair_hv(hr, lr)
    report("F1", lp)
    # F2: vertical centerline col 15
    mask = np.zeros((30, 30)); mask[:, 15] = 1
    lp = LittlePair(mask, 6, 3, 1, 0.7); lp.crop_pair_hv(hr, lr)
    report("F2", lp)
    # F4: random dense mask + pixel defects, deterministic seed
    # In-range region only: the reference's len-based border filter (bug Q5)
    # passes edge candidates whose crops then CRASH numpy/torch slicing
    # assignment; real reference data keeps centerlines interior.
    r = np.random.RandomState(7)
    mask = np.zeros((30, 30))
    mask[4:26, 4:26] = (r.rand(22, 22) < 0.4).astype(np.float64)
    hr4 = rng_image((1, n, 30, 30), 11)
    lr4 = rng_image((1, n, 10, 10), 12)
    hr4[0, 1, 12:14, 6:9] = 0.0          # zero patch → rejects some tiles
    hr4[0, 2, 20, 20] = np.inf           # inf → faithful denominator matters
    lr4[0, 0, 7, 7] = -9999.0            # nodata patch in LR
    lp = LittlePair(mask, 6, 3, 1, 0.7); lp.crop_pair_hv(hr4, lr4)
    report("F4", lp)
    # F5: same as F4 but no overlap suppression
    lp = LittlePair(mask, 6, 3, None, None); lp.crop_pair_hv(hr4, lr4)
    report("F5", lp)

    # --------------------------------------------- fixture + expected export
    import sys
    if len(sys.argv) > 1:
        outdir = sys.argv[1]
        mask_h = np.zeros((30, 30)); mask_h[15, :] = 1
        mask_v = np.zeros((30, 30)); mask_v[:, 15] = 1
        expected = {}

        def run(name, m, h_img, l_img, overlap, p):
            lp = LittlePair(m, 6, 3, overlap, p)
            lp.crop_pair_hv(h_img, l_img)
            hh = hashlib.md5()
            for a, b in zip(lp.square_crop_dict_1, lp.square_crop_dict_2):
                hh.update(a.tobytes()); hh.update(b.tobytes())
            expected[name] = {"accepted": lp.accepted, "md5": hh.hexdigest()}

        run("F1", mask_h, hr, lr, 1, 0.7)
        run("F2", mask_v, hr, lr, 1, 0.7)
        run("F4", mask, hr4, lr4, 1, 0.7)
        run("F5", mask, hr4, lr4, None, None)
        v6 = v1_walk(hr4, mask_h, 4, 6)
        h6 = hashlib.md5()
        for _, _, cropv in v6:
            h6.update(cropv.tobytes())
        expected["F6_v1"] = {"accepted": [(a, b) for a, b, _ in v6], "md5": h6.hexdigest()}
        # F7: border-abort path — col 9's first centerline row is 2 (< half),
        # so the walk aborts at its 3rd step and returns NOTHING (the
        # reference's `return ()` at v1:60–63). numberPairs high enough to
        # reach col 9; low enough to stay inside the mask width (walking past
        # the width raises IndexError in the reference — not modeled).
        mask_b = mask_h.copy(); mask_b[2, 9] = 1
        expected["F7_v1_abort"] = {"accepted": [(a, b) for a, b, _ in v1_walk(hr4, mask_b, 4, 6)]}
        export_fixtures(
            outdir,
            images=[
                ("hr_ones", "S2", ["B2", "B3", "B4", "B8"], hr),
                ("lr_ones", "L8", ["B02", "B03", "B04", "B05"], lr),
                ("hr_rand", "S2", ["B2", "B3", "B4", "B8"], hr4),
                ("lr_rand", "L8", ["B02", "B03", "B04", "B05"], lr4)],
            masks=[("mask_h15", mask_h), ("mask_v15", mask_v), ("mask_rand", mask)],
            expected=expected)
        print(f"fixtures exported to {outdir}")


if __name__ == "__main__":
    main()
