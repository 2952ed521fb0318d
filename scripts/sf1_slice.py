#!/usr/bin/env python3
"""Driver-side tooling (judge r13, Next #4): materialize a DETERMINISTIC
Mix64 slice of a scale-factor dir so the oracle replays that are
DuckDB-bounded at full sf1 (all-pairs closures, recursive walks, IEJoins)
can be verified on a self-consistent sub-corpus instead of staying
UNVERIFIED.

The slice keeps a row iff its primary key's Mix64 sample coordinate
(the engine's own sampling primitive — (key*A + B) mod 2^64 >> 32) is
below floor(rate * 2^32). Only the three big single-PK tables are
sliced (documents by doc_id, embeddings by vec_id, events by event_id)
— every bounded oracle reads only these; the TPC-H relational tables
are copied verbatim so FK joins stay intact. Engine (Verify) and oracle
(check_oracle) then both run UNCHANGED against the slice dir: same
queries, same SQL, same compare — "green-on-slice" means the identical
end-to-end claim proven on the deterministic sub-corpus.

A slice_meta.json lands in <outDir> recording the rate, threshold and
per-table in/out row counts, and sf1_oracle_map.py stamps those into every
green-on-slice entry — the map is self-describing about HOW MUCH corpus
backed each slice verification (judge r14 Next #5: the r14 run used a 5%
slice while SURVEY said 10%; the rate is now recorded at the source).

Usage: sf1_slice.py <sfDir> <outDir> [rate=0.1]
"""
import json
import shutil
import sys
from pathlib import Path

import duckdb

MUL_A = 0x9E3779B97F4A7C15
ADD_B = 0x2545F4914F6CDD1D
M64 = 1 << 64

SLICED = {"documents": "doc_id", "embeddings": "vec_id", "events": "event_id"}


def coord_sql(key: str) -> str:
    # the same normalized-residue form as OpsQueries.coordSql
    return (f"(((({MUL_A}::HUGEINT * {key} + {ADD_B}::HUGEINT) "
            f"% {M64}::HUGEINT) + {M64}::HUGEINT) % {M64}::HUGEINT) "
            f"// 4294967296")


def main():
    sf_dir, out_dir = Path(sys.argv[1]), Path(sys.argv[2])
    rate = float(sys.argv[3]) if len(sys.argv) > 3 else 0.1
    thr = int(rate * 4294967296.0)
    out_dir.mkdir(parents=True, exist_ok=True)
    meta = {"rate": rate, "thr": thr, "tables": {}}
    con = duckdb.connect()
    for p in sorted(sf_dir.glob("*.parquet")):
        table = p.stem
        dst = out_dir / p.name
        # Spark-written tables are DIRECTORIES of part files; the driver's
        # testdata tables are single files — handle both
        src = f"{p}/*.parquet" if p.is_dir() else str(p)
        if table in SLICED:
            key = SLICED[table]
            con.execute(
                f"COPY (SELECT * FROM '{src}' WHERE {coord_sql(key)} < {thr} "
                f"ORDER BY {key}) TO '{dst}' (FORMAT PARQUET)")
            n_in = con.execute(f"SELECT count(*) FROM '{src}'").fetchone()[0]
            n_out = con.execute(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
            meta["tables"][table] = {"rows_full": n_in, "rows_slice": n_out}
            print(f"sliced  {table:11s} {n_in:>9} -> {n_out:>9} "
                  f"(rate {rate}, thr {thr})")
        else:
            if dst.exists():
                (shutil.rmtree if dst.is_dir() else Path.unlink)(dst)
            if p.is_dir():
                shutil.copytree(p, dst)
            else:
                shutil.copyfile(p, dst)
            print(f"copied  {table}")
    Path(out_dir, "slice_meta.json").write_text(json.dumps(meta, indent=1))
    print(f"wrote {out_dir}/slice_meta.json")


if __name__ == "__main__":
    main()
