#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle compare (driver-side
tooling only — the engine itself never depends on this).

Usage: check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, runs each SQL against DuckDB views over
<sfDir>/*.parquet, reads the Spark result parquet from <verifyOutDir>/<name>/,
and compares: column names (sorted), row count, and exact cell values after
sorting rows by all columns. Exit 0 iff every query matches.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = repr(v)  # exact bits
            elif isinstance(v, list):
                v = tuple(v)
            vals.append((str(type(v).__name__), str(v)))
        out.append(tuple(vals))
    out.sort()
    return out


def main():
    # --types-only: run ONLY the output-type guard over every oracle SQL
    # (pairs with `graft.Verify <sf> <out> __oracle_only__`, which dumps the
    # full registry's oracle_sql.json without executing any Spark queries).
    types_only = "--types-only" in sys.argv
    # --only=qA,qB: check just the named oracle entries (the sf1 coverage
    # map drives each query in its own `timeout`-wrapped subprocess, so a
    # DuckDB-intractable oracle can be classified instead of hanging)
    only = None
    for a in sys.argv:
        if a.startswith("--only="):
            only = set(a[len("--only="):].split(","))
    argv = [a for a in sys.argv if a != "--types-only"
            and not a.startswith("--only=")]
    sf_dir, out_dir = argv[1], argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            # driver testdata is one file per table; tool-generated dirs
            # (graft.tools.ScaleUp) are Spark part-file directories
            pat = f"{p}/*.parquet" if p.is_dir() else str(p)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    if only is not None:
        missing = only - oracle.keys()
        if missing:
            print(f"FAIL --only names not in oracle_sql.json: {sorted(missing)}")
            sys.exit(1)
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = Path(out_dir) / name
        try:
            # Type guard FIRST (round-10, VERDICT r9 "What's wrong #1"): the
            # driver's hash is type-sensitive, but fetchall() canonicalization
            # below is not — DuckDB HUGEINT and BIGINT both arrive as Python
            # `int` and compare equal, so an un-cast sum()/`//` column passes
            # locally yet reds the driver row (q99/q150, rounds 7-9). Ban the
            # widened types outright so that class of red can never pass here.
            rel = con.sql(sql)
            banned = [(c, str(t)) for c, t in zip(rel.columns, rel.types)
                      if str(t) in ("HUGEINT", "UHUGEINT")
                      or str(t).startswith("DECIMAL")]
            if banned:
                print(f"FAIL {name}: oracle output column(s) with driver-hash-"
                      f"unsafe type (add CAST(... AS BIGINT/DOUBLE)): {banned}")
                n_fail += 1
                continue
            if types_only:
                print(f"OK   {name}: types {[str(t) for t in rel.types]}")
                continue
            d = con.execute(sql)
            drows, dcols = d.fetchall(), [c[0] for c in d.description]
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        try:
            s = con.execute(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
            srows, scols = s.fetchall(), [c[0] for c in s.description]
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        if sorted(dcols) != sorted(scols):
            print(f"FAIL {name}: columns differ: duckdb={sorted(dcols)} spark={sorted(scols)}")
            n_fail += 1
            continue
        if len(drows) != len(srows):
            print(f"FAIL {name}: rowcount duckdb={len(drows)} spark={len(srows)}")
            n_fail += 1
            continue
        cd, cs = canon(drows, dcols), canon(srows, scols)
        if cd != cs:
            bad = next(i for i, (a, b) in enumerate(zip(cd, cs)) if a != b)
            print(f"FAIL {name}: first differing canonical row #{bad}:")
            print(f"  duckdb: {cd[bad]}")
            print(f"  spark : {cs[bad]}")
            n_fail += 1
            continue
        print(f"OK   {name}: {len(srows)} rows")
    print(f"{'ALL OK' if n_fail == 0 else f'{n_fail} FAILURES'} / {len(oracle)} queries")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
