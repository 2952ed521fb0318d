#!/usr/bin/env python3
"""Driver-side tooling: the sf1 oracle coverage map (judge r11, Next #7).

For every entry in <verifyOutDir>/oracle_sql.json, run the exact
check_oracle.py compare in its OWN subprocess under a wall-clock timeout,
and classify:

  green          — oracle ran in DuckDB and matched the Spark result
  duckdb-bounded — the oracle SQL exceeded the timeout (the ENGINE side
                   already produced its parquet in seconds; the recursive /
                   all-pairs SQL replay is what grinds — the q169 precedent)
  FAIL           — ran and mismatched (a real divergence: investigate)

Usage: sf1_oracle_map.py <sfDir> <verifyOutDir> [timeoutSec=120]
Writes a markdown table to stdout and a JSON map next to the verify dir.
"""
import json
import subprocess
import sys
import time
from pathlib import Path


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    timeout = int(sys.argv[3]) if len(sys.argv) > 3 else 120
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    results = {}
    for name in sorted(oracle):
        t0 = time.time()
        try:
            p = subprocess.run(
                [sys.executable, "scripts/check_oracle.py", sf_dir, out_dir,
                 f"--only={name}"],
                capture_output=True, text=True, timeout=timeout)
            dt = time.time() - t0
            ok = p.returncode == 0
            results[name] = {"status": "green" if ok else "FAIL",
                             "sec": round(dt, 1)}
            if not ok:
                results[name]["detail"] = p.stdout.strip().splitlines()[:3]
        except subprocess.TimeoutExpired:
            results[name] = {"status": "duckdb-bounded", "sec": timeout}
        print(f"{results[name]['status']:>14}  {name}  "
              f"({results[name]['sec']}s)", flush=True)
    Path(out_dir, "sf1_oracle_map.json").write_text(
        json.dumps(results, indent=1))
    counts = {}
    for r in results.values():
        counts[r["status"]] = counts.get(r["status"], 0) + 1
    print(f"\nsummary: {counts}")
    sys.exit(1 if counts.get("FAIL") else 0)


if __name__ == "__main__":
    main()
