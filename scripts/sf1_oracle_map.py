#!/usr/bin/env python3
"""Driver-side tooling: the sf1 oracle coverage map (judge r11, Next #7).

For every entry in <verifyOutDir>/oracle_sql.json, run the exact
check_oracle.py compare in its OWN subprocess under a wall-clock timeout,
and classify:

  green          — oracle ran in DuckDB and matched the Spark result
  duckdb-bounded — the oracle SQL exceeded the timeout (the ENGINE side
                   already produced its parquet in seconds; the recursive /
                   all-pairs SQL replay is what grinds — the q169 precedent).
                   UNVERIFIED at this SF, not passing: the summary calls
                   them out and the run only exits 0 when every entry that
                   COMPLETED matched.
  FAIL           — ran and mismatched (a real divergence: investigate)

Usage: sf1_oracle_map.py <sfDir> <verifyOutDir> [timeoutSec=120]
Writes a markdown table to stdout and a JSON map next to the verify dir.
"""
import json
import subprocess
import sys
import time
from pathlib import Path

# resolve the sibling compare script relative to THIS file, not the cwd
# (advisor r12: a cwd-relative path made every entry FAIL with a python
# traceback when the tool ran from outside the repo root)
CHECK_ORACLE = Path(__file__).resolve().parent / "check_oracle.py"


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    timeout = int(sys.argv[3]) if len(sys.argv) > 3 else 120
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    results = {}
    for name in sorted(oracle):
        t0 = time.time()
        try:
            p = subprocess.run(
                [sys.executable, str(CHECK_ORACLE), sf_dir, out_dir,
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
    bounded = sorted(n for n, r in results.items()
                     if r["status"] == "duckdb-bounded")
    print(f"\nsummary: {counts}")
    if bounded:
        # unverified, NOT passing — name them so a green exit can't read
        # as full coverage (advisor r12)
        print(f"UNVERIFIED at this SF (oracle replay exceeded {timeout}s, "
              f"engine side completed): {', '.join(bounded)}")
    sys.exit(1 if counts.get("FAIL") else 0)


if __name__ == "__main__":
    main()
