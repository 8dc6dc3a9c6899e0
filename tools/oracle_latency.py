#!/usr/bin/env python3
"""Per-round oracle-latency audit (r11 VERDICT item 5).

Usage: python3 tools/oracle_latency.py <sfDir> <oracleJsonDir> [threshold_s]

Times every oracleSql in DuckDB over views of the testdata (same setup
as tools/compare.py), prints the top-10 slowest, and exits non-zero if
any oracle exceeds the threshold (default 10 s) — the guard against a
planning blowup (e.g. a lateral-alias DP lattice) silently dragging the
driver's correctness gate.
"""
import json
import sys
import time

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main(sf_dir: str, json_dir: str, threshold: float) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{json_dir}/oracle_sql.json"))
    times = {}
    errored = []  # a broken oracle fails FAST and would otherwise pass
    for name, sql in sorted(oracle.items()):
        t0 = time.monotonic()
        try:
            con.sql(sql).fetchall()
            times[name] = time.monotonic() - t0
        except Exception as e:
            times[name] = time.monotonic() - t0
            errored.append(name)
            print(f"ERR  {name} ({times[name]:6.2f}s): {str(e)[:120]}")
    ranked = sorted(times.items(), key=lambda kv: -kv[1])
    print(f"\ntop-10 slowest oracles of {len(times)} at {sf_dir}:")
    for name, s in ranked[:10]:
        print(f"  {name:32s} {s:7.2f} s")
    print(f"total {sum(times.values()):.1f} s")
    rc = 0
    over = [(n, s) for n, s in ranked if s > threshold]
    if over:
        print(f"\nFAIL: {len(over)} oracle(s) over {threshold:.0f}s: "
              + ", ".join(f"{n}={s:.1f}s" for n, s in over))
        rc = 1
    else:
        print(f"all oracles under {threshold:.0f}s")
    if errored:
        print(f"FAIL: {len(errored)} oracle(s) RAISED (latency pass is "
              f"meaningless for them): " + ", ".join(errored))
        rc = 1
    return rc


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    jd = sys.argv[2] if len(sys.argv) > 2 else "/tmp/oracle_dump"
    th = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    sys.exit(main(sf, jd, th))
