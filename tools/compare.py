#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads each SparkEntry query result (parquet written by graft.Verify) and
the dumped oracle_sql.json, runs the oracle SQL in DuckDB against views
over the same testdata parquet, and diffs: schema (sorted column names),
row count, and values (exact, both in written order and sorted).
"""
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    skipped = [n for n in oracle if not os.path.isdir(f"{out_dir}/{n}")]
    if skipped:
        # partial Verify run (name filter): check what exists, say so
        print(f"note: {len(skipped)} queries have no dumped result dir, skipping: "
              + " ".join(sorted(skipped)[:8]) + ("..." if len(skipped) > 8 else ""))
        oracle = {n: s for n, s in oracle.items() if n not in skipped}
    for name, sql in sorted(oracle.items()):
        try:
            exp = norm(con.sql(sql).df())
            got = norm(con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            failed.append(name)
            continue
        problems = []
        if list(exp.columns) != list(got.columns):
            problems.append(f"columns exp={list(exp.columns)} got={list(got.columns)}")
        elif len(exp) != len(got):
            problems.append(f"rows exp={len(exp)} got={len(got)}")
        else:
            # dtype drift (e.g. DuckDB ceil()->DOUBLE vs Spark ceil()->LONG)
            # changes the driver's value hash even when values compare equal,
            # so it must be a hard failure here too.
            dt = [
                f"{c}: oracle={exp[c].dtype} spark={got[c].dtype}"
                for c in exp.columns
                if exp[c].dtype != got[c].dtype
            ]
            if dt:
                problems.append("dtypes " + "; ".join(dt))
            # exact-order compare, treating NaN==NaN
            try:
                pd.testing.assert_frame_equal(exp, got, check_dtype=False, check_exact=True)
            except AssertionError as e:
                problems.append("value diff (ordered): " + str(e).split("\n")[0])
                es = exp.sort_values(list(exp.columns)).reset_index(drop=True)
                gs = got.sort_values(list(got.columns)).reset_index(drop=True)
                try:
                    pd.testing.assert_frame_equal(es, gs, check_dtype=False, check_exact=True)
                    problems.append("(matches when row-sorted — ordering only)")
                except AssertionError:
                    pass
        if problems:
            failed.append(name)
            print(f"FAIL {name}")
            for p in problems:
                print(f"  {p}")
            # Diagnostic only — unmergeable frames (column/dtype mismatch)
            # must not abort the remaining queries' checks.
            try:
                with pd.option_context("display.max_columns", None, "display.width", 250):
                    merged = exp.merge(got, indicator=True, how="outer")
                    diff = merged[merged["_merge"] != "both"]
                    if len(diff):
                        print(diff.head(10))
            except Exception as e:
                print(f"  (diff rendering unavailable: {e})")
        else:
            print(f"OK   {name} ({len(exp)} rows)")
    print(f"\n{len(oracle) - len(failed)}/{len(oracle)} queries match")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
