#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (for the build loop only;
not part of the shipped library). Runs graft.Verify output against DuckDB.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Compares each <verifyOutDir>/<name>/ parquet with the DuckDB result of
oracle_sql.json[name], after sorting columns by name and rows by all columns —
approximating the driver's hash compare, but with a diff printout on mismatch.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        got, exp = norm(got), norm(exp)
        ok = list(got.columns) == list(exp.columns) and len(got) == len(exp)
        detail = ""
        if not ok:
            detail = (f" cols {list(got.columns)} vs {list(exp.columns)};"
                      f" rows {len(got)} vs {len(exp)}")
        else:
            for c in got.columns:
                for i, (a, b) in enumerate(zip(got[c], exp[c])):
                    same = (a == b) or (
                        isinstance(a, float) and isinstance(b, float)
                        and (a == b or (math.isnan(a) and math.isnan(b))))
                    if not same:
                        ok = False
                        detail = f" first diff col={c} row={i}: {a!r} != {b!r}"
                        break
                if not ok:
                    break
        if ok:
            n_ok += 1
            print(f"OK   {name} ({len(got)} rows)")
        else:
            n_bad += 1
            print(f"FAIL {name}:{detail}")
    print(f"== {n_ok} ok, {n_bad} bad ==")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
