#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (for the build loop only;
not part of the shipped library). Runs graft.Verify output against DuckDB.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Compares each <verifyOutDir>/<name>/ parquet with the DuckDB result of
oracle_sql.json[name], after sorting columns by name and rows by all columns.
Unlike a pandas-frame compare (which coerces types and hid the round-1
HUGEINT-vs-BIGINT mismatches), both sides stay inside DuckDB: column TYPES
must match exactly and values are compared from fetchall() — the same
strictness as the driver's hash gate.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def sorted_rel(con, query):
    """DuckDB relation with columns sorted by name, rows by all columns."""
    rel = con.sql(query)
    cols = sorted(rel.columns)
    collist = ", ".join(f'"{c}"' for c in cols)
    rel2 = rel.project(collist)
    types = [str(t) for t in rel2.types]
    rows = rel2.fetchall()
    rows.sort(key=lambda r: tuple((v is None, str(v)) for v in r))
    return cols, types, rows


def type_family(t):
    """Collapse DuckDB types into families with identical value encodings.

    Round-1 driver evidence: INT-width differences (TINYINT vs BIGINT) hash
    identically, but HUGEINT does not (pandas coerces it to float64 — '1234.0'
    vs '1234'). So widths within int64 are one family; HUGEINT/DECIMAL are
    their own.
    """
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER"):
        return "INT"
    if t in ("FLOAT", "DOUBLE"):
        return "FLOAT"
    return t


def cell_eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return a == b or (math.isnan(a) and math.isnan(b))
    return a == b


def main(sf_dir, out_dir, prefix=""):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if not name.startswith(prefix):
            continue
        try:
            gc, gt, got = sorted_rel(
                con, f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            ec, et, exp = sorted_rel(con, sql)
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        ok = gc == ec and len(got) == len(exp)
        detail = ""
        if not ok:
            detail = f" cols {gc} vs {ec}; rows {len(got)} vs {len(exp)}"
        elif [type_family(t) for t in gt] != [type_family(t) for t in et]:
            ok = False
            detail = f" TYPE mismatch: spark {gt} vs oracle {et}"
        else:
            for i, (ra, rb) in enumerate(zip(got, exp)):
                for c, a, b in zip(gc, ra, rb):
                    if not cell_eq(a, b):
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
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else ""))
