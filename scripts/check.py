#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (dev tooling only).

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet dump written by graft.Verify,
runs the corresponding SQL from oracle_sql.json in DuckDB against the
parquet tables in <sfDir>, and compares (rows, schema-names, values with
sorted columns + sorted rows, floats rounded).
"""
import json
import math
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            # normalize numpy scalars; int widths compare equal, but an
            # int-valued float stays a float (mirrors the driver gate)
            if hasattr(v, "item") and not isinstance(v, (str, bytes)):
                v = v.item()
            if isinstance(v, float):
                if math.isnan(v):
                    v = "nan"
                else:
                    v = round(v, 6)
            vals.append(repr(v))
        out.append(tuple(vals))
    out.sort()
    return out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            # Fetch through pandas like the driver does: DuckDB HUGEINT
            # (sum of ints) becomes float64 there, so "7.0" vs "7"
            # mismatches surface locally instead of only in the gate.
            want_df = con.execute(sql).df()
            want_cols = list(want_df.columns)
            want_rows = [tuple(r) for r in want_df.itertuples(index=False)]
            got_df = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            got_cols = list(got_df.columns)
            got_rows = [tuple(r) for r in got_df.itertuples(index=False)]
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if sorted(want_cols) != sorted(got_cols):
            print(f"FAIL {name}: cols want={sorted(want_cols)} got={sorted(got_cols)}")
            n_fail += 1
            continue
        cw, cg = canon(want_rows, want_cols), canon(got_rows, got_cols)
        if len(cw) != len(cg):
            print(f"FAIL {name}: rows want={len(cw)} got={len(cg)}")
            n_fail += 1
            continue
        if cw != cg:
            bad = [(a, b) for a, b in zip(cw, cg) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {bad}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(cw)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
