#!/usr/bin/env python3
"""Local pre-flight mimic of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark output), runs the
matching SQL from <verifyOutDir>/oracle_sql.json in DuckDB against the
same sf tables, and compares: column names (sorted), row count, and
values (rows sorted, per-cell compare with exact match for
ints/strings/timestamps and tiny-epsilon for floats so we catch any
real drift before the driver does a hash compare).
"""
import json
import math
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if isinstance(v, float):
        return v
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    import glob
    names = sorted(
        p.rstrip("/").split("/")[-1]
        for p in glob.glob(f"{out_dir}/*/"))
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        if name not in oracle:
            status = "ROWS-ONLY" if len(got) > 0 else "ROWS-ONLY-EMPTY(FAIL)"
            if len(got) > 0:
                n_rowsonly += 1
            else:
                n_fail += 1
            print(f"{status:24s} {name:24s} rows={len(got)}")
            continue
        exp = con.sql(oracle[name]).df()
        problems = []
        if sorted(got.columns) != sorted(exp.columns):
            problems.append(f"cols {sorted(got.columns)} != {sorted(exp.columns)}")
        elif len(got) != len(exp):
            problems.append(f"rowcount {len(got)} != {len(exp)}")
        else:
            cols = sorted(got.columns)
            g = got[cols].sort_values(cols).reset_index(drop=True)
            e = exp[cols].sort_values(cols).reset_index(drop=True)
            for c in cols:
                gv, ev = g[c].tolist(), e[c].tolist()
                for i, (a, b) in enumerate(zip(gv, ev)):
                    try:  # NaT == NaT and NaN == NaN count as equal
                        import pandas as pd
                        if pd.isna(a) and pd.isna(b):
                            continue
                    except (TypeError, ValueError):
                        pass
                    if isinstance(a, float) and isinstance(b, float):
                        if math.isnan(a) and math.isnan(b):
                            continue
                        if a != b:
                            problems.append(
                                f"col {c} row {i}: {a!r} != {b!r} (diff {abs(a-b):.2e})")
                            break
                    else:
                        eq = (a == b)
                        try:
                            eq = bool(eq)
                        except Exception:
                            eq = str(a) == str(b)
                        if (a is None) != (b is None) or not eq:
                            problems.append(f"col {c} row {i}: {a!r} != {b!r}")
                            break
        if problems:
            n_fail += 1
            print(f"FAIL                     {name:24s} {problems[0]}")
        else:
            n_pass += 1
            print(f"PASS                     {name:24s} rows={len(got)}")
    missing = [n for n in oracle if n not in names]
    for name in missing:
        n_fail += 1
        print(f"MISSING-OUTPUT           {name}")
    print(f"\n{n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
