#!/usr/bin/env python3
"""Local pre-flight mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_correctness.py <verify_out_dir> <sf_dir>

Reads each <name>.parquet the Scala Verify main dumped, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the sf_dir parquet tables, and
compares: schema (column names), row count, and values (columns sorted by
name, rows sorted by all columns). Floats compare exactly AND with tolerance,
so near-misses that would break a hash compare are flagged loudly.
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def dtype_class(s: pd.Series) -> str:
    """Coarse dtype class as the driver's hash sees it. The driver hashes
    rendered values, so int64 123 vs float64 123.0 is a mismatch even when
    numerically equal (e.g. a DuckDB HUGEINT sum reaching pandas as float64
    while Spark wrote int64 — the r7 ewma/gini failure class)."""
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    return "object"


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize ints/floats so int32 vs int64 etc. compare equal
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main(out_dir: str, sf_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark output missing ({e})")
            failures += 1
            continue
        try:
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}")
            failures += 1
            continue
        # dtype-class drift: canon() normalizes widths, but the driver hashes
        # the un-normalized rendering — flag any int/float/object class skew.
        drift = [
            (c, dtype_class(got[c]), dtype_class(want[c]))
            for c in g.columns
            if dtype_class(got[c]) != dtype_class(want[c])
        ]
        if drift:
            print(f"FAIL {name}: dtype-class drift (spark vs oracle) {drift}")
            failures += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
            failures += 1
            continue
        mism = []
        for c in g.columns:
            a, b = g[c], w[c]
            if pd.api.types.is_float_dtype(a):
                exact = ((a == b) | (a.isna() & b.isna())).all()
                close = all(
                    (math.isnan(x) and math.isnan(y)) or abs(x - y) <= 1e-9 * max(1, abs(x))
                    for x, y in zip(a, b)
                )
                if not exact:
                    mism.append((c, "float-near-miss" if close else "float-diff"))
            else:
                if not ((a == b) | (a.isna() & b.isna())).all():
                    mism.append((c, "diff"))
        if mism:
            print(f"FAIL {name}: value mismatch {mism}")
            for c, _ in mism[:2]:
                neq = g[c] != w[c]
                print("   spark:", g[c][neq].head(3).tolist(),
                      " oracle:", w[c][neq].head(3).tolist())
            failures += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
    print(f"\n{len(oracles) - failures}/{len(oracles)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
