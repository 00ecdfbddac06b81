#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run after graft.Verify
has dumped result parquets + oracle_sql.json, compare each result against
DuckDB on the same tables. Usage: check.py <outDir> <sfDir>
"""
import sys, json, glob
import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize datetimes to ns, strip tz
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        if not glob.glob(f"{out_dir}/{name}/*.parquet"):
            continue  # subset run (Verify's optional 3rd arg) — skip unrun queries
        try:
            got = norm(pd.concat([pd.read_parquet(p) for p in
                       sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))],
                       ignore_index=True))
            want = norm(con.execute(sql).df())
            if list(got.columns) != list(want.columns):
                print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
                n_fail += 1
                continue
            if len(got) != len(want):
                print(f"FAIL {name}: rows {len(got)} != {len(want)}")
                n_fail += 1
                continue
            diffs = []
            for c in got.columns:
                a, b = got[c], want[c]
                # The driver hashes RENDERED values: int64 58580 vs
                # DuckDB-HUGEINT-as-float64 58580.0 is a driver FAIL
                # (round-8 q_expectations lesson), while same-kind width
                # differences (int32/int64, datetime ns/us) render
                # identically and pass. Mirror that: cross-KIND dtype
                # mismatch fails here too; never coerce across kinds.
                if a.dtype.kind != b.dtype.kind:
                    diffs.append(f"col {c}: dtype {a.dtype} != {b.dtype} "
                                 "(kinds differ — the driver's value hash will diverge; "
                                 "CAST in the oracle SQL)")
                    continue
                if a.dtype != b.dtype:  # same kind, different width: benign —
                    # but compare at the PROMOTED width: downcasting the wider
                    # side (old b.astype(a.dtype)) silently wraps an int64
                    # oracle value outside int32 range into a fake match/diff
                    common = np.promote_types(a.dtype, b.dtype)
                    a, b = a.astype(common), b.astype(common)
                bad = ~((a == b) | (a.isna() & b.isna()))
                if bad.any():
                    i = bad.idxmax()
                    diffs.append(f"col {c}: {bad.sum()} mismatches, first at row {i}: {a[i]!r} != {b[i]!r}")
            if diffs:
                print(f"FAIL {name}: " + "; ".join(diffs))
                n_fail += 1
            else:
                print(f"PASS {name} ({len(got)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"ERROR {name}: {e}")
            n_fail += 1
    # rows-only checks for queries without oracle
    import os
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        if name not in oracle:
            try:
                n = len(pd.concat([pd.read_parquet(p) for p in glob.glob(f"{d}/*.parquet")]))
                print(f"ROWS {name}: {n} rows {'OK' if n > 0 else 'EMPTY!'}")
            except Exception as e:
                print(f"ERROR {name}: {e}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
