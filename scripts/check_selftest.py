#!/usr/bin/env python3
"""Self-test for check.py's dtype strictness (round-8 lesson): a Spark
result with int64 values against a DuckDB oracle whose sum(CASE...) is
HUGEINT (pandas float64) must FAIL, because the driver hashes rendered
values (58580 != 58580.0). Exits 0 iff check.py catches the skew."""
import json, os, subprocess, sys, tempfile
import pandas as pd

with tempfile.TemporaryDirectory() as tmp:
    sf = os.path.join(tmp, "sf"); out = os.path.join(tmp, "out")
    os.makedirs(sf); os.makedirs(os.path.join(out, "q_skew"))
    # minimal "orders" table the oracle view layer expects
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        pd.DataFrame({"o_orderkey": [1, 2, 3]}).to_parquet(f"{sf}/{t}.parquet")
    # Spark-side result: int64 (what a Spark sum(when...) emits)
    pd.DataFrame({"n": pd.array([3], dtype="int64")}).to_parquet(
        os.path.join(out, "q_skew", "part-0.parquet"))
    # oracle: DuckDB sum(CASE...) -> HUGEINT -> pandas float64
    json.dump({"q_skew":
        "SELECT sum(CASE WHEN o_orderkey > 0 THEN 1 ELSE 0 END) AS n FROM orders"},
        open(os.path.join(out, "oracle_sql.json"), "w"))
    # same-kind width skew that the old b.astype(a.dtype) MASKED:
    # int32 result 1 vs int64 oracle 2^32+1 — the downcast wrapped the
    # oracle value to 1 and false-PASSed; promoted comparison must FAIL
    os.makedirs(os.path.join(out, "q_wrap"))
    pd.DataFrame({"n": pd.array([1], dtype="int32")}).to_parquet(
        os.path.join(out, "q_wrap", "part-0.parquet"))
    oracle = json.load(open(os.path.join(out, "oracle_sql.json")))
    oracle["q_wrap"] = "SELECT CAST(4294967297 AS BIGINT) AS n"
    json.dump(oracle, open(os.path.join(out, "oracle_sql.json"), "w"))
    r = subprocess.run([sys.executable,
                        os.path.join(os.path.dirname(__file__), "check.py"),
                        out, sf], capture_output=True, text=True)
    fail_skew = [l for l in r.stdout.splitlines() if l.startswith("FAIL q_skew")]
    fail_wrap = [l for l in r.stdout.splitlines() if l.startswith("FAIL q_wrap")]
    ok_skew = r.returncode != 0 and fail_skew and "dtype" in fail_skew[0]
    ok_wrap = bool(fail_wrap) and "mismatch" in fail_wrap[0]
    if ok_skew and ok_wrap:
        print("OK: check.py rejects int64-vs-float64 skew:", fail_skew[0])
        print("OK: check.py rejects wrap-masked width skew:", fail_wrap[0])
        sys.exit(0)
    if not ok_skew:
        print("SELFTEST FAILED: check.py accepted a dtype-skewed result\n", r.stdout)
    if not ok_wrap:
        print("SELFTEST FAILED: check.py wrap-masked an int-width mismatch\n", r.stdout)
    sys.exit(1)
