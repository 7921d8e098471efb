#!/usr/bin/env python3
"""Targeted DuckDB replay for scaled-cut probes: only the named rows,
with per-row wall time and an optional per-row timeout.

Usage: python3 tools/probe_check.py <sfDir> <verifyOutDir> <row1,row2,...> [timeout_sec]

Same compare semantics as oracle_check.py (sorted-column multiset with
full-precision floats, NaN == NaN, exotic-type guard), but scoped so a
probe run never pays the full 280-oracle replay. A row that exceeds the
timeout is reported as TIMEOUT with its elapsed time, not an error.
"""
import json
import math
import multiprocessing as mp
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return repr(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)


def run_one(sf_dir, out_dir, name, sql, q):
    import os
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    try:
        spark_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        spark_cols = list(spark_rel.columns)
        spark_rows = spark_rel.fetchall()
        oracle_rel = con.sql(sql)
        oracle_cols = list(oracle_rel.columns)
        oracle_rows = oracle_rel.fetchall()
        exotic = [(c, str(t)) for c, t in
                  zip(oracle_rel.columns, oracle_rel.types)
                  if "HUGEINT" in str(t) or str(t).startswith("DECIMAL")
                  or str(t).startswith("U")]
        if exotic:
            q.put(("fail", f"exotic types {exotic}"))
            return
        if sorted(spark_cols) != sorted(oracle_cols):
            q.put(("fail", f"cols spark={sorted(spark_cols)} oracle={sorted(oracle_cols)}"))
            return
        if len(spark_rows) != len(oracle_rows):
            q.put(("fail", f"rowcount spark={len(spark_rows)} oracle={len(oracle_rows)}"))
            return
        a = norm_rows(spark_cols, spark_rows)
        b = norm_rows(oracle_cols, oracle_rows)
        if a != b:
            diffs = [(x, y) for x, y in zip(a, b) if x != y]
            q.put(("fail", f"{len(diffs)}/{len(a)} rows differ; first spark={diffs[0][0]} oracle={diffs[0][1]}"))
            return
        q.put(("ok", f"{len(a)} rows"))
    except Exception as e:
        q.put(("fail", f"exception {e}"))


def main(sf_dir, out_dir, names, timeout):
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    for name in names:
        if name not in oracles:
            print(f"skip {name}: no oracle")
            continue
        q = mp.Queue()
        p = mp.Process(target=run_one, args=(sf_dir, out_dir, name, oracles[name], q))
        t0 = time.time()
        p.start()
        p.join(timeout)
        dt = time.time() - t0
        if p.is_alive():
            p.terminate()
            p.join()
            print(f"TIMEOUT {name} after {dt:.0f} s")
            continue
        # q.empty() can race the queue's feeder thread right after the
        # child exits (the put is buffered, not yet visible) — block with
        # a short timeout instead of trusting the emptiness check
        try:
            status, msg = q.get(timeout=10)
        except Exception:
            status, msg = "fail", "no result (crashed)"
        print(f"{status:4} {name} ({msg}) in {dt:.1f} s")


if __name__ == "__main__":
    names = sys.argv[3].split(",")
    timeout = float(sys.argv[4]) if len(sys.argv) > 4 else 900.0
    main(sys.argv[1], sys.argv[2], names, timeout)
