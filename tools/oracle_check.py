#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir with an oracle in oracle_sql.json:
run the oracle in DuckDB over views of the sfDir parquet tables, load the
Spark result parquet, sort columns by name, and compare row/schema/values
(rows compared as multisets after lexicographic sort; NaN == NaN).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return repr(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    import os
    for t in TABLES:
        # driver testdata ships single-file tables; SfScaler cuts are
        # Spark-written DIRECTORIES of part files — glob those
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        try:
            spark_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            spark_cols = list(spark_rel.columns)
            spark_rows = spark_rel.fetchall()
            oracle_rel = con.sql(sql)
            oracle_cols = list(oracle_rel.columns)
            oracle_rows = oracle_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_bad += 1
            continue
        # EMITTED-TYPE GUARD (round 12): a bare SUM() in an oracle's
        # final SELECT is HUGEINT (INT128) in DuckDB. fetchall() hides
        # that (Python ints repr the same), but the driver's own compare
        # path maps HUGEINT differently across DuckDB/pandas versions —
        # the round-11 red-row class. Fail loudly here so the exposure
        # never reaches the driver again.
        exotic = [(c, str(t)) for c, t in
                  zip(oracle_rel.columns, oracle_rel.types)
                  if "HUGEINT" in str(t) or str(t).startswith("DECIMAL")
                  or str(t).startswith("U")]
        if exotic:
            print(f"FAIL {name}: oracle emits non-portable types {exotic}"
                  " — CAST the final column (AS BIGINT / AS DOUBLE)")
            n_bad += 1
            continue
        if sorted(spark_cols) != sorted(oracle_cols):
            print(f"FAIL {name}: cols spark={sorted(spark_cols)} oracle={sorted(oracle_cols)}")
            n_bad += 1
            continue
        if len(spark_rows) != len(oracle_rows):
            print(f"FAIL {name}: rowcount spark={len(spark_rows)} oracle={len(oracle_rows)}")
            n_bad += 1
            continue
        a = norm_rows(spark_cols, spark_rows)
        b = norm_rows(oracle_cols, oracle_rows)
        if a != b:
            diffs = [(x, y) for x, y in zip(a, b) if x != y]
            print(f"FAIL {name}: {len(diffs)}/{len(a)} rows differ; first: ")
            print(f"   spark : {diffs[0][0]}")
            print(f"   oracle: {diffs[0][1]}")
            n_bad += 1
            continue
        print(f"ok   {name} ({len(a)} rows)")
        n_ok += 1
    # queries without oracles: rows-only
    import os
    for name in sorted(os.listdir(out_dir)):
        if name in oracles or not os.path.isdir(f"{out_dir}/{name}"):
            continue
        try:
            n = con.sql(f"SELECT count(*) FROM '{out_dir}/{name}/*.parquet'").fetchone()[0]
            print(f"rows {name}: {n}{'  <-- EMPTY' if n == 0 else ''}")
        except Exception as e:
            print(f"rows {name}: unreadable {e}")
    print(f"\n{n_ok} ok / {n_bad} fail of {len(oracles)} oracled")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
