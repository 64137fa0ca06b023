#!/usr/bin/env python3
"""Local pre-verification of SparkEntry oracles, mimicking the driver's
DuckDB compare: for each query, load the Spark result parquet (written by
`sbt "runMain graft.Verify <sfDir> <outDir>"`) and the DuckDB result of
the oracle SQL over the same tables, sort columns by name, sort rows, and
compare values exactly.

Usage: python3 scripts/check_oracles.py <sfDir> <outDir>
"""
import json
import math
import sys
import os

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def dtype_mismatches(con, name, sql, out_dir):
    """Compare pandas dtypes of the oracle result vs the Spark parquet.

    The driver's hasher is typed (pandas-level): DuckDB types sum(BIGINT)
    as HUGEINT, which pandas materializes as float64, while the Spark
    parquet column is int64 — values compare equal as strings but the
    typed hash differs (the r5–r7 q_source_report failure mode). Reading
    BOTH sides through duckdb's .df() makes the check symmetric: any
    dtype difference reflects a real type difference, not a reader quirk.
    """
    spark_df = con.execute(
        f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
    duck_df = con.execute(sql).df()
    bad = []
    for col in spark_df.columns:
        if col not in duck_df.columns:
            continue  # column-set mismatch is reported separately
        s, d = str(spark_df[col].dtype), str(duck_df[col].dtype)
        if s != d:
            bad.append(f"{col}: spark={s} duck={d}")
    return bad


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        # driver fixtures are single files; derived fixtures (the scale
        # probe's Nx dirs) are Spark-written DIRECTORIES of part files
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            spark_rel = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            spark_cols = [d[0] for d in spark_rel.description]
            spark_rows = spark_rel.fetchall()
            duck_rel = con.execute(sql)
            duck_cols = [d[0] for d in duck_rel.description]
            duck_rows = duck_rel.fetchall()
            bad_dtypes = dtype_mismatches(con, name, sql, out_dir)
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if sorted(spark_cols) != sorted(duck_cols):
            print(f"FAIL {name}: columns spark={sorted(spark_cols)} "
                  f"duck={sorted(duck_cols)}")
            n_fail += 1
            continue
        if bad_dtypes:
            print(f"FAIL {name}: dtype mismatch " + "; ".join(bad_dtypes))
            n_fail += 1
            continue
        a, b = canon(spark_rows, spark_cols), canon(duck_rows, duck_cols)
        if a == b:
            print(f"PASS {name} ({len(a)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: spark {len(a)} rows vs duck {len(b)} rows")
            sa, sb = set(a), set(b)
            for r in list(sa - sb)[:3]:
                print(f"  spark-only: {r}")
            for r in list(sb - sa)[:3]:
                print(f"  duck-only:  {r}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
