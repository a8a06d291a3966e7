#!/usr/bin/env python3
"""Local replay of the driver's correctness gate (dev tooling only —
not part of the shipped library). Usage:

    python3 tools/selfcheck.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet (Spark result), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sfDir
tables, sorts columns by name and rows by value, and reports per-query
match/mismatch.
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
        # normalize -0.0 and integral floats
        if v == 0:
            return "0.0"
        return repr(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return repr(v)


def norm_type(t):
    """Collapse dtypes to the classes the driver's pandas-level compare
    distinguishes: int widths all render the same, but HUGEINT (int128,
    from un-cast DuckDB integer sums) and DECIMAL leave the int64 path
    and change the rendered value."""
    s = str(t)
    if s in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if s in ("FLOAT", "DOUBLE"):
        return "float"
    return s


def canon(cols, rows, types):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out, [norm_type(types[i]) for i in order]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            s_cols, s_rows, s_types = canon(
                spark_rel.columns, spark_rel.fetchall(), spark_rel.types)
            duck_rel = con.sql(sql)
            d_cols, d_rows, d_types = canon(
                duck_rel.columns, duck_rel.fetchall(), duck_rel.types)
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_bad += 1
            continue
        if s_cols != d_cols:
            print(f"FAIL {name}: cols spark={s_cols} duck={d_cols}")
            n_bad += 1
        # dtype-strict, like the driver's hash: an un-cast DuckDB integer
        # sum() is HUGEINT and must fail even when values print the same
        elif s_types != d_types:
            print(f"FAIL {name}: dtypes spark={s_types} duck={d_types}")
            n_bad += 1
        elif len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rows spark={len(s_rows)} duck={len(d_rows)}")
            n_bad += 1
        elif s_rows != d_rows:
            diffs = [i for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b]
            i = diffs[0]
            print(f"FAIL {name}: {len(diffs)}/{len(s_rows)} rows differ; first @{i}:")
            print(f"  spark: {s_rows[i]}")
            print(f"  duck : {d_rows[i]}")
            n_bad += 1
        else:
            print(f"OK   {name} ({len(s_rows)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
