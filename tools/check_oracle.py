"""Local replica of the driver's correctness gate.

Runs every declared query through Spark AND its DuckDB oracle on the same
parquet, compares row count, column names, and order-insensitive values.
Usage:  python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_result(sql: str, sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    return cols, rows


def norm_rows(cols, rows):
    """Sort columns by name, then rows, floats canonicalized."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm_cell(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return v
        return v

    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=lambda t: tuple(str(x) for x in t))


def compare(name, spark, sf_dir, fn, sql):
    t0 = time.time()
    sdf = fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    t_spark = time.time() - t0
    t0 = time.time()
    d_cols, d_rows = duck_result(sql, sf_dir)
    t_duck = time.time() - t0

    ns_cols, ns_rows = norm_rows(s_cols, s_rows)
    nd_cols, nd_rows = norm_rows(d_cols, d_rows)
    problems = []
    if ns_cols != nd_cols:
        problems.append(f"cols spark={ns_cols} duck={nd_cols}")
    if len(ns_rows) != len(nd_rows):
        problems.append(f"rowcount spark={len(ns_rows)} duck={len(nd_rows)}")
    elif ns_cols == nd_cols and ns_rows != nd_rows:
        n_bad, example, max_d = 0, None, 0.0
        for a, b in zip(ns_rows, nd_rows):
            if a != b:
                n_bad += 1
                if example is None:
                    example = (a, b)
                for x, y in zip(a, b):
                    if isinstance(x, float) and isinstance(y, float):
                        max_d = max(max_d, abs(x - y))
        problems.append(f"values {n_bad}/{len(ns_rows)} rows differ, max_float_diff={max_d:.3e}, e.g. {example}")
    status = "OK " if not problems else "FAIL"
    print(f"{status} {name:32s} rows={len(ns_rows):6d} spark={t_spark:6.2f}s duck={t_duck:6.2f}s")
    for p in problems:
        print(f"     {p}")
    return not problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import __spark_entry__ as e
    from pyspark_weather_forecasting_gsod_spark.session import get_spark

    spark = get_spark("oracle-check")
    qs, oracles = e.queries(), e.oracle_sql()

    print("== entry smoke ==")
    t0 = time.time()
    res = e.entry(spark)
    n = res.count()
    print(f"entry rows={n} schema={res.schema.simpleString()} ({time.time()-t0:.2f}s)")
    assert n >= 0

    print(f"== oracle compare @ {sf_dir} ==")
    ok = True
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            sdf = fn(spark, sf_dir)
            n = sdf.count()
            print(f"ROWS-ONLY {name:26s} rows={n}")
            continue
        ok = compare(name, spark, sf_dir, fn, oracles[name]) and ok
    print("ALL OK" if ok else "FAILURES PRESENT")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
