"""Local stand-in for the driver's DuckDB cross-check: run selected ops'
Spark queries AND their oracle SQL side-by-side and compare row count,
column names, and values (columns sorted by name, rows sorted by all
columns — the driver's compare shape).

    python tools/oracle_check.py [sf_dir] [op ...]   # default: all ops
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def compare(name, spark_df, duck_df):
    import numpy as np
    import pandas as pd

    a = spark_df.toPandas()
    b = duck_df
    if sorted(a.columns) != sorted(b.columns):
        return f"SCHEMA: spark={sorted(a.columns)} duck={sorted(b.columns)}"
    cols = sorted(a.columns)
    a, b = a[cols], b[cols]
    if len(a) != len(b):
        return f"ROWS: spark={len(a)} duck={len(b)}"
    a = a.sort_values(cols, kind="stable").reset_index(drop=True)
    b = b.sort_values(cols, kind="stable").reset_index(drop=True)
    for c in cols:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            av = av.astype(float).to_numpy()
            bv = bv.astype(float).to_numpy()
            bad = ~np.isclose(av, bv, rtol=1e-9, atol=1e-9, equal_nan=True)
        else:
            bad = av.astype(str).to_numpy() != bv.astype(str).to_numpy()
        if bad.any():
            i = int(np.argmax(bad))
            return (f"VALUES col={c} row={i}: "
                    f"spark={a[c].iloc[i]!r} duck={b[c].iloc[i]!r}")
    return None


def main():
    import duckdb

    from pysearch.ops import OPS
    from pysearch.session import build_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or [n for n, (_f, s) in OPS.items() if s is not None]

    spark = build_spark(master="local[8]", app_name="oracle-check",
                        shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    failed = 0
    for name in names:
        fn, sql = OPS[name]
        if sql is None:
            print(f"{name}: SKIP (no oracle)")
            continue
        try:
            sdf = fn(spark, sf_dir)
            ddf = con.sql(sql).df()
            err = compare(name, sdf, ddf)
        except Exception as e:  # noqa: BLE001
            err = f"EXC: {type(e).__name__}: {e}"
        if err:
            failed += 1
            print(f"{name}: FAIL {err}")
        else:
            print(f"{name}: ok")
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
