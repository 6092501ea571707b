"""Mirror of the driver's correctness gate: run every queries() entry on
Spark AND its oracle_sql() on DuckDB over the same parquet tables, compare
row count, sorted column names, and order-insensitive values."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("PYSEARCH_TEST_SF", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                # the "f:" prefix keeps the int/float distinction: the
                # driver's gate hashes TYPED values, so a DuckDB HUGEINT
                # materializing as float64 (27939.0) must NOT compare equal
                # to Spark's int64 27939 here either (round-1 bug class)
                if math.isnan(v):
                    v = "f:nan"
                else:
                    v = f"f:{v:.9g}"
            vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_matches_oracle(spark, duck, name):
    q = entrymod.queries()[name]
    sqls = entrymod.oracle_sql()
    sdf = q(spark, SF_DIR)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns
    if name not in sqls:
        assert len(spark_rows) >= 0  # rows-only check
        return
    rel = duck.sql(sqls[name])
    duck_rows = rel.fetchall()
    duck_cols = [d[0] for d in rel.description]
    assert sorted(spark_cols) == sorted(duck_cols), (spark_cols, duck_cols)
    assert len(spark_rows) == len(duck_rows), (len(spark_rows), len(duck_rows))
    a = _normalize(spark_rows, spark_cols)
    b = _normalize(duck_rows, duck_cols)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


def test_bench_query_names_exist():
    """Every bench-tracked ops query must exist in the registry (a typo'd
    OPS_QUERIES entry would otherwise only fail mid-bench on the driver)."""
    import bench
    from pysearch.ops import OPS

    missing = [n for n in bench.OPS_QUERIES if n not in OPS]
    assert not missing, missing


def test_normalize_is_type_strict():
    # r1 regression: DuckDB HUGEINT -> float64 27939.0 must NOT equal Spark
    # int64 27939 (reverting the ::BIGINT oracle casts must fail locally)
    assert _normalize([(27939.0,)], ["x"]) != _normalize([(27939,)], ["x"])
    assert _normalize([(1.5,)], ["x"]) == _normalize([(1.5,)], ["x"])


def test_gram_pair_counts_salting_invariant(spark):
    # the hot/cold salted gram self-join is value-identical to the plain
    # join for any (n_salts, hot_df)
    from pysearch.ops import gram_pair_counts

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(60)
    from pyspark.sql import functions as F

    grams = docs.select(
        "doc_id",
        F.explode(F.expr("filter(split(text, ' '), x -> x != '')")).alias("g"),
    ).distinct()
    plain = gram_pair_counts(grams, n_salts=1, hot_df=10**9)  # nothing hot
    salted = gram_pair_counts(grams, n_salts=4, hot_df=1)  # everything hot
    rows_p = sorted(tuple(r) for r in plain.collect())
    rows_s = sorted(tuple(r) for r in salted.collect())
    assert rows_p == rows_s and len(rows_p) > 0


def test_entry_flagship(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"doc_id", "url", "score", "spans"} <= set(df.columns)
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
