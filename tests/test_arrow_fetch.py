"""Pins for the driver-direct arrow block fetch (query._read_blocks_arrow):
the fetched frame must be byte-identical to the Spark scan-only fetch over
the same commit dirs/filters, and every local-path mode must return the
same results with the arrow fetch on (default) and off
(PYSEARCH_LOCAL_ARROW=0)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def searcher(spark, tmp_path_factory):
    """Case-7 index WITH positions so phrase/near exercise the pos-bearing
    arrow fetch too."""
    from pysearch import corpus
    from pysearch.build import build_index
    from pysearch.query import Searcher

    d = str(tmp_path_factory.mktemp("arrow_ix") / "ix")
    df = corpus.webtext_df(spark, cases=[c for c in corpus.CASES
                                         if c[0] == 7])
    build_index(spark, df, d, segment_size=64, store_positions=True)
    return Searcher(spark, d)


def test_arrow_fetch_bytes_match_spark(spark, searcher):
    from pyspark.sql import functions as F

    from pysearch.build import term_bucket
    from pysearch.query import Searcher

    s = searcher
    terms = sorted(s._analyze("a cornucopia of"))
    buckets = sorted({term_bucket(t, s.n_buckets) for t in terms})
    for cols in (Searcher._LOCAL_COLS, Searcher._LOCAL_COLS_POS):
        blocks = s.postings.filter(
            (F.col("case_id") == "7")
            & F.col("term_bucket").isin(s._bucket_lit(buckets))
            & F.col("term").isin(terms))
        a = blocks.select(*cols).toPandas()
        b = s._read_blocks_arrow("7", terms, cols)
        key = ["segment_id", "term", "n"]
        a = a.sort_values(key, kind="stable").reset_index(drop=True)
        b = b.sort_values(key, kind="stable").reset_index(drop=True)
        assert len(a) == len(b) > 0
        for c in cols:
            av, bv = a[c], b[c]
            if c.endswith("_bin"):
                assert all((y is None) if x is None
                           else bytes(x) == bytes(y)
                           for x, y in zip(av, bv)), c
            else:
                ok = (av == bv) | (av.isna() & bv.isna())
                assert ok.all(), c


@pytest.mark.parametrize("query,mode", [
    ("a cornucopia of", "any"),
    ("a cornucopia of", "all"),
    ("a cornucopia of", "phrase"),
    ('"a cornucopia" ~3', None),  # parsed near via search_ids default
])
def test_local_results_identical_with_arrow_on_off(
        searcher, monkeypatch, query, mode):
    s = searcher
    kw = {"k": 10, "case_id": "7"}
    if mode is not None:
        kw["mode"] = mode
    monkeypatch.delenv("PYSEARCH_LOCAL_ARROW", raising=False)
    on = s.search_ids(query, **kw)
    monkeypatch.setenv("PYSEARCH_LOCAL_ARROW", "0")
    off = s.search_ids(query, **kw)
    assert on.equals(off)
    assert len(on) > 0


def test_count_and_batch_identical_with_arrow_on_off(searcher, monkeypatch):
    s = searcher
    monkeypatch.delenv("PYSEARCH_LOCAL_ARROW", raising=False)
    c_on = s.count("a cornucopia of", case_id="7")
    m_on = s.search_ids_many({"a": "cornucopia", "b": "a cornucopia of"},
                             k=5, case_id="7")
    monkeypatch.setenv("PYSEARCH_LOCAL_ARROW", "0")
    c_off = s.count("a cornucopia of", case_id="7")
    m_off = s.search_ids_many({"a": "cornucopia", "b": "a cornucopia of"},
                              k=5, case_id="7")
    assert c_on == c_off > 0
    assert m_on.equals(m_off)


def test_segment_metrics_local_matches_spark(spark, searcher):
    """The driver-side pyarrow lineage-metrics aggregate must produce the
    same per-(case, segment) sums as the distributed groupBy it replaces."""
    import os as _os

    from pyspark.sql import functions as F

    from pysearch.build import _segment_metrics_local

    commit_dir = searcher._postings_commit_dirs[0]
    local = _segment_metrics_local(commit_dir)
    assert local is not None and len(local) > 0
    spark_rows = (
        spark.read.parquet(commit_dir)
        .groupBy("case_id", "segment_id")
        .agg(F.count("*").alias("n_blocks"), F.sum("n").alias("n_postings"),
             F.sum("n_bytes").alias("bytes"))
        .collect()
    )
    a = sorted((str(r.case_id), int(r.segment_id), int(r.n_blocks),
                int(r.n_postings), int(r.bytes)) for r in local)
    b = sorted((str(r.case_id), int(r.segment_id), int(r.n_blocks),
                int(r.n_postings), int(r.bytes)) for r in spark_rows)
    assert a == b
    # env kill-switch falls back to the distributed path
    _os.environ["PYSEARCH_LOCAL_ARROW"] = "0"
    try:
        assert _segment_metrics_local(commit_dir) is None
    finally:
        del _os.environ["PYSEARCH_LOCAL_ARROW"]
