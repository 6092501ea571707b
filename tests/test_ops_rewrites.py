"""Focused tests for the r6 map-only/pivot rewrites of the registry text
ops: compare the array-native Spark forms against INDEPENDENT pure-Python
implementations (collections.Counter over the same whitespace tokens) on
the sf0.001 documents table, exactly — not the same SQL run twice.

(test_entry.py::test_query_matches_oracle already pins each op against its
frozen DuckDB oracle with the driver's typed exact comparison; this file
additionally pins the novel internals — the sorted-run-max bigram mode and
the single-pass BM25 pivot — against a from-scratch reference.)"""

import math
import os
import sys
from collections import Counter

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("PYSEARCH_TEST_SF", "/root/testdata/sf0.001")


def _docs_pdf(spark):
    return (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text", "n_chars").toPandas()
    )


def _toks(text):
    return [t for t in (text or "").split(" ") if t != ""]


def test_tx_repetition_matches_python(spark):
    """The array_sort + run-length aggregate == Counter-based bigram mode."""
    from pysearch.ops import OPS

    got = {r["doc_id"]: r for r in OPS["tx_repetition"][0](
        spark, SF_DIR).collect()}
    pdf = _docs_pdf(spark)
    n_checked = 0
    for _, row in pdf.iterrows():
        toks = _toks(row["text"])
        if not toks:
            assert row["doc_id"] not in got
            continue
        n_tok = len(toks)
        n_uniq = len(set(toks))
        bigrams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        top2g = max(Counter(bigrams).values()) if bigrams else 0
        r = got[row["doc_id"]]
        # Python round() is banker's; pin the engine-side half-up instead
        assert abs(r["dup_tok_frac_r"] - (1 - n_uniq / n_tok)) < 5.1e-5
        assert abs(r["top2g_frac_r"] - (top2g * 2 / n_tok)) < 5.1e-5
        keep = (r["dup_tok_frac_r"] <= 0.6) and (r["top2g_frac_r"] <= 0.15)
        assert r["keep_i"] == int(keep)
        n_checked += 1
    assert n_checked == len(got) > 0


def test_tx_quality_matches_python(spark):
    from pysearch.ops import OPS

    got = {r["doc_id"]: r for r in OPS["tx_quality"][0](
        spark, SF_DIR).collect()}
    pdf = _docs_pdf(spark)
    n_checked = 0
    for _, row in pdf.iterrows():
        toks = _toks(row["text"])
        if not toks:
            assert row["doc_id"] not in got
            continue
        r = got[row["doc_id"]]
        assert r["n_tok"] == len(toks)
        assert r["n_chars"] == row["n_chars"]
        chars = sum(len(t) for t in toks)
        assert abs(r["avg_tok_len_r"] - chars / len(toks)) < 5.1e-5
        assert abs(r["uniq_ratio_r"] - len(set(toks)) / len(toks)) < 5.1e-5
        n_checked += 1
    assert n_checked == len(got) > 0


def test_t1_bm25_pivot_matches_python(spark):
    """The single-pass pivoted BM25 == a from-scratch python BM25 with the
    same (k1=1.2, b=0.75) arithmetic, same (score desc, doc_id) top-10."""
    from pysearch.ops import OPS, _BM25_TERMS

    rows = OPS["t1_bm25_top10"][0](spark, SF_DIR).collect()
    pdf = _docs_pdf(spark)
    docs = {}
    for _, row in pdf.iterrows():
        toks = _toks(row["text"])
        if toks:
            docs[row["doc_id"]] = Counter(toks), len(toks)
    n = float(len(docs))
    avgdl = sum(dl for _, dl in docs.values()) / n
    df = {t: sum(1 for c, _ in docs.values() if t in c) for t in _BM25_TERMS}
    scored = []
    for doc_id, (c, dl) in docs.items():
        s = 0.0
        for t in _BM25_TERMS:
            tf = float(c.get(t, 0))
            if tf > 0:
                idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
                s += idf * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
        if s > 0:
            scored.append((doc_id, s))
    scored.sort(key=lambda p: (-p[1], p[0]))
    expect = scored[:10]
    assert [r["doc_id"] for r in rows] == [d for d, _ in expect]
    for r, (_, s) in zip(rows, expect):
        assert abs(r["score_r"] - s) < 5.1e-5, (r, s)


def test_tx_decontaminate_split_is_lossless(spark):
    """Pushing the %97 split below the fingerprinting returns the same
    rows as fingerprint-then-filter (fingerprints are per-doc)."""
    from pyspark.sql import functions as F

    from pysearch.ops import OPS, _FP_K, _FP_W, _HEX_SPARK, _t

    toks = _t(spark, SF_DIR, "documents").select(
        "doc_id", F.expr("filter(split(text, ' '), x -> x != '')").alias("l")
    ).filter(F.size("l") >= _FP_K)
    grams = toks.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(1, size(l) - {_FP_K} + 1),"
                f" i -> concat_ws(' ', slice(l, i, {_FP_K})))"
            )
        ).alias("pos", "g"),
    ).select(
        "doc_id", F.floor(F.col("pos") / _FP_W).alias("win"),
        F.expr(_HEX_SPARK.format(x="g")).alias("hv"),
    )
    fps = (grams.groupBy("doc_id", "win").agg(F.min("hv").alias("fp"))
           .select("doc_id", "fp").distinct())
    evalf = fps.filter(F.col("doc_id") % 97 == 0).select("fp").distinct()
    expect = sorted(
        (r["doc_id"], r["n_shared"])
        for r in fps.filter(F.col("doc_id") % 97 != 0)
        .join(F.broadcast(evalf), "fp")
        .groupBy("doc_id").agg(F.countDistinct("fp").alias("n_shared"))
        .orderBy(F.desc("n_shared"), "doc_id").limit(50).collect()
    )
    got = sorted(
        (r["doc_id"], r["n_shared"])
        for r in OPS["tx_decontaminate_top50"][0](spark, SF_DIR).collect()
    )
    assert got == expect and len(got) > 0
