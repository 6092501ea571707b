"""Bit-identity pins for the r6 driver-local mem-side scorer
(streaming._score_mem_topk_local): the local path (default gate) must
return EXACTLY what the distributed repartition+mapInPandas+window path
returns (gate forced off via PYSEARCH_LOCAL_MAX_POSTINGS=0), including
row order and float bits, for score_arriving_batch (any/all/phrase) and
the NRT hybrid search_with_arrivals."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("PYSEARCH_TEST_SF", "/root/testdata/sf0.001")


def _webtext(spark):
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(F.col("text").isNotNull())
        .select(
            F.format_string("doc://docs/%09d", F.col("doc_id")).alias("url"),
            "text",
        )
    )


def _queries(spark):
    """Terms drawn from the corpus itself so every mode has live hits:
    q0 = the first doc's opening trigram (a real phrase), q1 = two common
    tokens, q_dud = a token that cannot exist."""
    first = _webtext(spark).orderBy("url").limit(1).collect()[0]["text"]
    toks = [t for t in first.split(" ") if t][:3]
    return {
        "q0": " ".join(toks),
        "q1": f"{toks[0]} {toks[-1]}",
        "q_dud": "zzqx_no_such_token",
    }


@pytest.mark.parametrize("mode", ["any", "all", "phrase"])
def test_score_arriving_batch_local_matches_distributed(
        spark, monkeypatch, mode):
    from pysearch.streaming import score_arriving_batch

    qs = _queries(spark)
    batch = _webtext(spark)
    monkeypatch.delenv("PYSEARCH_LOCAL_MAX_POSTINGS", raising=False)
    local = score_arriving_batch(batch, qs, k=10, analyzer="simple",
                                 mode=mode).collect()
    monkeypatch.setenv("PYSEARCH_LOCAL_MAX_POSTINGS", "0")
    dist = score_arriving_batch(batch, qs, k=10, analyzer="simple",
                                mode=mode).collect()
    assert [(r["qid"], r["url"], r["score"]) for r in local] \
        == [(r["qid"], r["url"], r["score"]) for r in dist]
    assert local  # the corpus-drawn queries must actually hit


def test_search_with_arrivals_local_matches_distributed(
        spark, tmp_path, monkeypatch):
    import pandas as pd
    from pyspark.sql import functions as F

    from pysearch.build import build_index
    from pysearch.query import Searcher
    from pysearch.streaming import search_with_arrivals

    qs = _queries(spark)
    wt = _webtext(spark)
    key = F.crc32(F.encode(F.col("text"), "utf-8")) % 5
    base, arrivals = wt.filter(key != 0), wt.filter(key == 0)
    ix = str(tmp_path / "ix")
    build_index(spark, base, ix, segment_size=128, analyzer="simple")

    monkeypatch.delenv("PYSEARCH_LOCAL_MAX_POSTINGS", raising=False)
    s_local = Searcher(spark, ix)
    res_local = search_with_arrivals(s_local, arrivals, qs, k=10,
                                     case_id="0")
    monkeypatch.setenv("PYSEARCH_LOCAL_MAX_POSTINGS", "0")
    s_dist = Searcher(spark, ix)
    s_dist.local_max_postings = 0  # index side distributed too
    res_dist = search_with_arrivals(s_dist, arrivals, qs, k=10,
                                    case_id="0")
    pd.testing.assert_frame_equal(
        res_local.reset_index(drop=True), res_dist.reset_index(drop=True),
        check_exact=True)
    assert len(res_local) > 0
