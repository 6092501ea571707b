"""Tombstoned deletes + compaction purge (pysearch/delete.py, compact.py).

The reference has no delete API — its index is a per-corpus artifact,
rebuilt from scratch (doclib exposes only AddDocuments/Search,
/root/reference/internal/doclib). For a 100 TB training-data index,
removing contaminated/opted-out docs without a rebuild is mandatory, so
this engine adds Lucene's two-phase deleted-docs model:

1. pending tombstones suppress docs at query time WITHOUT touching corpus
   stats (surviving docs' scores are unchanged — pinned here);
2. ``compact_index`` physically purges: post-purge ranks AND scores are
   bit-identical to a fresh build of the surviving corpus (pinned here,
   including the phrase/positions path), committed as one atomic snapshot
   generation flip (crash-before-commit pinned here).
"""

import os

import pytest

from pysearch import corpus
from pysearch.build import build_index
from pysearch.compact import compact_index, recover_compaction
from pysearch.delete import delete_docs
from pysearch.lineage import IndexLayout
from pysearch.query import Searcher


def _url_of(spark, d):
    lay = IndexLayout(d)
    return {
        (str(r["case_id"]), int(r["doc_id"])): r["url"]
        for r in lay.read_commits(spark, lay.doc_map)
        .select("case_id", "doc_id", "url").collect()
    }


def _results_by_url(spark, d, queries, k=50):
    """{name: [(url, score), ...]} — url-keyed so purged-index results are
    comparable with a fresh build's (doc ids are reassigned densely by a
    fresh build; urls are the stable identity)."""
    s = Searcher(spark, d)
    urls = _url_of(spark, d)
    out = {}
    for name, (term, case_id, mode) in queries.items():
        h = s.search_ids(term, k=k, case_id=case_id, mode=mode)
        out[name] = [
            (urls[(case_id, int(i))], float(sc))
            for i, sc in zip(h["doc_id"], h["score"])
        ]
    return out


def test_pending_delete_suppresses_without_rescoring(spark, tmp_path):
    """Phase 1 (tombstone only): deleted docs vanish from results
    immediately, but corpus stats keep their pre-delete values, so every
    SURVIVING doc's score is bit-unchanged (Lucene deleted-docs
    semantics).  Also pins: idempotent re-delete counts 0, staleness
    propagation to live Searchers, and arg validation."""
    d = str(tmp_path / "tomb_ix")
    build_index(spark, corpus.webtext_df(
        spark, cases=[(6, "in the realm of", 120, 200)]), d,
        segment_size=32)

    live = Searcher(spark, d)  # default on_stale="refresh"
    before = live.search_ids("realm", k=30, case_id="6")
    urls = _url_of(spark, d)
    victims = [urls[("6", int(i))] for i in before["doc_id"][:3]]

    assert delete_docs(spark, d, urls=victims) == 3
    assert delete_docs(spark, d, urls=victims) == 0  # already tombstoned

    assert live.stale()  # manifest bump reached the live Searcher
    after = live.search_ids("realm", k=30, case_id="6")
    gone = {int(i) for i in before["doc_id"][:3]}
    assert not gone & {int(i) for i in after["doc_id"]}
    # surviving docs: identical scores (stats untouched until compaction)
    before_scores = {int(i): float(s) for i, s in
                     zip(before["doc_id"], before["score"])}
    for i, s in zip(after["doc_id"], after["score"]):
        if int(i) in before_scores:
            assert float(s) == before_scores[int(i)]

    # a brand-new Searcher picks the tombstones up from disk too
    h2 = Searcher(spark, d).search_ids("realm", k=30, case_id="6")
    assert list(h2["doc_id"]) == list(after["doc_id"])
    assert list(h2["score"]) == list(after["score"])

    with pytest.raises(ValueError, match="exactly one"):
        delete_docs(spark, d, urls=victims, predicate="doc_id = 1")
    with pytest.raises(ValueError, match="exactly one"):
        delete_docs(spark, d)


def test_pending_tombstone_cap_enforced(spark, tmp_path):
    """The "compact before tombstones grow" operating rule is an enforced
    bound, not advice: a Searcher refusing to load a pending-delete set
    larger than max_pending_tombstones fails with an error naming
    compact-index; compaction (physical purge) clears the condition."""
    d = str(tmp_path / "tomb_cap_ix")
    build_index(spark, corpus.webtext_df(
        spark, cases=[(6, "in the realm of", 40, 200)]), d, segment_size=16)
    urls = sorted({u for (_c, _i), u in _url_of(spark, d).items()})
    assert delete_docs(spark, d, urls=urls[:5]) == 5

    s = Searcher(spark, d)  # default cap: loads fine
    assert len(s.search_ids("realm", k=50, case_id="6"))
    s.max_pending_tombstones = 3
    with pytest.raises(RuntimeError, match="compact-index"):
        s.refresh()
    # the error's escape hatch must work on FIRST construction (the cap
    # fires inside __init__ where no instance exists to mutate)
    with pytest.raises(RuntimeError, match="max_pending_tombstones=N"):
        Searcher(spark, d, max_pending_tombstones=3)
    s2 = Searcher(spark, d, max_pending_tombstones=5)
    assert len(s2.search_ids("realm", k=50, case_id="6"))

    compact_index(spark, d)  # purges tombstones physically
    s.refresh()  # same tightened cap, zero pending: loads
    h = s.search_ids("realm", k=50, case_id="6")
    assert set(_url_of(spark, d)[("6", int(i))]
               for i in h["doc_id"]).isdisjoint(urls[:5])


QUERIES = {
    "any": ("in the realm of", "6", "any"),
    "conj": ("in the realm", "6", "all"),
    "phrase": ("in the realm of", "6", "phrase"),
    "other_case": ("be the person who", "3", "any"),
}


def test_purge_equals_fresh_build(spark, tmp_path):
    """Phase 2 (physical purge): after delete + compact, every query mode
    (disjunctive, conjunctive, exact phrase — exercising the positions
    re-encode) returns the SAME (url, score) list as a from-scratch build
    of the surviving corpus; the index verifies clean (including block
    CRCs over the re-encoded payloads); tombstones are emptied; manifest
    doc counts are re-pinned; appends keep working afterwards."""
    from pysearch.verify import verify_index

    d = str(tmp_path / "purge_ix")
    cases = [(3, "be the person who", 50, 100),
             (6, "in the realm of", 500, 200)]
    build_index(spark, corpus.webtext_df(spark, cases=cases), d,
                segment_size=64, store_positions=True)

    # delete ~20% of case 6 and a couple of case-3 docs via predicate
    n = delete_docs(spark, d, predicate="doc_id % 5 = 0", case_id="6")
    assert n > 0
    urls = _url_of(spark, d)
    n2 = delete_docs(spark, d, urls=["doc://3/0001", "doc://3/0004"])
    assert n2 == 2

    lay = IndexLayout(d)
    tomb = lay.read_tombstones(spark).collect()
    deleted_urls = {urls[(str(r["case_id"]), int(r["doc_id"]))]
                    for r in tomb}
    assert len(deleted_urls) == n + n2

    res = compact_index(spark, d)
    assert res["purged_docs"] == n + n2
    assert lay.read_tombstones(spark).count() == 0
    assert not lay.list_commits(lay.tombstones)
    m = lay.read_manifest()
    assert "tombstones" not in m
    assert m["stages"]["docs"]["n_docs"] == 550 - (n + n2)
    assert verify_index(spark, d) == []  # includes CRC re-check

    # oracle: a from-scratch build of exactly the surviving corpus
    from pyspark.sql import functions as F

    fresh = str(tmp_path / "fresh_ix")
    surv = corpus.webtext_df(spark, cases=cases).filter(
        ~F.col("url").isin(list(deleted_urls)))
    build_index(spark, surv, fresh, segment_size=64, store_positions=True)

    got = _results_by_url(spark, d, QUERIES)
    want = _results_by_url(spark, fresh, QUERIES)
    assert got == want  # ranks AND scores, every mode

    # deleting an already-purged url is a clean no-op
    assert delete_docs(spark, d, urls=list(deleted_urls)[:1]) == 0

    # post-purge append: fold set / batch numbering stayed coherent
    build_index(spark, corpus.webtext_df(
        spark, cases=[(4, "with good intentions for", 50, 1000)]), d,
        append=True)
    assert verify_index(spark, d, check_crcs=False) == []
    h = Searcher(spark, d).search_ids("intentions", k=10, case_id="4")
    assert len(h) == 10


def test_purge_crash_before_commit_recovers(spark, tmp_path, monkeypatch):
    """Crash with every consolidated tree staged but BEFORE the atomic
    manifest commit: the live index (pending tombstones included) must be
    untouched and fully queryable, recovery must discard the staged
    generations, and a re-run compaction must leave the index identical to
    an uninterrupted purge.  (The old multi-step swap had post-commit
    crash windows too; the snapshot protocol's single manifest write
    removes them — after it there is nothing left to crash in.)"""
    from pysearch.lineage import IndexLayout as _Layout

    d = str(tmp_path / "crash_ix")
    build_index(spark, corpus.webtext_df(
        spark, cases=[(6, "in the realm of", 200, 200)]), d,
        segment_size=32)
    assert delete_docs(spark, d, predicate="doc_id % 4 = 1",
                       case_id="6") > 0
    lay0 = IndexLayout(d)
    urls = _url_of(spark, d)
    deleted_urls = {urls[(str(r["case_id"]), int(r["doc_id"]))]
                    for r in lay0.read_tombstones(spark).collect()}
    pre_pending = lay0.read_manifest()["tombstones"]["pending"]

    real_write = _Layout.write_manifest

    def crashy(self, manifest):
        if "generations" in manifest:  # the compaction commit write
            raise RuntimeError("injected crash before snapshot commit")
        return real_write(self, manifest)

    monkeypatch.setattr(_Layout, "write_manifest", crashy)
    with pytest.raises(RuntimeError, match="injected crash"):
        compact_index(spark, d)
    monkeypatch.setattr(_Layout, "write_manifest", real_write)

    lay = IndexLayout(d)
    # uncommitted: manifest untouched, pending deletes still suppress at
    # query time, staged next-generation trees present but unreferenced
    assert lay.read_manifest()["tombstones"]["pending"] == pre_pending
    assert lay.generation_paths("postings").keys() == {0, 1}
    assert lay.postings.endswith("postings")
    hits = Searcher(spark, d).search_ids(
        "in the realm of", k=200, case_id="6")
    assert {urls[("6", int(r.doc_id))]
            for r in hits.itertuples()}.isdisjoint(deleted_urls)

    assert recover_compaction(lay) == "discarded"
    assert lay.generation_paths("postings").keys() == {0}
    # re-run compacts cleanly (compact_index sweeps recovery itself too)
    done = compact_index(spark, d)
    assert done["purged_docs"] == len(deleted_urls)
    m = lay.read_manifest()
    assert "tombstones" not in m
    assert not lay.list_commits(lay.tombstones)
    from pysearch.verify import verify_index

    assert verify_index(spark, d) == []

    # and the recovered index matches a fresh build of the survivors
    from pyspark.sql import functions as F

    fresh = str(tmp_path / "crash_fresh")
    surv = corpus.webtext_df(
        spark, cases=[(6, "in the realm of", 200, 200)]).filter(
        ~F.col("url").isin(list(deleted_urls)))
    build_index(spark, surv, fresh, segment_size=32)
    q = {"q": ("in the realm of", "6", "any")}
    assert (_results_by_url(spark, d, q, k=200)
            == _results_by_url(spark, fresh, q, k=200))
