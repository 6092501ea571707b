"""Index-side term positions (store_positions=True): the reference stores
term vectors in the index (highlight fields at bleve_glue.go:42-61) and
consumes per-term Locations for span construction (search_pdfs.go:382-484).
Our analog: pos_bin in posting blocks + a token-offset sidecar on docs.

The contract pinned here: the index-positions span path produces spans
BYTE-IDENTICAL to the re-analyze path on the fixture corpus, ranks are
unchanged vs a positions-free index, positions survive append, and the two
align_phrase entry points are behaviorally equal on randomized streams.
"""

import random
import shutil

import numpy as np
import pytest

from pysearch import corpus
from pysearch import score as sc
from pysearch.build import build_index
from pysearch.query import Searcher

POS_CASES = corpus.CASES[:5]
QUERIES = [
    ("1", "be the person who"),
    ("3", "be the person who"),
    ("3", "person who"),           # sub-phrase
    ("4", "with good intentions for"),
    ("4", "good intentions"),
    ("5", "but I prefer Python when"),
    ("2", "python"),               # single term
    ("3", "person banana who"),    # partial match inside phrase
]


@pytest.fixture(scope="module")
def pos_index(spark):
    d = "/tmp/pysearch_test_pos_index"
    shutil.rmtree(d, ignore_errors=True)
    build_index(spark, corpus.webtext_df(spark, cases=POS_CASES), d,
                segment_size=64, store_positions=True)
    return d


@pytest.fixture(scope="module")
def pos_searcher(spark, pos_index):
    return Searcher(spark, pos_index)


def _snap(df):
    rows = df.collect()
    return sorted(
        (
            r["doc_id"], round(r["score"], 10),
            tuple((s["start"], s["end"], s["score"]) for s in r["spans"]),
            tuple(r["line_nums"]), tuple(r["lines"]), r["fragment"],
        )
        for r in rows
    )


@pytest.mark.parametrize("case_id,q", QUERIES)
def test_index_spans_identical_to_reanalyze(pos_searcher, case_id, q):
    a = _snap(pos_searcher.search(q, k=10, case_id=case_id, spans="index",
                                  best_filter=False))
    b = _snap(pos_searcher.search(q, k=10, case_id=case_id,
                                  spans="reanalyze", best_filter=False))
    assert a == b and a  # identical AND non-trivial


def test_best_filter_identical_across_span_paths(pos_searcher):
    a = _snap(pos_searcher.search("with good intentions for", k=10,
                                  case_id="4", spans="index"))
    b = _snap(pos_searcher.search("with good intentions for", k=10,
                                  case_id="4", spans="reanalyze"))
    assert a == b and a


def test_ranks_unchanged_by_positions(spark, pos_searcher, tmp_path):
    d = str(tmp_path / "nopos_ix")
    build_index(spark, corpus.webtext_df(spark, cases=POS_CASES), d,
                segment_size=64, store_positions=False)
    plain = Searcher(spark, d)
    for case_id, q in QUERIES:
        a = pos_searcher.search_ids(q, k=10, case_id=case_id)
        b = plain.search_ids(q, k=10, case_id=case_id)
        assert a.values.tolist() == b.values.tolist()


def test_positions_survive_append(spark, tmp_path):
    d = str(tmp_path / "pos_append_ix")
    build_index(spark, corpus.webtext_df(spark, cases=POS_CASES[:2]), d,
                segment_size=64, store_positions=True)
    build_index(spark, corpus.webtext_df(spark, cases=[corpus.CASES[3]]), d,
                append=True)
    s = Searcher(spark, d)
    assert s.positions_stored
    a = _snap(s.search("with good intentions for", k=10, case_id="4",
                       spans="index", best_filter=False))
    b = _snap(s.search("with good intentions for", k=10, case_id="4",
                       spans="reanalyze", best_filter=False))
    assert a == b and a


def test_verify_index_passes_with_positions(spark, pos_index):
    from pysearch.verify import verify_index

    assert verify_index(spark, pos_index) == []


def test_spans_index_rejected_without_positions(spark, tmp_path):
    d = str(tmp_path / "nopos2_ix")
    build_index(spark, corpus.webtext_df(spark, cases=[corpus.CASES[0]]), d,
                segment_size=64)
    s = Searcher(spark, d)
    with pytest.raises(ValueError, match="store_positions"):
        s.search("be the person who", case_id="1", spans="index")


def test_phrase_mode_matches_brute_force(pos_searcher):
    """mode="phrase" == brute force: docs whose analyzed token stream
    contains the analyzed query as a consecutive sublist; each hit's score
    bit-equals its conjunctive (mode="all") score."""
    from pysearch.analyze import analyze

    for case_id, q in [("4", "good intentions"), ("3", "person who"),
                       ("5", "prefer python"), ("1", "be the person who")]:
        qt = analyze(q)
        docs = (
            pos_searcher.docs.filter(f"case_id = '{case_id}'")
            .select("doc_id", "text").collect()
        )
        want = sorted(
            int(r["doc_id"]) for r in docs
            if any(
                analyze(r["text"])[i:i + len(qt)] == qt
                for i in range(len(analyze(r["text"])) - len(qt) + 1)
            )
        )
        hits = pos_searcher.search_ids(q, k=100000, case_id=case_id,
                                       mode="phrase")
        assert sorted(int(d) for d in hits["doc_id"]) == want, (case_id, q)
        assert want  # non-trivial
        conj = pos_searcher.search_ids(q, k=100000, case_id=case_id,
                                       mode="all")
        cscore = dict(zip(conj["doc_id"], conj["score"]))
        assert all(cscore[d] == s
                   for d, s in zip(hits["doc_id"], hits["score"]))
        # ordering: score desc, doc_id asc
        key = sorted(zip(hits["score"], hits["doc_id"]),
                     key=lambda t: (-t[0], t[1]))
        assert [d for _, d in key] == list(hits["doc_id"])


def test_phrase_mode_no_false_positives(pos_searcher):
    """Terms present but never consecutive -> phrase returns empty while
    conjunctive does not."""
    # reversed phrase order: both terms exist in case 4 docs, but
    # 'intentions good' never occurs consecutively
    hits = pos_searcher.search_ids("intentions good", k=100, case_id="4",
                                   mode="phrase")
    assert len(hits) == 0
    conj = pos_searcher.search_ids("intentions good", k=100, case_id="4",
                                   mode="all")
    assert len(conj) > 0


def test_phrase_mode_requires_positions(spark, tmp_path):
    d = str(tmp_path / "nopos3_ix")
    build_index(spark, corpus.webtext_df(spark, cases=[corpus.CASES[0]]), d,
                segment_size=64)
    s = Searcher(spark, d)
    with pytest.raises(ValueError, match="store_positions"):
        s.search_ids("be the person who", case_id="1", mode="phrase")


def test_align_phrase_entry_points_agree_randomized():
    """Property: align_phrase (token stream) == align_phrase_positions
    (per-term position sets) + offset mapping, over randomized streams."""
    rng = random.Random(42)
    vocab = ["a", "b", "c", "d", "e"]
    for _ in range(300):
        n = rng.randrange(0, 30)
        doc_terms = [rng.choice(vocab) for _ in range(n)]
        offsets = []
        pos = 0
        for t in doc_terms:
            offsets.append((pos, pos + len(t)))
            pos += len(t) + 1
        qlen = rng.randrange(1, 5)
        query = [rng.choice(vocab + ["z"]) for _ in range(qlen)]

        via_stream = sc.align_phrase(doc_terms, offsets, query)
        positions: dict = {}
        for p, t in enumerate(doc_terms):
            positions.setdefault(t, []).append(p)
        via_pos = [
            (offsets[f][0], offsets[last][1], s)
            for f, last, s in sc.align_phrase_positions(query, positions)
        ]
        assert via_stream == via_pos


def test_positions_codec_roundtrip():
    """pos encode (builder arithmetic) -> unpack_positions_batch inverse."""
    from pysearch import codec

    rng = np.random.default_rng(7)
    for _ in range(50):
        n_post = int(rng.integers(1, 40))
        counts = rng.integers(1, 9, size=n_post).astype(np.int64)
        pos_lists = [
            np.sort(rng.choice(np.arange(200), size=int(c), replace=False))
            for c in counts
        ]
        flat = np.concatenate(pos_lists).astype(np.int64)
        starts = np.zeros(n_post, dtype=np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        gaps = np.empty_like(flat)
        gaps[0] = flat[0]
        np.subtract(flat[1:], flat[:-1], out=gaps[1:])
        gaps[starts] = flat[starts]
        buf = codec.varint_encode(gaps.astype(np.uint64))
        out = codec.unpack_positions_batch(counts, [buf])
        assert np.array_equal(out, flat)


def test_search_many_phrase_matches_single(pos_searcher):
    """Batched exact-phrase query-log scoring (search_ids_many
    mode="phrase") == per-query search_ids(mode="phrase"), bit-equal;
    queries with a corpus-absent term or no phrase hits yield no rows."""
    s = pos_searcher
    qs = {
        "q1": "be the person who",
        "q2": "in the realm of",
        "q3": "person who",
        "q4": "zzzmissingterm person",
        "q5": "person be",  # terms present, phrase (likely) absent
    }
    for case_id in ("1", "6"):
        batch = s.search_ids_many(qs, k=10, case_id=case_id, mode="phrase")
        for qid, q in qs.items():
            single = s.search_ids(q, k=10, case_id=case_id, mode="phrase")
            sub = batch[batch["qid"] == qid]
            assert list(sub["doc_id"]) == list(single["doc_id"]), (qid, case_id)
            assert list(sub["score"]) == list(single["score"]), (qid, case_id)


def test_search_many_phrase_requires_positions(spark, tmp_path):
    import pytest as _pytest

    from pysearch import corpus
    from pysearch.build import build_index
    from pysearch.query import Searcher

    d = str(tmp_path / "nopos_many")
    df = corpus.webtext_df(spark, cases=[(1, "be the person who", 30, 120)])
    build_index(spark, df, d, segment_size=64, store_positions=False)
    s = Searcher(spark, d)
    with _pytest.raises(ValueError, match="store_positions"):
        s.search_ids_many({"q": "be the person"}, case_id="1", mode="phrase")


def test_near_mode_matches_brute_force(pos_searcher):
    """mode="near" == brute force: docs where some choice of one occurrence
    per distinct analyzed term has max(pos)-min(pos) <= window; hit scores
    bit-equal the conjunctive (mode="all") scores; window=inf degenerates
    to mode="all"; phrase hits are a subset of near(len(qt)-1) hits."""
    from itertools import product

    from pysearch.analyze import analyze

    for case_id, q, window in [("4", "good intentions", 2),
                               ("3", "person who", 1),
                               ("1", "be the person who", 4),
                               ("5", "prefer python", 3)]:
        qt = sorted(set(analyze(q)))
        docs = (
            pos_searcher.docs.filter(f"case_id = '{case_id}'")
            .select("doc_id", "text").collect()
        )
        want = []
        for r in docs:
            toks = analyze(r["text"])
            seqs = [[i for i, t in enumerate(toks) if t == term]
                    for term in qt]
            if all(seqs) and min(
                max(c) - min(c) for c in product(*seqs)
            ) <= window:
                want.append(int(r["doc_id"]))
        hits = pos_searcher.search_ids(q, k=100000, case_id=case_id,
                                       mode="near", window=window)
        assert sorted(int(d) for d in hits["doc_id"]) == sorted(want), (
            case_id, q, window)
        assert want  # non-trivial
        conj = pos_searcher.search_ids(q, k=100000, case_id=case_id,
                                       mode="all")
        cscore = dict(zip(conj["doc_id"], conj["score"]))
        assert all(cscore[d] == s
                   for d, s in zip(hits["doc_id"], hits["score"]))
        # window=inf == conjunctive, bit-equal
        inf = pos_searcher.search_ids(q, k=100000, case_id=case_id,
                                      mode="near", window=10**9)
        assert list(inf["doc_id"]) == list(conj["doc_id"])
        assert list(inf["score"]) == list(conj["score"])
        # phrase subset: adjacency implies span len(qt)-1
        ph = pos_searcher.search_ids(q, k=100000, case_id=case_id,
                                     mode="phrase")
        near_ph = pos_searcher.search_ids(
            q, k=100000, case_id=case_id, mode="near",
            window=max(1, len(analyze(q)) - 1))
        assert set(ph["doc_id"]) <= set(near_ph["doc_id"])


def test_near_mode_validation_and_batch(pos_searcher, spark, tmp_path):
    """mode="near" argument validation + batched query-log parity."""
    with pytest.raises(ValueError, match="window"):
        pos_searcher.search_ids("person who", case_id="3", mode="near")
    with pytest.raises(ValueError, match="window"):
        pos_searcher.search_ids_many({"q": "person who"}, case_id="3",
                                     mode="near")
    d = str(tmp_path / "nopos_near")
    build_index(spark, corpus.webtext_df(
        spark, cases=[(1, "be the person who", 30, 120)]), d,
        segment_size=64, store_positions=False)
    with pytest.raises(ValueError, match="store_positions"):
        Searcher(spark, d).search_ids("be the", case_id="1", mode="near",
                                      window=2)

    qs = {"q1": "good intentions", "q2": "intentions for", "q3": "nothere"}
    batch = pos_searcher.search_ids_many(qs, k=10, case_id="4", mode="near",
                                         window=2)
    for qid, q in qs.items():
        single = pos_searcher.search_ids(q, k=10, case_id="4", mode="near",
                                         window=2)
        sub = batch[batch["qid"] == qid]
        assert list(sub["doc_id"]) == list(single["doc_id"]), qid
        assert list(sub["score"]) == list(single["score"]), qid


def test_min_span_unit():
    """The k-list minimal-window sweep against a brute-force cross
    product on randomized inputs."""
    from itertools import product

    rng = random.Random(7)
    for _ in range(200):
        k = rng.randint(1, 4)
        seqs = [np.array(sorted(rng.sample(range(40), rng.randint(1, 6))),
                         dtype=np.int64) for _ in range(k)]
        brute = min(max(c) - min(c) for c in product(*seqs))
        assert sc._min_span(seqs) == brute, seqs


def test_filter_context_phrase_and_near(pos_searcher):
    """Phrase/near queries honor the filter context: filtered top-k equals
    the post-hoc filter of the full phrase/near ranking, bit-exactly."""
    from pyspark.sql import functions as F

    cid, phrase = "3", "person who"
    full = pos_searcher.search_ids(phrase, k=10**6, case_id=cid,
                                   mode="phrase")
    assert len(full) > 3
    exp = full[full["doc_id"] % 2 == 0].head(5).reset_index(drop=True)
    got = pos_searcher.search_ids(phrase, k=5, case_id=cid, mode="phrase",
                                  filter="doc_id % 2 = 0")
    assert got.equals(exp)

    fulln = pos_searcher.search_ids(phrase, k=10**6, case_id=cid,
                                    mode="near", window=3)
    expn = fulln[fulln["doc_id"] % 2 == 0].head(5).reset_index(drop=True)
    allowed = pos_searcher.docs.filter(
        (F.col("case_id") == cid) & (F.col("doc_id") % 2 == 0)
    ).select("doc_id")
    gotn = pos_searcher.search_ids(phrase, k=5, case_id=cid, mode="near",
                                   window=3, filter_docs=allowed)
    assert gotn.equals(expn)


def test_count_phrase_and_near(pos_searcher):
    """count() under phrase/near == the exhaustive phrase/near ranking's
    length, with and without a filter context."""
    cid, phrase = "3", "person who"
    full = pos_searcher.search_ids(phrase, k=10**6, case_id=cid,
                                   mode="phrase")
    assert pos_searcher.count(phrase, case_id=cid, mode="phrase") == len(full)
    fulln = pos_searcher.search_ids(phrase, k=10**6, case_id=cid,
                                    mode="near", window=3)
    assert pos_searcher.count(phrase, case_id=cid, mode="near",
                              window=3) == len(fulln)
    got = pos_searcher.count(phrase, case_id=cid, mode="phrase",
                             filter="doc_id % 2 = 0")
    assert got == int((full["doc_id"] % 2 == 0).sum())
