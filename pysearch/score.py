"""BM25 scoring, segment-local top-k, and phrase-span alignment.

Ranking semantics (SURVEY.md §2.10): OR-of-terms match query scored with
BM25 (k1=1.2, b=0.75 — the graft target's scorer; the reference's bleve
v0.8.1 used TF-IDF and modern bleve defaults to BM25), then the reference's
two-stage result shaping: per-hit phrase alignment
(/root/reference/internal/doclib/search_pdfs.go:382-484, span construction
:512-516) and the global Best filter that keeps only max-phrase-score spans
(:63-102, applied at index_search.go:110).

Determinism (rank identity across parallelism/pruning/resume):
- per-(term, doc) scores are float64 and summed in ascending term order;
- ties broken by doc_id ascending everywhere.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

from pysearch import K1, B
from pysearch import codec


def idf(n_docs: int, df: int) -> float:
    """Lucene/modern-bleve BM25 idf: ln(1 + (N - df + 0.5)/(df + 0.5)).

    math.log, not np.log — they may differ by 1 ulp and rank identity
    demands bit-equal scores against the brute oracle."""
    import math

    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def bm25(tf, dl, idf_val: float, avgdl: float):
    """Vectorized BM25 term score for arrays of (tf, dl)."""
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    denom = tf + K1 * (1.0 - B + B * dl / avgdl)
    return idf_val * (tf * (K1 + 1.0)) / denom


# (per-block BM25 upper bounds are computed as a Catalyst expression in
# query.Searcher._segment_upper_bounds: tf-normalization is increasing in tf
# and decreasing in dl, so (max_tf, min_dl) bounds every posting)


def score_segment_blocks(
    block_rows: Sequence[tuple],
    idfs: Dict[str, float],
    qtf: Dict[str, int],
    avgdl: float,
    k: int,
    require_terms: int = 0,
    exclude: np.ndarray | None = None,
    allow: np.ndarray | None = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Score one segment's posting blocks; return its local top-k.

    ``block_rows``: (term, n, doc_ids_bin, tfs_bin, dls_bin) tuples, any
    order.  All postings of a doc live in exactly one segment (doc-range
    partitioning), so the local sum is the doc's complete score and the
    global answer is the top-k of the union of segment top-ks.

    ``require_terms`` > 0 switches to conjunctive (AND) semantics: only
    docs whose postings appear under exactly that many distinct query terms
    survive — the vectorized form of a sorted posting-list intersection
    (each term contributes a doc at most once per segment, so the
    per-doc appearance count IS the distinct-term count).

    ``exclude``: sorted doc_id array (tombstones) to drop before scoring.
    ``allow``: sorted unique doc_id array (filter context) — when given,
    ONLY these docs can match; applied before scoring so conjunctive
    counts and top-k cutoffs see the filtered corpus (Lucene filter
    semantics: idf/avgdl stay corpus-wide, the filter gates candidates).
    """
    per_term: dict = {}
    for term, n, ib, tb, db in block_rows:
        per_term.setdefault(term, []).append((n, ib, tb, db))

    decoded: Dict[str, tuple] = {}
    for term, rows_t in per_term.items():
        decoded[term] = codec.unpack_blocks_batch(
            [r[0] for r in rows_t], [r[1] for r in rows_t],
            [r[2] for r in rows_t], [r[3] for r in rows_t],
        )
    # local top-k by (score desc, doc_id asc); a full lexsort is cheap at
    # segment granularity (uniq.size <= segment_size) and keeps tie-breaks
    # exact even when many docs share the kth score
    return _topk_from_decoded(decoded, idfs, qtf, avgdl, k,
                              require=require_terms, exclude=exclude,
                              allow=allow)


def _topk_from_decoded(
    decoded: Dict[str, tuple],
    idfs: Dict[str, float],
    qtf: Dict[str, int],
    avgdl: float,
    k: int,
    restrict: np.ndarray | None = None,
    require: int = 0,
    exclude: np.ndarray | None = None,
    allow: np.ndarray | None = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Shared top-k arithmetic over already-decoded posting arrays: per-term
    BM25, ascending-term concatenation, per-doc reduceat sum, optional
    conjunctive ``require`` filter, optional ``restrict`` doc set (phrase
    hits), optional ``allow`` doc set (filter context — possibly EMPTY,
    which admits nothing; None means unfiltered), optional ``exclude`` doc
    set (tombstoned deletes, dropped from
    every term before scoring so conjunctive counts stay exact), (score
    desc, doc_id asc) lexsort.  Every entry point (single, batched, phrase,
    batched-phrase) funnels through this function, so their scores are
    bit-identical by construction."""
    ids_all: List[np.ndarray] = []
    scores_all: List[np.ndarray] = []
    for term in sorted(idfs):  # deterministic sum order
        if term not in decoded:
            continue
        ids, tfs, dls = decoded[term][:3]
        if restrict is not None:
            keep = np.isin(ids, restrict, assume_unique=True)
            ids, tfs, dls = ids[keep], tfs[keep], dls[keep]
        if allow is not None:
            # filter context: empty allow means NO doc in this segment
            # passes the filter (distinct from allow=None = no filter)
            keep = np.isin(ids, allow, assume_unique=True)
            ids, tfs, dls = ids[keep], tfs[keep], dls[keep]
        if exclude is not None and exclude.size:
            keep = np.isin(ids, exclude, assume_unique=True, invert=True)
            ids, tfs, dls = ids[keep], tfs[keep], dls[keep]
        ids_all.append(ids)
        scores_all.append(bm25(tfs, dls, idfs[term], avgdl) * qtf.get(term, 1))
    if not ids_all:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    ids = np.concatenate(ids_all)
    if ids.size == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    scores = np.concatenate(scores_all)
    order = np.argsort(ids, kind="stable")
    ids, scores = ids[order], scores[order]
    uniq, start = np.unique(ids, return_index=True)
    sums = np.add.reduceat(scores, start)
    if require > 0:
        counts = np.diff(np.append(start, ids.size))
        keep = counts == require
        uniq, sums = uniq[keep], sums[keep]
    o = np.lexsort((uniq, -sums))[:k]
    return uniq[o], sums[o]


def count_segment_docs(
    block_rows: Sequence[tuple],
    terms: Sequence[str],
    require: int = 0,
    exclude: np.ndarray | None = None,
    allow: np.ndarray | None = None,
    qterms: Sequence[str] | None = None,
    window: int | None = None,
) -> int:
    """Total-hits count for one segment (Lucene IndexSearcher.count
    analog): the number of docs matching the query under the same match
    semantics as scoring — mode="any" when ``require`` is 0, mode="all"
    when ``require`` == len(distinct terms), phrase/near when ``qterms``
    is given (then ``block_rows`` carry pos_bin as their 6th field).
    Doc-range partitioning puts all of a doc's postings in one segment,
    so the global count is the plain sum of segment counts."""
    if qterms is not None:
        per_term: dict = {}
        for term, n, ib, tb, db, pb in block_rows:
            per_term.setdefault(term, []).append((n, ib, tb, db, pb))
        if any(t not in per_term for t in set(qterms)):
            return 0
        decoded: Dict[str, tuple] = {}
        for term in set(qterms):
            rows_t = per_term[term]
            ids, tfs, dls = codec.unpack_blocks_batch(
                [r[0] for r in rows_t], [r[1] for r in rows_t],
                [r[2] for r in rows_t], [r[3] for r in rows_t],
            )
            pos = codec.unpack_positions_batch(tfs, [r[4] for r in rows_t])
            decoded[term] = (ids, tfs, dls, pos)
        uniq = (_phrase_matched_docs(decoded, list(qterms)) if window is None
                else _near_matched_docs(decoded, list(qterms), window))
    else:
        per_term = {}
        for term, n, ib, tb, db in block_rows:
            per_term.setdefault(term, []).append((n, ib, tb, db))
        ids_all = []
        for term in sorted(set(terms) & set(per_term)):
            rows_t = per_term[term]
            ids, _tfs, _dls = codec.unpack_blocks_batch(
                [r[0] for r in rows_t], [r[1] for r in rows_t],
                [r[2] for r in rows_t], [r[3] for r in rows_t],
            )
            ids_all.append(ids)
        if not ids_all:
            return 0
        uniq, counts = np.unique(np.concatenate(ids_all), return_counts=True)
        if require > 0:
            uniq = uniq[counts == require]
    if uniq.size and allow is not None:
        uniq = uniq[np.isin(uniq, allow, assume_unique=True)]
    if uniq.size and exclude is not None and exclude.size:
        uniq = uniq[np.isin(uniq, exclude, assume_unique=True, invert=True)]
    return int(uniq.size)


def score_segment_blocks_boolean(
    block_rows: Sequence[tuple],
    idfs: Dict[str, float],
    qtf: Dict[str, int],
    avgdl: float,
    k: int,
    must_terms: Sequence[str],
    not_terms: Sequence[str],
    exclude: np.ndarray | None = None,
    allow: np.ndarray | None = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Lucene-BooleanQuery-style segment scoring: a doc survives iff it
    contains EVERY term in ``must_terms`` and NO term in ``not_terms``;
    its score is the BM25 sum over the scoring terms (``idfs`` = must +
    should) it contains.  Both gates are segment-local because all of a
    doc's postings live in exactly one segment: the must gate is the
    posting-list intersection of the must terms, the not gate is the
    union of the not terms' postings merged into the tombstone excludes —
    then the shared ``_topk_from_decoded`` funnel applies them through its
    existing restrict/exclude hooks, so boolean scores are bit-identical
    to the equivalent any/all queries by construction.

    ``not_terms`` must be decoded (present in ``block_rows``' scan) but
    NOT in ``idfs``, so they gate without contributing score.  One-plan
    form of ``score_segment_blocks_multi_boolean`` (the batched engine),
    so single and batched boolean scores are bit-identical by
    construction."""
    qids, ids_l, scores_l = score_segment_blocks_multi_boolean(
        block_rows,
        {"q": (idfs, qtf, tuple(must_terms), tuple(not_terms))},
        avgdl, k, exclude=exclude, allow=allow,
    )
    if not qids:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
    return ids_l[0], scores_l[0]


def _phrase_matched_docs(
    decoded: Dict[str, tuple],
    qterms: List[str],
) -> np.ndarray:
    """Docs of one segment matching ``qterms`` at consecutive positions.

    ``decoded``: term -> (ids, tfs, dls, positions) with positions flat per
    posting (length tf runs).  Posting-list intersection over the distinct
    terms, then position adjacency: doc matches iff some p has qterms[i] at
    p+i for all i.  Returns a sorted int64 doc array (possibly empty)."""
    distinct_terms = sorted(set(qterms))
    empty = np.empty(0, dtype=np.int64)
    if any(t not in decoded for t in distinct_terms):
        return empty  # a term absent from this segment -> no phrase hit
    common = decoded[distinct_terms[0]][0]
    for t in distinct_terms[1:]:
        common = np.intersect1d(common, decoded[t][0], assume_unique=True)
    if common.size == 0:
        return empty

    posmap: Dict[str, tuple] = {}
    for t in distinct_terms:
        ids, tfs, _dls, pos = decoded[t]
        ends = np.cumsum(tfs)
        starts = ends - tfs
        posmap[t] = ({int(d): i for i, d in enumerate(ids)}, starts, ends, pos)

    matched: List[int] = []
    for d in common:
        d = int(d)
        idx0, st0, en0, p0 = posmap[qterms[0]]
        j = idx0[d]
        cand = p0[st0[j]:en0[j]]
        for i, t in enumerate(qterms[1:], 1):
            idxt, st, en, pt = posmap[t]
            jt = idxt[d]
            cand = cand[np.isin(cand + i, pt[st[jt]:en[jt]])]
            if cand.size == 0:
                break
        if cand.size:
            matched.append(d)
    return np.asarray(matched, dtype=np.int64)


def _min_span(seqs: List[np.ndarray]) -> int:
    """Smallest max(p)-min(p) over one position chosen from each sorted
    sequence — the classic k-list minimal-window sweep over the merged
    position stream (two pointers + per-list counts)."""
    k = len(seqs)
    if k == 1:
        return 0 if len(seqs[0]) else np.iinfo(np.int64).max
    allpos = np.concatenate(seqs)
    labels = np.repeat(np.arange(k), [len(s) for s in seqs])
    o = np.argsort(allpos, kind="stable")
    allpos, labels = allpos[o], labels[o]
    counts = np.zeros(k, dtype=np.int64)
    missing, left = k, 0
    best = np.iinfo(np.int64).max
    for right in range(allpos.size):
        lb = labels[right]
        if counts[lb] == 0:
            missing -= 1
        counts[lb] += 1
        while missing == 0:
            span = int(allpos[right] - allpos[left])
            if span < best:
                best = span
            ll = labels[left]
            counts[ll] -= 1
            if counts[ll] == 0:
                missing += 1
            left += 1
    return best


def _near_matched_docs(
    decoded: Dict[str, tuple],
    qterms: List[str],
    window: int,
) -> np.ndarray:
    """Docs of one segment whose DISTINCT query terms all co-occur within
    ``window`` token positions: some choice of one occurrence per term has
    max(position) - min(position) <= window, any order (Lucene-span-style
    unordered proximity; window=1 admits exactly the two-term adjacency
    pairs in either order).  Same decoded shape as _phrase_matched_docs."""
    distinct_terms = sorted(set(qterms))
    empty = np.empty(0, dtype=np.int64)
    if any(t not in decoded for t in distinct_terms):
        return empty
    common = decoded[distinct_terms[0]][0]
    for t in distinct_terms[1:]:
        common = np.intersect1d(common, decoded[t][0], assume_unique=True)
    if common.size == 0:
        return empty

    posmap: Dict[str, tuple] = {}
    for t in distinct_terms:
        ids, tfs, _dls, pos = decoded[t]
        ends = np.cumsum(tfs)
        starts = ends - tfs
        posmap[t] = ({int(d): i for i, d in enumerate(ids)}, starts, ends,
                     pos)

    matched: List[int] = []
    for d in common:
        d = int(d)
        seqs = []
        for t in distinct_terms:
            idxt, st, en, pt = posmap[t]
            j = idxt[d]
            seqs.append(pt[st[j]:en[j]])
        if _min_span(seqs) <= window:
            matched.append(d)
    return np.asarray(matched, dtype=np.int64)


def score_segment_blocks_multi(
    block_rows: Sequence[tuple],
    plans: Dict[str, tuple],
    avgdl: float,
    k: int,
    exclude: np.ndarray | None = None,
) -> Tuple[List[str], List[np.ndarray], List[np.ndarray]]:
    """Score MANY queries over one segment's blocks in a single pass.

    ``plans``: qid -> (idfs, qtf, require_terms) — each query's live terms
    with idf weights and conjunctive requirement (0 = disjunctive).  Every
    term present in any plan is decoded exactly once; per-query scoring
    reuses the decoded arrays.  Returns (qids, ids_arrays, score_arrays)
    with each query's local top-k, tie-broken like the single-query path
    (bit-identical results by construction: same decode, same idf weights,
    same ascending-term sum order, same lexsort)."""
    per_term: dict = {}
    for term, n, ib, tb, db in block_rows:
        per_term.setdefault(term, []).append((n, ib, tb, db))

    decoded: Dict[str, tuple] = {}
    for term, rows_t in per_term.items():
        ids, tfs, dls = codec.unpack_blocks_batch(
            [r[0] for r in rows_t], [r[1] for r in rows_t],
            [r[2] for r in rows_t], [r[3] for r in rows_t],
        )
        decoded[term] = (ids, tfs, dls)

    out_q: List[str] = []
    out_ids: List[np.ndarray] = []
    out_scores: List[np.ndarray] = []
    for qid, (idfs, qtf, require) in plans.items():
        ids, sums = _topk_from_decoded(decoded, idfs, qtf, avgdl, k,
                                       require=require, exclude=exclude)
        if ids.size == 0:
            continue
        out_q.append(qid)
        out_ids.append(ids)
        out_scores.append(sums)
    return out_q, out_ids, out_scores


def score_segment_blocks_multi_boolean(
    block_rows: Sequence[tuple],
    plans: Dict[str, tuple],
    avgdl: float,
    k: int,
    exclude: np.ndarray | None = None,
    allow: np.ndarray | None = None,
) -> Tuple[List[str], List[np.ndarray], List[np.ndarray]]:
    """Score MANY boolean queries over one segment's blocks in a single
    pass: decode every term present in any plan (scoring AND prohibited)
    exactly once, then apply each query's must-intersection / not-union
    gates around the shared ``_topk_from_decoded`` funnel — bit-identical
    to per-query ``score_segment_blocks_boolean`` by construction.

    ``plans``: qid -> (idfs, qtf, must_terms, not_terms); ``idfs`` holds
    the scoring (must + should) terms only, so prohibited terms gate
    without contributing score."""
    import functools

    per_term: dict = {}
    for term, n, ib, tb, db in block_rows:
        per_term.setdefault(term, []).append((n, ib, tb, db))

    decoded: Dict[str, tuple] = {}
    for term, rows_t in per_term.items():
        decoded[term] = codec.unpack_blocks_batch(
            [r[0] for r in rows_t], [r[1] for r in rows_t],
            [r[2] for r in rows_t], [r[3] for r in rows_t],
        )

    out_q: List[str] = []
    out_ids: List[np.ndarray] = []
    out_scores: List[np.ndarray] = []
    for qid, (idfs, qtf, must_terms, not_terms) in plans.items():
        restrict = None
        if must_terms:
            if any(t not in decoded for t in must_terms):
                continue  # a required term missing from this segment
            restrict = decoded[must_terms[0]][0]
            for t in must_terms[1:]:
                restrict = np.intersect1d(restrict, decoded[t][0],
                                          assume_unique=True)
            if restrict.size == 0:
                continue
        neg = [decoded[t][0] for t in not_terms if t in decoded]
        excl = exclude
        if neg:
            neg_all = functools.reduce(np.union1d, neg)
            excl = (neg_all if excl is None or not excl.size
                    else np.union1d(excl, neg_all))
        ids, sums = _topk_from_decoded(decoded, idfs, qtf, avgdl, k,
                                       restrict=restrict, exclude=excl,
                                       allow=allow)
        if ids.size == 0:
            continue
        out_q.append(qid)
        out_ids.append(ids)
        out_scores.append(sums)
    return out_q, out_ids, out_scores


def score_segment_blocks_multi_phrase(
    block_rows: Sequence[tuple],
    plans: Dict[str, tuple],
    avgdl: float,
    k: int,
    exclude: np.ndarray | None = None,
) -> Tuple[List[str], List[np.ndarray], List[np.ndarray]]:
    """Batched EXACT-PHRASE scoring over one segment: decode every term
    (postings + positions) exactly once, then run each query's posting-list
    intersection + position adjacency + scoring over the shared arrays.

    ``block_rows``: (term, n, doc_ids_bin, tfs_bin, dls_bin, pos_bin).
    ``plans``: qid -> (idfs, qterms, qtf) with ``qterms`` the analyzed terms
    IN ORDER (duplicates kept), or (idfs, qterms, qtf, window) for
    unordered-PROXIMITY queries (mode="near").  Bit-identical to per-query
    ``score_segment_blocks_phrase`` by construction: same decode, same
    ``_phrase_matched_docs``/``_near_matched_docs`` match, same
    ``_topk_from_decoded`` arithmetic (pinned by test)."""
    per_term: dict = {}
    for term, n, ib, tb, db, pb in block_rows:
        per_term.setdefault(term, []).append((n, ib, tb, db, pb))

    decoded: Dict[str, tuple] = {}
    for term, rows_t in per_term.items():
        ids, tfs, dls = codec.unpack_blocks_batch(
            [r[0] for r in rows_t], [r[1] for r in rows_t],
            [r[2] for r in rows_t], [r[3] for r in rows_t],
        )
        pos = codec.unpack_positions_batch(tfs, [r[4] for r in rows_t])
        decoded[term] = (ids, tfs, dls, pos)

    out_q: List[str] = []
    out_ids: List[np.ndarray] = []
    out_scores: List[np.ndarray] = []
    for qid, plan in plans.items():
        idfs, qterms, qtf = plan[0], plan[1], plan[2]
        mset = (_phrase_matched_docs(decoded, qterms) if len(plan) < 4
                else _near_matched_docs(decoded, qterms, plan[3]))
        if mset.size == 0:
            continue
        ids, sums = _topk_from_decoded(decoded, idfs, qtf, avgdl, k,
                                       restrict=mset, exclude=exclude)
        if ids.size == 0:
            continue
        out_q.append(qid)
        out_ids.append(ids)
        out_scores.append(sums)
    return out_q, out_ids, out_scores


def score_segment_blocks_phrase(
    block_rows: Sequence[tuple],
    idfs: Dict[str, float],
    qterms: List[str],
    qtf: Dict[str, int],
    avgdl: float,
    k: int,
    exclude: np.ndarray | None = None,
    window: int | None = None,
    allow: np.ndarray | None = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact-PHRASE top-k over one segment: posting-list intersection plus
    position-adjacency from the index's term positions (pos_bin) — the
    match-phrase capability bleve's term vectors enable in the reference's
    engine, here as a first-class query mode.

    ``block_rows``: (term, n, doc_ids_bin, tfs_bin, dls_bin, pos_bin).
    ``qterms``: the analyzed query terms IN ORDER (duplicates kept — the
    phrase must match them at consecutive positions).  A doc matches iff
    some position p has qterms[i] at p+i for every i.  Matching docs are
    scored with the SAME arithmetic as conjunctive BM25 (ascending-term
    concatenation + reduceat), so a phrase hit's score is bit-identical to
    its mode="all" score (pinned by test).

    ``window`` switches to unordered PROXIMITY matching (mode="near"): a
    doc matches iff its distinct query terms co-occur within ``window``
    token positions (_near_matched_docs); scoring is unchanged."""
    per_term: dict = {}
    for term, n, ib, tb, db, pb in block_rows:
        per_term.setdefault(term, []).append((n, ib, tb, db, pb))

    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
    distinct_terms = sorted(idfs)
    if any(t not in per_term for t in distinct_terms):
        return empty  # a term absent from this segment -> no phrase hit

    decoded: Dict[str, tuple] = {}
    for term in distinct_terms:
        rows_t = per_term[term]
        ids, tfs, dls = codec.unpack_blocks_batch(
            [r[0] for r in rows_t], [r[1] for r in rows_t],
            [r[2] for r in rows_t], [r[3] for r in rows_t],
        )
        pos = codec.unpack_positions_batch(tfs, [r[4] for r in rows_t])
        decoded[term] = (ids, tfs, dls, pos)

    mset = (_phrase_matched_docs(decoded, qterms) if window is None
            else _near_matched_docs(decoded, qterms, window))
    if mset.size == 0:
        return empty
    # scoring restricted to phrase/near hits, same arithmetic as
    # conjunctive — a hit's score is bit-identical to its mode="all" score
    return _topk_from_decoded(decoded, idfs, qtf, avgdl, k, restrict=mset,
                              exclude=exclude, allow=allow)


def align_phrase_positions(
    query_terms: List[str],
    pos_of_term: Dict[str, Sequence[int]],
) -> List[Tuple[int, int, float]]:
    """Reference bestPhrases semantics (search_pdfs.go:382-484) computed
    from per-QUERY-term position sets — the shape the index's term
    positions (pos_bin) provide, so span construction never needs the full
    token stream: for every candidate alignment start, the phrase score is
    the number of query terms found at their expected consecutive
    positions; only max-score phrases survive.  Returns
    [(first_token_pos, last_token_pos, score)] in (first, last) order.

    Token position p holds query term qt  iff  p ∈ pos_of_term[qt], which
    is exactly the ``doc_terms[p] == qt`` test of the token-stream form —
    the two entry points are behaviorally identical by construction (and
    pinned so by test)."""
    if not query_terms or not pos_of_term:
        return []
    possets = {t: set(map(int, ps)) for t, ps in pos_of_term.items()}

    cand_starts = set()
    for i, qt in enumerate(query_terms):
        for p in possets.get(qt, ()):
            cand_starts.add(p - i)
    if not cand_starts:
        return []
    best: List[Tuple[int, int, int]] = []  # (score, first_pos, last_pos)
    for s0 in cand_starts:
        aligned = [
            s0 + i
            for i, qt in enumerate(query_terms)
            if s0 + i in possets.get(qt, ())
        ]
        if aligned:
            best.append((len(aligned), aligned[0], aligned[-1]))
    if not best:
        return []
    max_score = max(b[0] for b in best)
    spans: List[Tuple[int, int, float]] = []
    seen = set()
    for score, first, last in sorted(best, key=lambda b: (b[1], b[2])):
        if score != max_score:
            continue
        key = (first, last)
        if key in seen:
            continue
        seen.add(key)
        spans.append((first, last, float(score)))
    return spans


def align_phrase(
    doc_terms: List[str],
    offsets: List[Tuple[int, int]],
    query_terms: List[str],
) -> List[Tuple[int, int, float]]:
    """Token-stream form of bestPhrases (used when the index stores no
    positions): builds the per-term position sets from the analyzed doc and
    maps the winning token spans to [(char_start, char_end, score)]."""
    if not query_terms or not doc_terms:
        return []
    positions: dict = {}
    for p, t in enumerate(doc_terms):
        positions.setdefault(t, []).append(p)
    return [
        (offsets[first][0], offsets[last][1], score)
        for first, last, score in align_phrase_positions(query_terms, positions)
    ]


def line_lookup(text: str, char_start: int) -> Tuple[int, str]:
    """1-based line number + line text for a char offset (reference:
    search_pdfs.go:547-584, binary search over line endings)."""
    lines = text.split("\n")
    ends = np.cumsum([len(l) + 1 for l in lines])
    ln = int(np.searchsorted(ends, char_start, side="right"))
    ln = min(ln, len(lines) - 1)
    return ln + 1, lines[ln]


FRAGMENT_CONTEXT = 60


def make_fragment(text: str, spans, context: int = FRAGMENT_CONTEXT) -> str:
    """Ellipsized highlight fragment for a hit (reference Fragment
    semantics: search_pdfs.go:50,189-192 NewHighlight): the best-scoring
    span (earliest on ties) expanded ~context chars each side, snapped to
    word boundaries, with '…' marking clipped edges."""
    if not spans:
        return ""
    cs, ce, _ = max(spans, key=lambda s: (s[2], -s[0]))
    lo = max(0, cs - context)
    hi = min(len(text), ce + context)
    if lo > 0:
        sp = text.find(" ", lo, cs)
        if sp != -1:
            lo = sp + 1
    if hi < len(text):
        sp = text.rfind(" ", ce, hi)
        if sp != -1:
            hi = sp
    frag = text[lo:hi]
    if lo > 0:
        frag = "…" + frag
    if hi < len(text):
        frag = frag + "…"
    return frag
