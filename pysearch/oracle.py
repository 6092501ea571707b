"""Brute-force local BM25 oracle — slow, obviously correct, Spark-free.

Used to pin the golden top-k files (tests/golden/) that the distributed
engine must reproduce exactly: same doc_ids, same float64 scores
(FIXTURES.md §4.2).  Shares only the analyzer with the engine; scoring is an
independent straight-line implementation.
"""

from __future__ import annotations

import math
from collections import Counter
from typing import Dict, List, Tuple

from pysearch import B, K1
from pysearch.analyze import analyze


def brute_topk(docs: Dict[int, str], query: str, k: int) -> List[Tuple[int, float]]:
    """Exact BM25 OR-of-terms top-k over {doc_id: text}.

    Ties broken by doc_id ascending. Scores are float64, per-term
    contributions summed in ascending term order (the engine's determinism
    contract, SURVEY.md §7.4.2).
    """
    toks = {i: analyze(t) for i, t in docs.items()}
    n = len(docs)
    if n == 0:
        return []
    dls = {i: len(ts) for i, ts in toks.items()}
    avgdl = sum(dls.values()) / n
    tfs = {i: Counter(ts) for i, ts in toks.items()}
    dfs: Counter = Counter()
    for i, c in tfs.items():
        dfs.update(c.keys())

    qterms = analyze(query)
    qtf = Counter(qterms)

    scores: Dict[int, float] = {}
    for term in sorted(qtf):
        df = dfs.get(term, 0)
        if df == 0:
            continue
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        for i, c in tfs.items():
            tf = c.get(term, 0)
            if tf == 0:
                continue
            denom = tf + K1 * (1.0 - B + B * dls[i] / avgdl)
            # same float64 op order as score.bm25 (rank identity is bit-exact)
            scores[i] = scores.get(i, 0.0) + (idf * (tf * (K1 + 1.0)) / denom) * qtf[term]

    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:k]


def case_docs(case_id: int, term: str, num_docs: int, doc_len: int) -> Dict[int, str]:
    from pysearch.corpus import doc_text

    return {i: doc_text(i, term, num_docs, doc_len) for i in range(1, num_docs + 1)}
