"""The analyzer — the semantic keystone shared by index build and query.

Reproduces the shape of bleve v0.8.1's ``en`` analyzer chain (selected by the
reference at /root/reference/internal/doclib/bleve_glue.go:44-45,59):

    unicode word tokenizer -> possessive strip -> lowercase
        -> English (snowball) stop set -> Porter stemmer

It is implemented from public knowledge of that chain (Lucene/snowball stop
list, Porter 1980 stemmer, UAX#29-style word segmentation approximated by a
regex), NOT translated from Go.  The same function runs at index time and at
query time (reference parity: query-side analysis at
/root/reference/internal/doclib/search_pdfs.go:163-174).

Design notes for scale:
- ``analyze_series`` is the vectorized entry point used inside pandas UDFs /
  ``mapInPandas``; per-token work is memoized (``lru_cache`` on the stemmer,
  dict cache on full token normalization) so throughput is dominated by the
  regex scan, not Python-level stemming.
- Token *positions* are ungapped indexes into the post-filter token stream
  (deliberate, documented deviation from Lucene position increments; both
  query and document sides use the same convention so phrase alignment is
  consistent).
"""

from __future__ import annotations

import re
from typing import List, Tuple

from pysearch.porter import stem

# Snowball English stop list (public: snowball.tartarus.org stop.txt — the
# list bleve v0.8.1 embeds for its stop_en filter).  Curly-apostrophe
# variants are added because our tokenizer keeps U+2019 inside tokens.
_STOP_BASE = """
i me my myself we our ours ourselves you your yours yourself yourselves
he him his himself she her hers herself it its itself
they them their theirs themselves what which who whom this that these those
am is are was were be been being have has had having do does did doing
would should could ought
i'm you're he's she's it's we're they're i've you've we've they've
i'd you'd he'd she'd we'd they'd i'll you'll he'll she'll we'll they'll
isn't aren't wasn't weren't hasn't haven't hadn't doesn't don't didn't
won't wouldn't shan't shouldn't can't cannot couldn't mustn't
let's that's who's what's here's there's when's where's why's how's
a an the and but if or because as until while
of at by for with about against between into through during before after
above below to from up down in out on off over under
again further then once here there when where why how
all any both each few more most other some such
no nor not only own same so than too very
""".split()

STOPWORDS = frozenset(_STOP_BASE) | frozenset(
    w.replace("'", "’") for w in _STOP_BASE if "'" in w
)

# Word = runs of \w (letters, digits, underscore — underscore joins words in
# UAX#29 via ExtendNumLet) optionally joined by internal apostrophes.
_TOKEN_RE = re.compile(r"\w+(?:['’ʼ]\w+)*")

_APOSTROPHES = ("'s", "'S", "’s", "’S", "ʼs", "ʼS")


def _strip_possessive(tok: str) -> str:
    if len(tok) > 2 and tok[-2:] in _APOSTROPHES:
        return tok[:-2]
    return tok


# token -> analyzed term or None (stopword). Unbounded dict is fine: unique
# token count is bounded by vocabulary, and each executor process holds one.
_NORM_CACHE: dict = {}


def _norm(tok: str):
    hit = _NORM_CACHE.get(tok)
    if hit is not None:
        return hit if hit != "" else None
    low = _strip_possessive(tok).lower()
    if low in STOPWORDS:
        _NORM_CACHE[tok] = ""
        return None
    out = stem(low)
    _NORM_CACHE[tok] = out
    return out


def analyze(text: str) -> List[str]:
    """Text -> analyzed terms, in order (ungapped positions = list index)."""
    out = []
    for tok in _TOKEN_RE.findall(text):
        t = _norm(tok)
        if t is not None:
            out.append(t)
    return out


def analyze_with_offsets(text: str) -> List[Tuple[str, int, int]]:
    """Text -> [(term, char_start, char_end)] for surviving tokens.

    Used on the (tiny) top-k hit set at query time for phrase-span
    construction (reference span semantics:
    /root/reference/internal/doclib/search_pdfs.go:55-60,512-516).
    """
    out = []
    for m in _TOKEN_RE.finditer(text):
        t = _norm(m.group(0))
        if t is not None:
            out.append((t, m.start(), m.end()))
    return out


def analyze_series(texts) -> "object":
    """Vectorized batch entry point: pd.Series[str] -> pd.Series[list[str]]."""
    return texts.map(analyze)


# ---------------------------------------------------------------------------
# "simple" analyzer: whitespace split, no normalization.  SQL-expressible
# (split(text, ' ') in both Spark and DuckDB), which lets the full engine be
# value-checked against an independent SQL BM25 oracle.
# ---------------------------------------------------------------------------

def simple_analyze(text: str) -> List[str]:
    return [t for t in text.split(" ") if t != ""]


def simple_analyze_with_offsets(text: str) -> List[Tuple[str, int, int]]:
    out = []
    pos = 0
    for part in text.split(" "):
        if part != "":
            out.append((part, pos, pos + len(part)))
        pos += len(part) + 1
    return out


def simple_analyze_batch(texts):
    import numpy as np

    n = len(texts)
    lists = [simple_analyze(t) for t in texts]
    dls = np.fromiter((len(x) for x in lists), dtype=np.int64, count=n)
    if int(dls.sum()) == 0:
        return (np.empty(0, dtype=object), np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.int64), np.zeros(n, dtype=np.int64))
    import itertools

    import pandas as pd

    flat = np.array(list(itertools.chain.from_iterable(lists)), dtype=object)
    codes, uniq = pd.factorize(flat)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), dls)
    return np.asarray(uniq, dtype=object), codes.astype(np.int64), doc_idx, dls


# name -> (analyze, analyze_with_offsets, analyze_batch); the name is stored
# in the index manifest so query-time analysis always matches build-time
ANALYZERS = {
    "en": (analyze, analyze_with_offsets, None),  # batch fn set below
    "simple": (simple_analyze, simple_analyze_with_offsets, simple_analyze_batch),
}


def get_analyzer(name: str):
    if name not in ANALYZERS:
        raise ValueError(f"unknown analyzer {name!r}; known: {sorted(ANALYZERS)}")
    a, o, b = ANALYZERS[name]
    if b is None:
        b = analyze_batch
    return a, o, b


def analyze_batch(texts):
    """Batch-analyze many documents with per-UNIQUE-token normalization.

    Returns (uniq_terms: object ndarray, codes: int64 ndarray, doc_idx:
    int64 ndarray, dls: int64 ndarray) where ``uniq_terms[codes[i]]`` is the
    i-th surviving token (document order), ``doc_idx[i]`` its 0-based doc,
    and ``dls`` the per-doc surviving-token counts.  The expensive Python
    normalization (possessive/stop/stem) runs once per unique raw token —
    ~vocabulary-sized, not corpus-sized — which is what makes the posting
    builder scale.
    """
    import numpy as np
    import pandas as pd

    n = len(texts)
    raw_lists = [_TOKEN_RE.findall(t) for t in texts]
    raw_lens = np.fromiter((len(x) for x in raw_lists), dtype=np.int64, count=n)
    if int(raw_lens.sum()) == 0:
        return (np.empty(0, dtype=object), np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.int64), np.zeros(n, dtype=np.int64))
    flat = np.empty(int(raw_lens.sum()), dtype=object)
    pos = 0
    for lst in raw_lists:
        flat[pos:pos + len(lst)] = lst
        pos += len(lst)
    raw_codes, uniq_raw = pd.factorize(flat)
    mapped = np.array([_norm(u) or "" for u in uniq_raw], dtype=object)
    final_codes_of_raw, uniq_terms = pd.factorize(mapped)
    # stopwords map to "" — find its final code (if present) to drop below
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), raw_lens)
    codes = final_codes_of_raw[raw_codes]
    keep = mapped[raw_codes] != ""
    codes = codes[keep].astype(np.int64)
    doc_idx = doc_idx[keep]
    dls = np.bincount(doc_idx, minlength=n).astype(np.int64)
    # re-factorize kept codes so uniq_terms has no "" entry holes
    if (uniq_terms == "").any():
        # build compact remap: old final code -> new dense code
        keep_term = uniq_terms != ""
        new_of_old = np.cumsum(keep_term) - 1
        codes = new_of_old[codes]
        uniq_terms = uniq_terms[keep_term]
    return np.asarray(uniq_terms, dtype=object), codes, doc_idx, dls
