"""Top-k query engine over the built index.

Query lifecycle (Spark-first redesign of the reference's
/root/reference/internal/doclib/search_pdfs.go:114-277 path, SURVEY.md §3.2):

  query string -> analyze() (same chain as indexing)
    -> read postings with (case_id, term_bucket, term) filters
       [parquet partition pruning on term_bucket + row-group pruning on term]
    -> optional lossless segment-level block-max pruning (WAND-style):
       phase 1 scores the highest-upper-bound segments to establish the
       running kth score θ; phase 2 scores only segments whose summed
       per-term upper bound exceeds θ
    -> groupBy(segment).applyInPandas: decode blocks, BM25, local top-k
       (all postings of a doc live in one segment, so local sums are final)
    -> global orderBy(score desc, doc_id asc).limit(k)
    -> back-join docs (broadcast the tiny hit set) -> phrase-span alignment
       + Best filter + line numbers.

Unlike the reference (which re-opens index + catalog per query,
search_pdfs.go:124-134 — SURVEY §7.5 quirk), a Searcher caches corpus/term
stats and reuses the postings DataFrame across queries.
"""

from __future__ import annotations

import os
import re
from collections import Counter
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd

from pysearch import score as sc
from pysearch.build import term_bucket
from pysearch.lineage import IndexLayout

DEFAULT_MAX_RESULTS = 10  # reference: index_search.go:55-56
PRUNE_FIRST_SEGMENTS = 8  # segments scored in phase 1 to establish θ
PRUNE_MIN_POSTINGS = 1_000_000  # below this, one-pass scoring beats the
# extra bound/θ jobs on a warm local cluster; real serving deployments with
# cold storage set this lower
LOCAL_MAX_POSTINGS = 500_000  # below this candidate volume, the packed
# blocks are collected (one scan-only Spark job, no exchange, no Python
# worker round trip) and scored on the driver with the SAME per-segment
# kernels — a distributed scoring job's fixed latency (shuffle + pandas
# worker spin-up + result fetch) dominates when the candidate payload is a
# few MB.  500k postings is ~3 MB packed (and bounds driver work at O(query
# candidate volume), the same class as the hit set itself); queries above
# the gate — and every filtered query, whose allowed set is distributed —
# take the distributed path unchanged.  Results are bit-identical by
# construction (same decode, same kernels, same merge order; pinned by
# test).  PYSEARCH_LOCAL_MAX_POSTINGS overrides (0 disables — the right
# setting when driver<->storage bandwidth is poor, e.g. remote object
# store).
LOCAL_MAX_VOCAB = 200_000  # term_stats rows under which the per-case
# vocabulary (term -> df) is fetched ONCE per Searcher load (a bounded
# metadata collect, ~tens of MB at the gate) and the MultiTermQuery
# expansions (fuzzy/prefix), spell suggestions, and term-df lookups run
# driver-side — each previously paid a full Spark job (scan + window +
# collect) per query over a table that is vocabulary-sized METADATA, the
# textbook case for a broadcast-style strategy switch.  Values are
# identical by construction: the local Levenshtein is the classic DP
# (matching F.levenshtein / DuckDB levenshtein exactly), weights use the
# same float64 arithmetic, ranking the same (w desc, df desc, term asc)
# order (pinned by test).  Regexp clauses are evaluated against the same
# cached vocabulary by the SAME JVM java.util.regex engine rlike runs (one
# py4j stream-filter call — never Python re, whose dialect differs on
# corners like \\w, and no Spark job).  PYSEARCH_LOCAL_MAX_VOCAB overrides
# (0 disables).  Staleness: the cache lives on the Searcher and every
# refresh/_load drops it.

LOCAL_BATCH_FACTOR = 4  # the batched paths (search_ids_many, boolean
# batch, the NRT hybrid's index side) may score a whole query log
# driver-side when every plan's own candidate volume clears the
# single-query gate AND the summed volume stays under
# LOCAL_BATCH_FACTOR * LOCAL_MAX_POSTINGS — the measured crossover where
# single-threaded driver scoring overtakes the distributed batch scan's
# fixed cost (see Searcher._use_local_batch).
# PYSEARCH_LOCAL_BATCH_FACTOR overrides (0 disables the batched local
# path outright; single queries keep their own gate).

LOCAL_MAX_CATALOG = 1_000_000  # catalog rows (per case) under which the
# case's (url, content_hash) key columns may be fetched ONCE per Searcher
# load — index METADATA in the same class as the term-df cache — so the
# NRT hybrid's already-indexed anti-joins build their broadcast sides
# from cached in-memory relations (two docs-scan build jobs per hybrid
# query removed).  Above the gate the distributed anti-joins run
# unchanged.  PYSEARCH_LOCAL_MAX_CATALOG overrides (0 disables).


def _lev_batch(q: str, cands) -> "np.ndarray":
    """Classic Levenshtein distance from ``q`` to every candidate term,
    vectorized across candidates (DP columns as numpy vectors).  Exactly
    the textbook recurrence — the same values as Spark ``F.levenshtein``
    and DuckDB ``levenshtein`` (no transpositions, unit costs)."""
    n = len(cands)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    lens = np.fromiter((len(t) for t in cands), dtype=np.int64, count=n)
    L = int(lens.max())
    m = len(q)
    if L == 0:
        return np.full(n, m, dtype=np.int64)
    mat = np.zeros((n, L), dtype=np.int64)
    for i, t in enumerate(cands):
        mat[i, : len(t)] = [ord(c) for c in t]
    prev = np.broadcast_to(np.arange(L + 1, dtype=np.int64),
                           (n, L + 1)).copy()
    cur = np.empty_like(prev)
    for i in range(1, m + 1):
        cur[:, 0] = i
        neq = (mat != ord(q[i - 1])).astype(np.int64)
        for j in range(1, L + 1):
            np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1, out=cur[:, j])
            np.minimum(cur[:, j], prev[:, j - 1] + neq[:, j - 1],
                       out=cur[:, j])
        prev, cur = cur, prev
    return prev[np.arange(n), lens]
MAX_PENDING_TOMBSTONES = 10_000_000  # pending (uncompacted) deletes a
# Searcher will ship to executors inside scoring closures (~80 MB of int64
# per case above this).  The Lucene-style operating rule is "compact before
# tombstones grow"; this cap ENFORCES it with a clear error instead of a
# silent driver/executor OOM at 10^8 pending deletes.


_BOOST_RE = re.compile(r"^(.+)\^(\d+(?:\.\d+)?)$")


def parse_boosts(query: str):
    """Split Lucene-style per-term boosts (``spark^2 join fast^0.5``) out
    of a query string BEFORE analysis.  Returns ``(clean_query,
    raw_boosts)`` where ``raw_boosts`` maps the RAW (pre-analysis) token to
    its multiplier; repeated boosts on the same raw token compose
    multiplicatively.  Tokens without a ``^<number>`` suffix pass through
    untouched, so unboosted queries round-trip bit-identically.

    The reference sketched query-time boosts but never shipped them
    (commented out at /root/reference/internal/doclib/search_pdfs.go:176-186);
    here they are first-class: the boost multiplies the term's idf weight,
    so scoring, WAND/block-max pruning bounds, and the batched query-log
    path all see one consistent per-term weight."""
    toks: List[str] = []
    boosts: Dict[str, float] = {}
    for raw in query.split():
        m = _BOOST_RE.match(raw)
        if m:
            b = float(m.group(2))
            if b <= 0:
                raise ValueError(
                    f"term boost must be > 0, got {raw!r} (a non-positive "
                    "weight would invalidate the WAND upper bounds)"
                )
            toks.append(m.group(1))
            boosts[m.group(1)] = boosts.get(m.group(1), 1.0) * b
        else:
            toks.append(raw)
    return " ".join(toks), boosts


def parse_boolean(query: str):
    """Split a Lucene-classic boolean query string into clauses BEFORE
    analysis: ``+tok`` is a MUST clause, ``-tok`` a MUST_NOT clause, a bare
    token a SHOULD clause (``+spark -join fast^0.5``).  Returns
    ``(must_raw, should_raw, not_raw)`` lists of raw tokens; must/should
    tokens may still carry ``^boost`` suffixes (parse_boosts runs on them
    downstream).  A boost on a MUST_NOT clause is rejected — a pure filter
    has no score to weight, so a silent drop would hide a query bug.

    The reference exposes only the OR-of-terms match query
    (/root/reference/internal/doclib/search_pdfs.go:187-194); boolean
    occurs (must/should/must_not) are the Lucene BooleanQuery model layered
    over the same index."""
    must_raw: List[str] = []
    should_raw: List[str] = []
    not_raw: List[str] = []
    for raw in query.split():
        if raw.startswith("+") and len(raw) > 1:
            must_raw.append(raw[1:])
        elif raw.startswith("-") and len(raw) > 1:
            tok = raw[1:]
            if _BOOST_RE.match(tok):
                raise ValueError(
                    f"boost on a MUST_NOT clause is meaningless: {raw!r} "
                    "(prohibited terms gate, they never score)"
                )
            not_raw.append(tok)
        else:
            should_raw.append(raw)
    return must_raw, should_raw, not_raw


_FUZZY_RE = re.compile(r"^(.+)~(\d)$")
_PREFIX_RE = re.compile(r"^(.+)\*$")
_REGEX_RE = re.compile(r"^/(.+)/$")
MAX_FUZZY_DISTANCE = 2  # Lucene's LevenshteinAutomata ceiling


def parse_fuzzy(query: str, default_distance: int = 0):
    """Split Lucene MultiTermQuery suffixes out of a query string BEFORE
    analysis: ``relam~1`` is a fuzzy clause (max edit distance 1),
    ``spar*`` a trailing-wildcard PREFIX clause, ``/s[cp]an?k?/`` a
    REGEXP clause (Lucene RegexpQuery slash syntax).  Returns
    ``(clean_query, raw_fuzzy, raw_prefixes, raw_regexps)``:
    ``raw_fuzzy`` maps each remaining RAW token to its max edit distance
    (tokens without a ``~d`` suffix get ``default_distance``);
    ``raw_prefixes`` lists the prefix tokens, LOWERCASED but otherwise
    un-analyzed — Lucene's wildcard rule: a stemmer would mangle the
    prefix the user typed, so wildcard terms bypass the analyzer;
    ``raw_regexps`` lists the regexp bodies (slashes stripped,
    LOWERCASED — Lucene RegexpQuery also bypasses the analyzer, and the
    index vocabulary is lowercase).  Like Lucene, a regexp must match the
    WHOLE term (callers anchor with ``^(?:...)$``).  Distances above
    MAX_FUZZY_DISTANCE (2, Lucene's automaton ceiling — here the ceiling
    keeps the expansion scan's length-band prefilter selective) are
    rejected.  Run parse_boosts FIRST: the Lucene grammar is
    ``term~d^boost`` / ``term*^boost`` / ``/re/^boost`` with the boost
    suffix outermost."""
    toks: List[str] = []
    fuzz: Dict[str, int] = {}
    prefixes: List[str] = []
    regexps: List[str] = []
    for raw in query.split():
        rm = _REGEX_RE.match(raw)
        m = _FUZZY_RE.match(raw)
        pm = _PREFIX_RE.match(raw)
        if rm:
            regexps.append(rm.group(1).lower())
        elif m:
            d = int(m.group(2))
            if d > MAX_FUZZY_DISTANCE:
                raise ValueError(
                    f"fuzzy distance must be <= {MAX_FUZZY_DISTANCE}, "
                    f"got {raw!r}")
            toks.append(m.group(1))
            fuzz[m.group(1)] = max(fuzz.get(m.group(1), 0), d)
        elif pm:
            prefixes.append(pm.group(1).lower())
        else:
            toks.append(raw)
            fuzz.setdefault(raw, default_distance)
    return " ".join(toks), fuzz, prefixes, regexps


class Searcher:
    def __init__(self, spark, index_dir: str, cache_postings: bool = False,
                 on_stale: str = "refresh", at_version: int | None = None,
                 max_pending_tombstones: int | None = None):
        """``cache_postings=True`` persists the postings table in executor
        memory for repeated-query workloads (right on a warm serving
        cluster; leave off for one-shot jobs or indexes larger than cluster
        memory — partition pruning into parquet is lost under a cache).

        ``on_stale`` controls what a search does when the index changed
        underneath this Searcher (another writer appended, compacted, or
        deleted — detected by a cheap manifest-stat check per search):
        ``"refresh"`` (default) reloads the cached corpus/term stats and
        table frames; ``"raise"`` refuses with a RuntimeError (serving
        deployments that pin a snapshot); ``"ignore"`` preserves the old
        (pre-r4) silently-stale behavior for callers that manage refresh
        themselves.  Never silently stale by default.

        ``at_version`` pins this Searcher to an archived index snapshot
        (time-travel read; ``IndexLayout.commit_snapshot``): it sees
        exactly the commits/generations recorded at that version — appends,
        deletes, and compactions SINCE are invisible — and never refreshes
        (a snapshot is immutable).  ``IndexLayout(dir).snapshots()`` lists
        the available versions.  Readable as long as the referenced trees
        exist (see compact.expire_generations).

        ``max_pending_tombstones`` overrides the load-time cap on pending
        (uncompacted) deletes this Searcher will ship into scoring
        closures (default MAX_PENDING_TOMBSTONES = 10M).  The right fix
        above the cap is compact_index; the override exists for readers
        that cannot run maintenance (read-only replicas) and accept the
        driver/executor memory cost."""
        self.spark = spark
        self.layout = IndexLayout(index_dir, at_version=at_version)
        self.cache_postings = cache_postings
        if on_stale not in ("refresh", "raise", "ignore"):
            raise ValueError(
                f"on_stale must be refresh|raise|ignore, got {on_stale!r}"
            )
        self.on_stale = "ignore" if at_version is not None else on_stale
        if max_pending_tombstones is not None:
            self.max_pending_tombstones = int(max_pending_tombstones)
        self._load()

    def _index_sig(self):
        """Cheap change signature of the index: the manifest file's
        (mtime_ns, size).  Every mutation — append finalize, compaction,
        delete — rewrites the manifest via an atomic replace, so its stat
        changes iff the index changed."""
        st = os.stat(self.layout.manifest_path)
        return (st.st_mtime_ns, st.st_size)

    def _load(self):
        spark, index_dir = self.spark, self.layout.root
        # signature FIRST, manifest read second: a mutation landing between
        # the two makes stale() true (next search refreshes) rather than
        # masking a mid-load change behind a fresh-looking signature
        self._manifest_sig = self._index_sig()
        m = self.layout.read_manifest()
        if not m.get("stages", {}).get("finalize", {}).get("done"):
            raise RuntimeError(f"index at {index_dir} is not complete")
        # freeze ONE generation map for every table path resolved below: a
        # compaction committing between two lazy property accesses must not
        # hand this load a mixed-generation view (docs from the old
        # snapshot, postings from the new); self-consistency of a single
        # generation map is guaranteed by the atomic manifest write
        gens = {name: int(g) for name, g in
                m.get("generations", {}).items()}
        path = {name: self.layout.table_path(name, gens.get(name, 0))
                for name in ("docs", "postings", "term_stats",
                             "corpus_stats", "tombstones")}
        cache_postings = self.cache_postings
        self.n_buckets = int(m["n_buckets"])
        self.segment_size = int(m.get("segment_size", 4096))
        self.positions_stored = bool(m.get("positions", False))
        from pysearch.analyze import get_analyzer

        self.analyzer_name = m.get("analyzer", "en")
        self._analyze, self._analyze_offsets, _ = get_analyzer(self.analyzer_name)
        self._df_cache = {}
        # per-case {term: df} under the LOCAL_MAX_VOCAB gate (None above
        # it); dropped on every (re)load so a refreshed Searcher re-reads
        self._vocab_cache: Dict[str, Optional[dict]] = {}
        self._term_stats_rows: Optional[int] = None
        # per-case (urls, content_hashes) under the LOCAL_MAX_CATALOG gate
        # (None above it); dropped on every (re)load like the vocab cache
        self._catalog_keys_cache: Dict[str, Optional[tuple]] = {}
        if not hasattr(self, "prune_min_postings"):
            self.prune_min_postings = PRUNE_MIN_POSTINGS  # tests: 0 forces
            self.local_max_postings = int(os.environ.get(
                "PYSEARCH_LOCAL_MAX_POSTINGS", LOCAL_MAX_POSTINGS))
            self.local_max_vocab = int(os.environ.get(
                "PYSEARCH_LOCAL_MAX_VOCAB", LOCAL_MAX_VOCAB))
            self.local_max_catalog = int(os.environ.get(
                "PYSEARCH_LOCAL_MAX_CATALOG", LOCAL_MAX_CATALOG))
            self.local_batch_factor = int(os.environ.get(
                "PYSEARCH_LOCAL_BATCH_FACTOR", LOCAL_BATCH_FACTOR))
            # diagnostics: when True, _prune_blocks records candidate-vs-
            # scored block counts (extra metadata jobs; test-only)
            self.count_scored_blocks = False
            self.last_block_counts: Optional[dict] = None
            self.max_pending_tombstones = getattr(
                self, "max_pending_tombstones", MAX_PENDING_TOMBSTONES)
        from pyspark.sql import functions as F

        def _norm(df):
            # case_id may come back typed by directory-name inference; pin
            # it to string (a string->string cast is elided by Catalyst, so
            # partition pruning on case_id survives).  term_bucket is left
            # at its discovered type — casting a partition column defeats
            # partition pruning; filters adapt via _bucket_lit instead.
            out = df
            if "case_id" in df.columns:
                out = out.withColumn("case_id", F.col("case_id").cast("string"))
            return out

        # explicit schemas: a table whose commits are all empty (empty or
        # fully-stopworded corpus) reads as an empty DataFrame
        from pysearch.schema import (CORPUS_STATS, DOCS, POSTING_BLOCKS,
                                     TERM_STATS)

        self.postings = _norm(
            self.layout.read_commits(spark, path["postings"],
                                     schema=POSTING_BLOCKS)
        )
        if cache_postings:
            self.postings = self.postings.persist()
        self.docs = _norm(
            self.layout.read_commits(spark, path["docs"], schema=DOCS)
        )
        # (n_docs, avgdl, sum_dl) — sum_dl is the exact long the finalize
        # divided to get avgdl; NRT hybrid search (streaming.
        # search_with_arrivals) re-derives the post-append avgdl from it
        self._corpus: Dict[str, tuple] = {
            str(r["case_id"]): (int(r["n_docs"]), float(r["avgdl"]),
                                int(r["sum_dl"]))
            for r in self.layout.read_commits(
                self.spark, path["corpus_stats"], schema=CORPUS_STATS
            ).collect()
        }
        self._term_stats = _norm(
            self.layout.read_commits(spark, path["term_stats"],
                                     schema=TERM_STATS)
        )
        # pending tombstoned deletes (delete.delete_docs): per-case sorted
        # doc_id arrays, shipped to executors with the scoring closures and
        # applied as a vectorized np.isin drop after block decode.  Size is
        # O(deletes since last compaction) — compaction purges them
        # physically and empties the table (delete.py docstring).
        self._tombstones: Dict[str, np.ndarray] = {}
        if self.layout.list_commits(path["tombstones"]):
            from pysearch.schema import TOMBSTONES

            tdf = self.layout.read_commits(
                spark, path["tombstones"], schema=TOMBSTONES)
            # count BEFORE collecting: a parquet count() is metadata-cheap,
            # and failing here (instead of OOMing in toPandas or shipping an
            # oversized closure to every task) turns the documented
            # "compact before tombstones grow" rule into an enforced bound
            n_pending = tdf.count()
            if n_pending > self.max_pending_tombstones:
                raise RuntimeError(
                    f"index at {index_dir} has {n_pending} pending "
                    f"tombstoned deletes (> max_pending_tombstones="
                    f"{self.max_pending_tombstones}); run "
                    "pysearch.compact.compact_index (CLI: compact-index) "
                    "to purge deletes physically before searching, or "
                    "construct with Searcher(..., max_pending_tombstones=N)"
                )
            tpdf = tdf.toPandas()
            for cid, grp in tpdf.groupby("case_id"):
                self._tombstones[str(cid)] = np.unique(
                    grp["doc_id"].to_numpy(np.int64))
        # partition-column literal type for bucket pruning filters
        self._bucket_is_str = dict(self.postings.dtypes).get("term_bucket") == "string"
        # postings commit dirs frozen against the SAME generation map as
        # the Spark frames above: the driver-direct arrow fetch
        # (_read_blocks_arrow) reads exactly the files this load reads,
        # including the time-travel pinned-commit view
        from pysearch.lineage import _has_parquet

        self._postings_commit_dirs = [
            d for d in self.layout.list_commits(path["postings"])
            if _has_parquet(d)
        ]

    def stale(self) -> bool:
        """True when the on-disk index changed since this Searcher loaded
        (or its manifest vanished mid-rewrite)."""
        try:
            return self._index_sig() != self._manifest_sig
        except FileNotFoundError:
            return True

    def refresh(self) -> None:
        """Reload corpus/term stats and table frames from the current index
        state (after an external append/compaction/delete)."""
        if self.cache_postings:
            try:
                self.postings.unpersist()
            except Exception:
                pass
        self._load()

    def _check_fresh(self) -> None:
        if self.on_stale == "ignore" or not self.stale():
            return
        if self.on_stale == "raise":
            raise RuntimeError(
                f"index at {self.layout.root} changed underneath this "
                "Searcher (append/compaction/delete by another writer); "
                "call refresh() or construct with on_stale='refresh'"
            )
        self.refresh()

    def _bucket_lit(self, buckets):
        return [str(b) for b in buckets] if self._bucket_is_str else list(buckets)

    def _allowed_df(self, case_id: str, filter: Optional[str],
                    filter_docs):
        """Resolve a filter context to a (segment_id, doc_id) DataFrame of
        allowed doc_ids, or None when no filter was given.

        ``filter``: a Spark SQL predicate over the catalog columns
        (doc_id, url, content_hash — e.g. ``"url like 'doc://docs/00%'"``,
        the site:-filter shape); evaluated against the docs table with
        column pruning, so only the referenced columns are read.
        ``filter_docs``: ANY DataFrame with a ``doc_id`` column — lets a
        caller gate search on an arbitrary distributed doc set (a dedup
        survivor set, a quality-score cut, an external allowlist) with no
        driver materialization.  doc_ids are interpreted WITHIN the
        searched case — ids are assigned per case starting at 1, so a set
        derived from another case's rows is a caller bug this API cannot
        detect (the numbers are valid here too).  On a multi-case index
        the set IS semi-joined against the case's catalog, so ids with no
        doc in this case drop out instead of silently polluting the
        segment map; a single-case index (the common shape) skips that
        scan since every id is in range.  Both given -> intersection.

        Scale shape: the allowed set never reaches the driver and is never
        broadcast — it is shuffled once on segment_id and cogrouped with
        the posting blocks, so each segment's scorer receives exactly its
        own slice (doc-range partitioning makes segment_id a pure function
        of doc_id)."""
        if filter is None and filter_docs is None:
            return None
        from pyspark.sql import functions as F

        if filter is not None:
            allowed = (
                self.docs.filter(F.col("case_id") == case_id)
                .filter(F.expr(filter)).select("doc_id")
            )
            if filter_docs is not None:
                allowed = allowed.join(
                    filter_docs.select("doc_id").distinct(),
                    "doc_id", "left_semi")
        else:
            allowed = filter_docs.select("doc_id").distinct()
            if len(self._corpus) > 1:
                allowed = allowed.join(
                    self.docs.filter(F.col("case_id") == case_id)
                    .select("doc_id"), "doc_id", "left_semi")
        return allowed.withColumn(
            "segment_id",
            ((F.col("doc_id") - F.lit(1)) / F.lit(self.segment_size))
            .cast("long"),
        )

    @staticmethod
    def _split_filter_docs(filter_docs):
        """Normalize ``filter_docs``: a distributed DataFrame stays one
        (returned first); a driver-RESIDENT id collection (numpy array,
        list, pandas Series — the caller's explicit "this set is small"
        declaration, the broadcast-build-side analog) comes back as a
        sorted unique int64 array (returned second).  A driver-side set
        composes with the driver-local scoring path — the whole filtered
        query then runs without any Spark job — and falls back to the
        distributed cogroup via ``_ids_df`` when the query itself is too
        big for the local path, with identical results either way (pinned
        by test)."""
        if filter_docs is None:
            return None, None
        from pyspark.sql import DataFrame

        if isinstance(filter_docs, DataFrame):
            return filter_docs, None
        ids = np.unique(np.asarray(list(filter_docs), dtype=np.int64))
        return None, ids

    def _ids_df(self, ids: np.ndarray):
        """Driver-side id array -> single-column DataFrame (the
        distributed-path fallback for a driver-resident filter set)."""
        return self.spark.createDataFrame(
            pd.DataFrame({"doc_id": ids}), schema="doc_id long")

    @staticmethod
    def _cogroup_score(blocks_sel, allowed_df, score_fn, out_schema):
        """Run ``score_fn(key, blocks_pdf, allow_or_None)`` per segment:
        plain groupBy when no filter context, cogroup with the allowed doc
        set otherwise.  A segment with an empty allowed slice short-circuits
        to no hits WITHOUT decoding its blocks (the filter admits nothing
        there); a segment absent from the blocks side returns nothing."""
        if allowed_df is None:
            return (
                blocks_sel.groupBy("segment_id")
                .applyInPandas(lambda key, pdf: score_fn(key, pdf, None),
                               schema=out_schema)
            )

        np_types = {"long": "int64", "double": "float64"}
        empty = pd.DataFrame({
            name: pd.Series([], dtype=np_types[typ])
            for name, typ in (c.strip().rsplit(" ", 1)
                              for c in out_schema.split(","))
        })

        def fn(key, pdf: pd.DataFrame, apdf: pd.DataFrame) -> pd.DataFrame:
            if pdf.empty or apdf.empty:
                return empty
            allow = np.unique(apdf["doc_id"].to_numpy(np.int64))
            return score_fn(key, pdf, allow)

        return (
            blocks_sel.groupBy("segment_id")
            .cogroup(allowed_df.groupBy("segment_id"))
            .applyInPandas(fn, schema=out_schema)
        )

    # ------------------------------------------------------------------
    # driver-local scoring fast path (small candidate volumes).
    #
    # A distributed scoring job pays fixed latency — scan task scheduling,
    # a segment_id exchange, pandas-worker round trips, result fetch — that
    # dwarfs the arithmetic when the query's candidate postings are a few
    # MB packed.  Below the LOCAL_MAX_POSTINGS gate the blocks are fetched
    # with ONE scan-only job (partition/row-group pruning still applies;
    # no exchange, no Python workers) and scored in-process with the SAME
    # per-segment kernels, so results are bit-identical by construction
    # (pinned by test).  Driver work/memory is bounded by the gate —
    # O(candidate volume), the same class as a broadcast join's build side.
    # Filtered queries (distributed allowed set) and pruned queries always
    # take the distributed path.

    _LOCAL_COLS = ("segment_id", "term", "n", "doc_ids_bin", "tfs_bin",
                   "dls_bin", "crc32")
    _LOCAL_COLS_POS = _LOCAL_COLS + ("pos_bin", "pos_crc32")

    def _use_local(self, vol: int, prune: bool = False,
                   allowed_df=None) -> bool:
        """True when the driver-local scoring path applies: candidate
        volume under the gate, no distributed filter context, and the
        block-max prune not in play (tests force pruning with
        prune_min_postings=0; the prune gate wins so pruning paths stay
        exercised)."""
        return (allowed_df is None
                and 0 < self.local_max_postings
                and vol <= self.local_max_postings
                and not (prune and vol > self.prune_min_postings))

    def _use_local_batch(self, vols) -> bool:
        """Batch variant of _use_local (``vols``: each plan's own
        candidate-postings volume).  The shared decode amortizes the scan
        across plans, so the batch may run driver-side when (a) EVERY
        plan clears the single-query gate — the per-query loop the caller
        could have written would already run each of them driver-side,
        and the batch does strictly less decode work than that loop —
        and (b) the total driver work (Σ per-plan volumes, an upper bound
        of shared decode + per-plan scoring) stays under
        LOCAL_BATCH_FACTOR × the gate, the measured crossover where
        single-threaded driver scoring overtakes the distributed batch
        scan's fixed cost (0.81 s local vs 1.19 s distributed at
        Σ=1.68M postings / 20 plans on the bench query log, results
        asserted identical).  Above either bound the distributed
        shared-decode scan runs — the scale shape for big logs."""
        if not vols or self.local_max_postings <= 0:
            return False
        factor = getattr(self, "local_batch_factor", LOCAL_BATCH_FACTOR)
        return (max(vols) <= self.local_max_postings
                and sum(vols) <= factor * self.local_max_postings)

    def _read_blocks_arrow(self, case_id: str, terms, cols):
        """Driver-direct parquet read of the candidate blocks: same commit
        dirs, partition pruning (term_bucket hive dirs), filters, and
        columns as the Spark scan-only fetch — minus the Spark job's fixed
        scheduling latency.  Kernel inputs are order-insensitive (the
        per-segment scorers re-group rows by term; pinned by the
        partitioning-invariance goldens), so file-listing order differences
        vs the Spark scan cannot change results."""
        import pyarrow as pa
        import pyarrow.dataset as ds

        buckets = sorted({term_bucket(t, self.n_buckets) for t in terms})
        part = ds.partitioning(
            pa.schema([("term_bucket", pa.int32())]), flavor="hive")
        flt = ((ds.field("case_id") == case_id)
               & ds.field("term_bucket").isin([int(b) for b in buckets])
               & ds.field("term").isin(list(terms)))
        frames = [
            ds.dataset(d, format="parquet", partitioning=part)
            .to_table(columns=list(cols), filter=flt).to_pandas()
            for d in self._postings_commit_dirs
        ]
        frames = [f for f in frames if len(f)]
        if not frames:
            return pd.DataFrame(columns=list(cols))
        return (frames[0] if len(frames) == 1
                else pd.concat(frames, ignore_index=True))

    def _collect_blocks(self, blocks_df, positions: bool = False,
                        spec=None):
        """One scan-only fetch of the candidate blocks' packed payloads to
        the driver (bounded by the local_max_postings gate), CRC-verified
        exactly like the distributed scorers.  ``spec=(case_id, terms)``
        routes the fetch through the driver-direct arrow read — no Spark
        job at all; without a spec (or with a persisted postings cache,
        which lives in executor memory) the Spark scan-only job runs."""
        import zlib

        cols = self._LOCAL_COLS_POS if positions else self._LOCAL_COLS
        if (spec is not None and not self.cache_postings
                and os.environ.get("PYSEARCH_LOCAL_ARROW", "1") != "0"):
            pdf = self._read_blocks_arrow(spec[0], spec[1], cols)
        else:
            pdf = blocks_df.select(*cols).toPandas()
        for ib, tb, db, crc in zip(pdf["doc_ids_bin"], pdf["tfs_bin"],
                                   pdf["dls_bin"], pdf["crc32"]):
            got = zlib.crc32(ib) ^ zlib.crc32(tb) ^ zlib.crc32(db)
            if got != crc:
                raise IOError(
                    f"posting block CRC mismatch: {got} != {crc}")
        if positions:
            for pb, pcrc in zip(pdf["pos_bin"], pdf["pos_crc32"]):
                if zlib.crc32(pb) != pcrc:
                    raise IOError("position payload CRC mismatch")
        return pdf

    @staticmethod
    def _merge_local_topk(ids_all, scores_all, k: int) -> pd.DataFrame:
        if not ids_all:
            # typed like the distributed path's toPandas of an empty frame
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "score": pd.Series([], dtype="float64")})
        ids = np.concatenate(ids_all)
        scores = np.concatenate(scores_all)
        o = np.lexsort((ids, -scores))[:k]
        return pd.DataFrame({"doc_id": ids[o], "score": scores[o]})

    def _score_blocks_local(self, blocks_df, idfs, qtf, avgdl, k,
                            require: int = 0,
                            exclude: Optional[np.ndarray] = None,
                            qterms: Optional[List[str]] = None,
                            window: Optional[int] = None,
                            must_terms=None, not_terms=None,
                            spec=None,
                            allow: Optional[np.ndarray] = None
                            ) -> pd.DataFrame:
        """Driver-local counterpart of _score_blocks /
        _score_blocks_phrase / _score_blocks_boolean: same per-segment
        kernels, same (score desc, doc_id asc) merge.  ``allow`` is a
        driver-resident filter context (sorted unique doc_ids) — passed
        whole to every segment's kernel, where membership testing gives
        exactly the per-segment slice the distributed cogroup hands over
        (segment_id is a pure function of doc_id, so out-of-segment ids
        in the array can never match that segment's postings)."""
        phrase = qterms is not None
        pdf = self._collect_blocks(blocks_df, positions=phrase, spec=spec)
        ids_all: List[np.ndarray] = []
        scores_all: List[np.ndarray] = []
        for _seg, g in pdf.groupby("segment_id", sort=False):
            if phrase:
                rows = list(zip(g["term"], g["n"], g["doc_ids_bin"],
                                g["tfs_bin"], g["dls_bin"], g["pos_bin"]))
                ids, scores = sc.score_segment_blocks_phrase(
                    rows, idfs, qterms, qtf, avgdl, k, exclude=exclude,
                    window=window, allow=allow)
            else:
                rows = list(zip(g["term"], g["n"], g["doc_ids_bin"],
                                g["tfs_bin"], g["dls_bin"]))
                if must_terms is not None or not_terms is not None:
                    ids, scores = sc.score_segment_blocks_boolean(
                        rows, idfs, qtf, avgdl, k,
                        must_terms=must_terms or (),
                        not_terms=not_terms or (), exclude=exclude,
                        allow=allow)
                else:
                    ids, scores = sc.score_segment_blocks(
                        rows, idfs, qtf, avgdl, k, require_terms=require,
                        exclude=exclude, allow=allow)
            if ids.size:
                ids_all.append(ids)
                scores_all.append(scores)
        return self._merge_local_topk(ids_all, scores_all, k)

    def _many_pass_local(self, blocks_df, plans: Dict[str, tuple],
                         avgdl: float, k: int, mode: str,
                         excl: Optional[np.ndarray],
                         spec=None) -> pd.DataFrame:
        """Driver-local counterpart of _many_pass: shared decode per
        segment via the multi-plan kernels, per-query merge in the same
        (qid asc, score desc, doc_id asc) order."""
        phrase = mode in ("phrase", "near")
        pdf = self._collect_blocks(blocks_df, positions=phrase, spec=spec)
        per_ids: Dict[str, List[np.ndarray]] = {}
        per_scores: Dict[str, List[np.ndarray]] = {}
        for _seg, g in pdf.groupby("segment_id", sort=False):
            if phrase:
                rows = list(zip(g["term"], g["n"], g["doc_ids_bin"],
                                g["tfs_bin"], g["dls_bin"], g["pos_bin"]))
                qids, ids_l, scores_l = sc.score_segment_blocks_multi_phrase(
                    rows, plans, avgdl, k, exclude=excl)
            else:
                rows = list(zip(g["term"], g["n"], g["doc_ids_bin"],
                                g["tfs_bin"], g["dls_bin"]))
                if mode == "boolean":
                    qids, ids_l, scores_l = (
                        sc.score_segment_blocks_multi_boolean(
                            rows, plans, avgdl, k, exclude=excl))
                else:
                    qids, ids_l, scores_l = sc.score_segment_blocks_multi(
                        rows, plans, avgdl, k, exclude=excl)
            for qid, i, s in zip(qids, ids_l, scores_l):
                per_ids.setdefault(qid, []).append(i)
                per_scores.setdefault(qid, []).append(s)
        frames = []
        for qid in sorted(per_ids):
            ids = np.concatenate(per_ids[qid])
            scores = np.concatenate(per_scores[qid])
            o = np.lexsort((ids, -scores))[:k]
            frames.append(pd.DataFrame({
                "qid": qid, "doc_id": ids[o], "score": scores[o]}))
        if not frames:
            return pd.DataFrame({"qid": pd.Series([], dtype="object"),
                                 "doc_id": pd.Series([], dtype="int64"),
                                 "score": pd.Series([], dtype="float64")})
        return pd.concat(frames, ignore_index=True)

    # ------------------------------------------------------------------
    def _analyze_query(self, query: str):
        terms = self._analyze(query)
        return terms, Counter(terms)

    def _local_vocab(self, case_id: str) -> Optional[dict]:
        """The case's whole {term: df} map when the vocabulary fits the
        LOCAL_MAX_VOCAB gate, else None (decided once per load from a
        metadata-cheap parquet row count; the map itself is one bounded
        collect of the term_stats aggregate, cached per case)."""
        if case_id in self._vocab_cache:
            return self._vocab_cache[case_id]
        out = None
        if self.local_max_vocab > 0:
            if self._term_stats_rows is None:
                self._term_stats_rows = self._term_stats.count()
            if self._term_stats_rows <= self.local_max_vocab:
                from pyspark.sql import functions as F

                rows = (
                    self._term_stats.filter(F.col("case_id") == case_id)
                    # df is additive across append-batch stats commits
                    .groupBy("term").agg(F.sum("df").alias("df"))
                    .collect()
                )
                out = {r["term"]: int(r["df"]) for r in rows}
        self._vocab_cache[case_id] = out
        return out

    def _catalog_keys(self, case_id: str) -> Optional[tuple]:
        """The case's catalog key columns as two LOCAL-relation DataFrames
        ``(url_df, content_hash_df)`` when the catalog fits the
        LOCAL_MAX_CATALOG gate, else None.  Gate decided from the
        already-loaded corpus stats (no job); one bounded two-column
        collect per load, cached per case — index metadata exactly like
        the term-df cache.  Lets the NRT hybrid's already-indexed
        anti-joins build their broadcast side from an in-memory relation
        instead of re-scanning the docs table per hybrid query.  (Local
        relations, not ``isin`` literal lists: Column.isin pays a py4j
        round trip per element, which is seconds at catalog sizes.)"""
        if case_id in self._catalog_keys_cache:
            return self._catalog_keys_cache[case_id]
        out = None
        n_docs = self._corpus.get(case_id, (0,))[0]
        if 0 < self.local_max_catalog and n_docs <= self.local_max_catalog:
            from pyspark.sql import functions as F

            pdf = (
                self.docs.filter(F.col("case_id") == case_id)
                .select("url", "content_hash").toPandas()
            )
            out = (
                self.spark.createDataFrame(pdf[["url"]],
                                           schema="url string"),
                self.spark.createDataFrame(pdf[["content_hash"]],
                                           schema="content_hash string"),
            )
        self._catalog_keys_cache[case_id] = out
        return out

    def _term_dfs(self, case_id: str, terms: List[str]) -> Dict[str, int]:
        from pyspark.sql import functions as F

        if not terms:
            return {}
        missing = [
            t for t in set(terms) if (case_id, t) not in self._df_cache
        ]
        if missing:
            vocab = self._local_vocab(case_id)
            if vocab is not None:
                for t in missing:  # cache absent terms as df=0 too
                    self._df_cache[(case_id, t)] = vocab.get(t, 0)
            else:
                buckets = sorted({term_bucket(t, self.n_buckets)
                                  for t in missing})
                rows = (
                    self._term_stats.filter(
                        (F.col("case_id") == case_id)
                        & F.col("term_bucket").isin(self._bucket_lit(buckets))
                        & F.col("term").isin(missing)
                    )
                    # delta finalize appends one stats commit per append
                    # batch; df is additive, so a term's df is the SUM
                    # over commits
                    .groupBy("term").agg(F.sum("df").alias("df"))
                    .collect()
                )
                found = {r["term"]: int(r["df"]) for r in rows}
                for t in missing:  # cache absent terms as df=0 too
                    self._df_cache[(case_id, t)] = found.get(t, 0)
        return {
            t: self._df_cache[(case_id, t)]
            for t in set(terms)
            if self._df_cache[(case_id, t)] > 0
        }

    def _apply_boosts(self, idfs: Dict[str, float],
                      raw_boosts: Optional[Dict[str, float]],
                      boosts: Optional[Dict[str, float]]) -> Dict[str, float]:
        """Multiply per-term boosts into the idf weights — ONE consistent
        per-term weight feeds scoring, the WAND/block-max bounds, and the
        batched plans, so boosted queries stay lossless under pruning.
        ``raw_boosts`` keys are pre-analysis tokens (the ``^`` syntax) and
        run through the same analyzer chain as the query; ``boosts`` keys
        are already-analyzed terms.  Both compose multiplicatively."""
        if not raw_boosts and not boosts:
            return idfs
        mult: Dict[str, float] = {}
        for raw, b in (raw_boosts or {}).items():
            for t in set(self._analyze(raw)):
                mult[t] = mult.get(t, 1.0) * b
        for t, b in (boosts or {}).items():
            if b <= 0:
                raise ValueError(f"term boost must be > 0, got {t!r}: {b}")
            mult[t] = mult.get(t, 1.0) * b
        return {t: w * mult.get(t, 1.0) for t, w in idfs.items()}

    # ------------------------------------------------------------------
    def search_ids(self, query: str, k: int = DEFAULT_MAX_RESULTS,
                   case_id: str = "0", prune: bool = True,
                   mode: str = "any",
                   window: Optional[int] = None,
                   boosts: Optional[Dict[str, float]] = None,
                   distance: Optional[int] = None,
                   filter: Optional[str] = None,
                   filter_docs=None,
                   offset: int = 0) -> pd.DataFrame:
        """Top-k (doc_id, score), deterministic. k<0 -> reference default
        (index_search.go:96-97).

        ``mode="any"`` (default) is the reference's OR-of-terms match query;
        ``mode="all"`` requires every analyzed query term to occur in the
        doc — BM25-scored posting-list intersection (north-rule: "top-k
        query engine using posting-list intersection").  A query term absent
        from the whole corpus makes the conjunctive result empty.
        ``mode="phrase"`` (requires an index built with
        ``store_positions=True``) additionally requires the analyzed terms
        at CONSECUTIVE positions — posting-list intersection plus
        position-adjacency from the index's pos_bin; phrase hits score
        bit-identically to their mode="all" scores.
        ``mode="near"`` (positions required too) is unordered PROXIMITY
        retrieval: the distinct analyzed terms must co-occur within
        ``window`` token positions (max chosen position − min chosen
        position ≤ window, any order — Lucene-span-style); near hits also
        score bit-identically to their mode="all" scores.  window=1 with
        two terms admits adjacency in either order, so phrase hits are a
        subset of near hits at window=len(terms)−1.
        Phrase/near queries skip WAND pruning: their candidate volume is
        already the (small) conjunctive intersection of the query terms.
        ``mode="boolean"`` parses Lucene classic ``+must -must_not
        should`` syntax and routes to :meth:`search_ids_boolean`;
        ``mode="fuzzy"`` parses ``term~d`` edit-distance, ``term*``
        prefix-wildcard and ``/regexp/`` whole-term-regexp clauses
        (unsuffixed terms use ``distance``, default 0) and routes to
        :meth:`search_ids_fuzzy`.

        Per-term BOOSTS (the reference's commented-out aspiration,
        search_pdfs.go:176-186): ``spark^2 join fast^0.5`` in the query
        string, or ``boosts={analyzed_term: w}``.  A boost multiplies the
        term's idf weight, the ONE weight that feeds scoring and every
        pruning bound, so boosted queries stay bit-identical across
        prune on/off and the batched path (enforced by test).  Boosts
        compose multiplicatively and must be > 0.

        FILTER CONTEXT (Lucene filtered-query semantics): ``filter`` — a
        Spark SQL predicate over the catalog columns (url, content_hash,
        doc_id); ``filter_docs`` — any DataFrame with a doc_id column
        (dedup survivors, a quality cut, an allowlist).  Only allowed docs
        can match; BM25 stats (idf, avgdl) stay CORPUS-wide, exactly like
        a Lucene filter clause.  A DataFrame allowed set stays distributed
        end to end: one segment_id shuffle, cogrouped with the posting
        blocks — no driver collect, no broadcast — and WAND/block-max
        pruning stays lossless because phase-1 θ is established from
        FILTERED scores while block bounds remain valid upper bounds a
        fortiori.  ``filter_docs`` may instead be a driver-RESIDENT id
        collection (numpy array / list) when the caller already holds the
        set in bounded memory — the broadcast-hint analog: it composes
        with the driver-local scoring path (the filtered query then runs
        with no distributed job), and converts to the same cogroup when
        the query is too big for that path — results identical either
        way (pinned by test).

        ``offset`` paginates the deterministic total order (Lucene
        searchAfter shape): ranks [offset, offset+k) are returned, at
        O(offset+k) cost per page — the funnel fetches the top
        offset+k and slices, the standard deep-pagination tradeoff."""
        from pyspark.sql import functions as F

        self._check_fresh()
        if offset < 0:
            raise ValueError(f"offset must be >= 0, got {offset}")
        if mode == "boolean":
            must_raw, should_raw, not_raw = parse_boolean(query)
            return self.search_ids_boolean(
                must=" ".join(must_raw), should=" ".join(should_raw),
                must_not=" ".join(not_raw), k=k, case_id=case_id,
                boosts=boosts, filter=filter, filter_docs=filter_docs,
                offset=offset)
        if mode == "fuzzy":
            return self.search_ids_fuzzy(
                query, k=k, case_id=case_id, prune=prune,
                distance=distance, boosts=boosts, filter=filter,
                filter_docs=filter_docs, offset=offset)
        if mode not in ("any", "all", "phrase", "near"):
            raise ValueError(
                "mode must be any|all|phrase|near|boolean|fuzzy, "
                f"got {mode!r}")
        if mode in ("phrase", "near") and not self.positions_stored:
            raise ValueError(
                f"mode={mode!r} needs an index built with "
                "store_positions=True"
            )
        if mode == "near" and (window is None or window < 0):
            raise ValueError("mode='near' needs window >= 0")
        if k is None or k < 0:
            k = DEFAULT_MAX_RESULTS
        k_fetch = k + offset
        query, raw_boosts = parse_boosts(query)
        terms, qtf = self._analyze_query(query)
        if case_id not in self._corpus:
            return pd.DataFrame(columns=["doc_id", "score"])
        n_docs, avgdl, _sum_dl = self._corpus[case_id]
        dfs = self._term_dfs(case_id, terms)
        live = [t for t in set(terms) if t in dfs]
        if not live or (mode in ("all", "phrase", "near")
                        and len(live) < len(set(terms))):
            return pd.DataFrame(columns=["doc_id", "score"])
        idfs = self._apply_boosts(
            {t: sc.idf(n_docs, dfs[t]) for t in live}, raw_boosts, boosts)
        require = len(live) if mode == "all" else 0
        buckets = sorted({term_bucket(t, self.n_buckets) for t in live})

        blocks = self.postings.filter(
            (F.col("case_id") == case_id)
            & F.col("term_bucket").isin(self._bucket_lit(buckets))
            & F.col("term").isin(live)
        )

        excl = self._tombstones.get(case_id)
        filter_docs, filter_ids = self._split_filter_docs(filter_docs)
        if filter_ids is not None and filter is not None:
            # predicate + driver-side set: intersect distributed (rare
            # combination; correctness over the local shortcut)
            filter_docs, filter_ids = self._ids_df(filter_ids), None
        allowed = self._allowed_df(case_id, filter, filter_docs)
        vol = sum(dfs[t] for t in live)
        if mode in ("phrase", "near"):
            if self._use_local(vol, allowed_df=allowed):
                pdf = self._score_blocks_local(
                    blocks, idfs, qtf, avgdl, k_fetch, exclude=excl,
                    qterms=terms,
                    window=window if mode == "near" else None,
                    spec=(case_id, live), allow=filter_ids)
            else:
                if filter_ids is not None:
                    allowed = self._allowed_df(
                        case_id, None, self._ids_df(filter_ids))
                pdf = self._score_blocks_phrase(
                    blocks, idfs, terms, qtf, avgdl, k_fetch, exclude=excl,
                    window=window if mode == "near" else None,
                    allowed_df=allowed)
            return pdf.iloc[offset:offset + k].reset_index(drop=True)

        if self._use_local(vol, prune=prune, allowed_df=allowed):
            pdf = self._score_blocks_local(blocks, idfs, qtf, avgdl,
                                           k_fetch, require, exclude=excl,
                                           spec=(case_id, live),
                                           allow=filter_ids)
            return pdf.iloc[offset:offset + k].reset_index(drop=True)
        if filter_ids is not None:
            # too big for the local path: the driver-side set joins the
            # distributed cogroup exactly like a DataFrame filter_docs
            allowed = self._allowed_df(case_id, None, self._ids_df(filter_ids))

        # pruning pays for itself only when there is real volume to skip;
        # df is already known, so gate on total candidate postings
        p1_pdf = None
        if prune and vol > self.prune_min_postings:
            blocks, p1_pdf, allowed = self._prune_blocks(
                blocks, idfs, qtf, avgdl, k_fetch, require, exclude=excl,
                allowed_df=allowed)

        pdf = self._score_blocks(blocks, idfs, qtf, avgdl, k_fetch, require,
                                 exclude=excl, allowed_df=allowed)
        if p1_pdf is not None:
            pdf = pd.concat([p1_pdf, pdf], ignore_index=True)
        pdf = pdf.sort_values(["score", "doc_id"], ascending=[False, True],
                              kind="stable"
                              ).iloc[offset:offset + k].reset_index(drop=True)
        return pdf

    def count(self, query: str, case_id: str = "0", mode: str = "any",
              window: Optional[int] = None,
              filter: Optional[str] = None, filter_docs=None) -> int:
        """TOTAL-HITS count (Lucene IndexSearcher.count analog): how many
        docs match the query under the same match semantics as
        :meth:`search_ids` (mode any|all|phrase|near, tombstones and the
        filter context applied), without materializing a ranking.

        Scale shape: a single-term unfiltered count is answered from
        term_stats METADATA alone (df — no posting decode, Lucene's
        TermQuery shortcut); otherwise one bucket-pruned scan of the query
        terms' blocks counts matches per segment (doc-range partitioning
        makes per-segment counts disjoint, so the driver sums
        O(segments) longs — no doc ids ever leave the executors)."""
        from pyspark.sql import functions as F

        self._check_fresh()
        if mode not in ("any", "all", "phrase", "near"):
            raise ValueError(
                f"count() supports mode any|all|phrase|near, got {mode!r}")
        if mode in ("phrase", "near") and not self.positions_stored:
            raise ValueError(
                f"mode={mode!r} needs an index built with "
                "store_positions=True")
        if mode == "near" and (window is None or window < 0):
            raise ValueError("mode='near' needs window >= 0")
        # boosts weight scores and counting has no scores, but the ^w
        # syntax must still PARSE so 'relam^2 fast' counts the same match
        # set search_ids ranks (an unstripped boost would tokenize into a
        # bogus extra term)
        query, _raw_boosts = parse_boosts(query)
        terms = self._analyze(query)
        if not terms or case_id not in self._corpus:
            return 0
        dfs = self._term_dfs(case_id, terms)
        live = sorted(t for t in set(terms) if t in dfs)
        if not live or (mode != "any" and len(live) < len(set(terms))):
            return 0
        excl = self._tombstones.get(case_id)
        filter_docs, filter_ids = self._split_filter_docs(filter_docs)
        if filter_ids is not None and filter is not None:
            filter_docs, filter_ids = self._ids_df(filter_ids), None
        allowed = self._allowed_df(case_id, filter, filter_docs)
        if (len(live) == 1 and mode in ("any", "all") and excl is None
                and allowed is None and filter_ids is None):
            return int(dfs[live[0]])  # metadata-only: count == df

        require = len(live) if mode == "all" else 0
        qterms = terms if mode in ("phrase", "near") else None
        win = window if mode == "near" else None
        buckets = sorted({term_bucket(t, self.n_buckets) for t in live})
        blocks = self.postings.filter(
            (F.col("case_id") == case_id)
            & F.col("term_bucket").isin(self._bucket_lit(buckets))
            & F.col("term").isin(live)
        )
        if self._use_local(sum(dfs[t] for t in live), allowed_df=allowed):
            # same one-scan fetch + per-segment count kernel, in-process
            pdf = self._collect_blocks(blocks, positions=qterms is not None,
                                       spec=(case_id, live))
            total = 0
            for _seg, g in pdf.groupby("segment_id", sort=False):
                if qterms is not None:
                    rows = list(zip(g["term"], g["n"], g["doc_ids_bin"],
                                    g["tfs_bin"], g["dls_bin"],
                                    g["pos_bin"]))
                else:
                    rows = list(zip(g["term"], g["n"], g["doc_ids_bin"],
                                    g["tfs_bin"], g["dls_bin"]))
                total += sc.count_segment_docs(rows, live, require=require,
                                               exclude=excl,
                                               allow=filter_ids,
                                               qterms=qterms, window=win)
            return total
        if filter_ids is not None:
            allowed = self._allowed_df(case_id, None, self._ids_df(filter_ids))

        cols = ["segment_id", "term", "n", "doc_ids_bin", "tfs_bin",
                "dls_bin", "crc32"]
        if qterms is not None:
            cols += ["pos_bin", "pos_crc32"]

        def count_one(key, pdf: pd.DataFrame,
                      allow: Optional[np.ndarray]) -> pd.DataFrame:
            import zlib

            for ib, tb, db, crc in zip(pdf["doc_ids_bin"], pdf["tfs_bin"],
                                       pdf["dls_bin"], pdf["crc32"]):
                got = zlib.crc32(ib) ^ zlib.crc32(tb) ^ zlib.crc32(db)
                if got != crc:
                    raise IOError(
                        f"posting block CRC mismatch in segment {key[0]}: "
                        f"{got} != {crc}"
                    )
            if qterms is not None:
                # the positions payload gets the same verify-before-decode
                # treatment as every scoring path
                for pb, pcrc in zip(pdf["pos_bin"], pdf["pos_crc32"]):
                    if zlib.crc32(pb) != pcrc:
                        raise IOError(
                            f"positions CRC mismatch in segment {key[0]}")
                rows = list(zip(pdf["term"], pdf["n"], pdf["doc_ids_bin"],
                                pdf["tfs_bin"], pdf["dls_bin"],
                                pdf["pos_bin"]))
            else:
                rows = list(zip(pdf["term"], pdf["n"], pdf["doc_ids_bin"],
                                pdf["tfs_bin"], pdf["dls_bin"]))
            n = sc.count_segment_docs(rows, live, require=require,
                                      exclude=excl, allow=allow,
                                      qterms=qterms, window=win)
            return pd.DataFrame({"n": np.asarray([n], dtype=np.int64)})

        sdf = self._cogroup_score(blocks.select(*cols), allowed, count_one,
                                  "n long")
        row = sdf.agg(F.sum("n").alias("total")).collect()[0]
        return int(row["total"] or 0)

    def search_ids_boolean(self, must: str = "", should: str = "",
                           must_not: str = "",
                           k: int = DEFAULT_MAX_RESULTS,
                           case_id: str = "0",
                           boosts: Optional[Dict[str, float]] = None,
                           filter: Optional[str] = None,
                           filter_docs=None,
                           offset: int = 0) -> pd.DataFrame:
        """Lucene-BooleanQuery top-k: a doc matches iff it contains EVERY
        analyzed ``must`` term and NO analyzed ``must_not`` term; its score
        is the BM25 sum over the must+should terms it contains (boosted via
        ``^`` syntax or ``boosts=``, exactly like search_ids).  Also
        reachable as ``search_ids(query, mode="boolean")`` with Lucene
        classic syntax: ``+spark -join fast^0.5``.

        Semantics pinned by tests:
        - must-only queries score bit-identically to ``mode="all"``,
          should-only to ``mode="any"`` (all paths funnel through
          score._topk_from_decoded);
        - a must term absent from the corpus -> empty result (as in
          mode="all"); an absent should term drops silently; an absent
          must_not term is a no-op;
        - no live positive (must/should) clause -> empty result (Lucene's
          pure-negation MatchNoDocs behavior);
        - a term in both must and must_not -> empty (gates contradict).

        Scale shape: both gates are segment-local because all of a doc's
        postings live in exactly one segment (doc-range partitioning) —
        the must gate is a posting-list intersection, the must_not gate a
        postings union merged into the tombstone excludes, and the global
        answer stays the top-k of the union of segment top-ks.  No
        block-max prune on this path: must queries are already bounded by
        the (small) intersection candidate set, and a θ bound that stays
        lossless under not-term gating needs not-aware block metadata —
        decode volume is the scan of must ∪ should ∪ must_not postings,
        same order as mode="all" plus the prohibited terms' lists."""
        from pyspark.sql import functions as F

        self._check_fresh()
        if k is None or k < 0:
            k = DEFAULT_MAX_RESULTS
        if offset < 0:
            raise ValueError(f"offset must be >= 0, got {offset}")
        must_q, must_boosts = parse_boosts(must)
        should_q, should_boosts = parse_boosts(should)
        if any(_BOOST_RE.match(t) for t in must_not.split()):
            raise ValueError(
                "boost on a MUST_NOT clause is meaningless "
                "(prohibited terms gate, they never score)")
        must_terms = self._analyze(must_q)
        should_terms = self._analyze(should_q)
        not_terms = sorted(set(self._analyze(must_not)))
        raw_boosts = dict(must_boosts)
        for t, b in should_boosts.items():
            raw_boosts[t] = raw_boosts.get(t, 1.0) * b
        pos_terms = must_terms + should_terms
        qtf = Counter(pos_terms)
        empty = pd.DataFrame(columns=["doc_id", "score"])
        if case_id not in self._corpus or not pos_terms:
            return empty
        n_docs, avgdl, _sum_dl = self._corpus[case_id]
        dfs = self._term_dfs(case_id, pos_terms + not_terms)
        must_live = sorted({t for t in must_terms if t in dfs})
        if len(must_live) < len(set(must_terms)):
            return empty  # a required term is corpus-absent
        live = sorted({t for t in pos_terms if t in dfs})
        if not live:
            return empty
        not_live = [t for t in not_terms if t in dfs]
        idfs = self._apply_boosts(
            {t: sc.idf(n_docs, dfs[t]) for t in live}, raw_boosts, boosts)
        scan_terms = sorted(set(live) | set(not_live))
        buckets = sorted({term_bucket(t, self.n_buckets)
                          for t in scan_terms})
        blocks = self.postings.filter(
            (F.col("case_id") == case_id)
            & F.col("term_bucket").isin(self._bucket_lit(buckets))
            & F.col("term").isin(scan_terms)
        )
        excl = self._tombstones.get(case_id)
        filter_docs, filter_ids = self._split_filter_docs(filter_docs)
        if filter_ids is not None and filter is not None:
            filter_docs, filter_ids = self._ids_df(filter_ids), None
        allowed = self._allowed_df(case_id, filter, filter_docs)
        if self._use_local(sum(dfs[t] for t in scan_terms),
                           allowed_df=allowed):
            pdf = self._score_blocks_local(
                blocks, idfs, qtf, avgdl, k + offset, exclude=excl,
                must_terms=must_live, not_terms=not_live,
                spec=(case_id, scan_terms), allow=filter_ids)
        else:
            if filter_ids is not None:
                allowed = self._allowed_df(
                    case_id, None, self._ids_df(filter_ids))
            pdf = self._score_blocks_boolean(
                blocks, idfs, qtf, avgdl, k + offset, must_terms=must_live,
                not_terms=not_live, exclude=excl, allowed_df=allowed)
        return pdf.iloc[offset:offset + k].reset_index(drop=True)

    def expand_fuzzy(self, case_id: str,
                     fuzzy: "Dict[str, Tuple[int, float]]",
                     max_expansions: int = 50,
                     prefixes: "Optional[Dict[str, float]]" = None,
                     regexps: "Optional[Dict[str, float]]" = None
                     ) -> "Dict[str, Tuple[float, int]]":
        """Expand query terms to corpus terms — the Lucene MultiTermQuery
        (FuzzyQuery / PrefixQuery / RegexpQuery) rewrite over the
        term_stats table.  ``fuzzy`` maps analyzed term -> (distance,
        boost); ``prefixes`` maps lowercased prefix -> boost; ``regexps``
        maps lowercased regexp body -> boost (anchored here as
        ``^(?:body)$`` — Lucene's whole-term match rule; the dialect is
        Spark's JVM rlike).  Returns {expanded_term: (weight, df)} where
        a fuzzy expansion weighs boost * (1 - dist / min(len(q), len(e)))
        (Lucene's FuzzyTermsEnum similarity boost; exact matches weigh
        boost * 1), a prefix/regexp expansion weighs its boost (constant
        score per clause, Lucene's MultiTermQuery rewrite), and an
        expanded term matched by several query clauses keeps its MAX
        weight (Lucene's BooleanQuery rewrite dedup).

        Scale shape: ONE distributed job over term_stats — a
        vocabulary-sized metadata table, not the postings — with a length
        band |len(e) - len(q)| <= d (fuzzy) / a startswith predicate
        (prefix) / an rlike (regexp) pushed to the parquet scan, native
        F.levenshtein (JVM codegen, no UDF) for the distance, and
        Lucene's top-``max_expansions`` cap applied per query clause IN
        Spark (row_number over (weight desc, df desc, term asc) —
        deterministic) so at most |clauses| * max_expansions rows reach
        the driver no matter how loose the clause or how large the
        vocabulary."""
        import re as _re
        from functools import reduce
        from operator import or_

        from pyspark.sql import Window
        from pyspark.sql import functions as F

        qrows = [(q, int(d), float(b), "f") for q, (d, b) in fuzzy.items()]
        qrows += [(p, 0, float(b), "p") for p, b in (prefixes or {}).items()]
        for r, b in (regexps or {}).items():
            anchored = f"^(?:{r})$"
            try:  # fail fast on the driver, not inside an executor task
                _re.compile(anchored)
            except _re.error as e:
                raise ValueError(f"bad regexp clause /{r}/: {e}") from None
            qrows.append((anchored, 0, float(b), "r"))
        # vocabulary-local rewrite (see LOCAL_MAX_VOCAB): fuzzy/prefix
        # clauses expand driver-side over the cached {term: df} map with
        # the same arithmetic and ranking; regexp clauses are evaluated
        # against the same vocabulary by the SAME JVM java.util.regex
        # engine rlike runs (one py4j stream-filter call, no Spark job,
        # no Python-re dialect risk — see _regexp_vocab_jvm)
        vocab = self._local_vocab(case_id)
        if vocab is not None:
            rx_matches = {
                q: self._regexp_vocab_jvm(list(vocab), q)
                for q, _d, _b, kind in qrows if kind == "r"
            }
            return self._expand_fuzzy_local(vocab, qrows, max_expansions,
                                            rx_matches)
        conds = [
            (F.length("term") >= len(q) - d) & (F.length("term") <= len(q) + d)
            & (F.levenshtein(F.col("term"), F.lit(q)) <= d)
            if kind == "f"
            else (F.col("term").startswith(q) if kind == "p"
                  else F.col("term").rlike(q))
            for q, d, _b, kind in qrows
        ]
        cand = (
            self._term_stats.filter(F.col("case_id") == case_id)
            .filter(reduce(or_, conds))
            # df is additive across append-batch stats commits
            .groupBy("term").agg(F.sum("df").alias("df"))
        )
        q_df = self.spark.createDataFrame(
            qrows, "q string, d int, b double, kind string")
        match = (
            (F.col("kind") == "f")
            & (F.levenshtein(F.col("term"), F.col("q")) <= F.col("d"))
        ) | ((F.col("kind") == "p")
             & F.col("term").startswith(F.col("q"))) | (
            (F.col("kind") == "r")
            & F.regexp_like(F.col("term"), F.col("q")))
        sim = (F.lit(1.0)
               - F.levenshtein(F.col("term"), F.col("q"))
               / F.least(F.length("term"), F.length("q")))
        j = (
            cand.join(F.broadcast(q_df), match)
            .withColumn(
                "w",
                F.col("b") * F.when(F.col("kind") == "f", sim)
                             .otherwise(F.lit(1.0)),
            )
            .filter(F.col("w") > 0)  # dist == min length conveys nothing
        )
        win = Window.partitionBy("q", "kind").orderBy(
            F.desc("w"), F.desc("df"), F.asc("term"))
        rows = (
            j.withColumn("rn", F.row_number().over(win))
            .filter(F.col("rn") <= max_expansions)
            .groupBy("term").agg(F.max("w").alias("w"),
                                 F.any_value("df").alias("df"))
            .collect()
        )
        return {r["term"]: (float(r["w"]), int(r["df"])) for r in rows}

    def _regexp_vocab_jvm(self, terms: List[str], anchored: str) -> List[str]:
        """Evaluate one regexp clause against the vocabulary with the SAME
        JVM ``java.util.regex`` engine ``rlike`` runs — one py4j
        stream-filter round trip (Pattern.asPredicate() is
        ``matcher(s).find()``, exactly RLike's semantics), so the dialect
        cannot diverge from the Spark-job path.  Analyzed terms cannot
        contain a newline (every analyzer splits on whitespace), so the
        newline join/split is lossless."""
        if not terms:
            return []
        jvm = self.spark._jvm
        pat = jvm.java.util.regex.Pattern.compile(anchored)
        nl = jvm.java.util.regex.Pattern.compile(
            "\n", 16)  # 16 = Pattern.LITERAL
        matched = (
            nl.splitAsStream("\n".join(terms))
            .filter(pat.asPredicate())
            .collect(jvm.java.util.stream.Collectors.joining("\n"))
        )
        return [t for t in matched.split("\n") if t] if matched else []

    @staticmethod
    def _expand_fuzzy_local(vocab: dict, qrows,
                            max_expansions: int,
                            rx_matches: Optional[dict] = None
                            ) -> "Dict[str, Tuple[float, int]]":
        """Driver-side MultiTermQuery rewrite over a cached vocabulary —
        value-identical to the Spark job in :meth:`expand_fuzzy`: classic
        Levenshtein (``_lev_batch``), weight b * (1 - dist/min(len)) in
        the same float64 op order, per-clause (w desc, df desc, term asc)
        cap, cross-clause max-weight dedup.  ``rx_matches`` maps a regexp
        clause's anchored pattern to its JVM-evaluated vocabulary matches
        (_regexp_vocab_jvm)."""
        terms = list(vocab)
        out: Dict[str, Tuple[float, int]] = {}
        for q, d, b, kind in qrows:
            if kind == "r":
                if b <= 0:
                    continue
                sel = [(b * 1.0, vocab[t], t)
                       for t in (rx_matches or {}).get(q, ())]
            elif kind == "f":
                cand = [t for t in terms if abs(len(t) - len(q)) <= d]
                dists = _lev_batch(q, cand)
                sel = []
                for t, dist in zip(cand, dists):
                    dist = int(dist)
                    if dist > d:
                        continue
                    minlen = min(len(t), len(q))
                    w = b * (1.0 - dist / minlen)
                    if w > 0:  # dist == min length conveys nothing
                        sel.append((w, vocab[t], t))
            else:  # kind == "p"
                if b <= 0:
                    continue
                sel = [(b * 1.0, vocab[t], t)
                       for t in terms if t.startswith(q)]
            sel.sort(key=lambda r: (-r[0], -r[1], r[2]))
            for w, df, t in sel[:max_expansions]:
                prev = out.get(t)
                if prev is None or w > prev[0]:
                    out[t] = (w, df)
        return out

    def search_ids_fuzzy(self, query: str, k: int = DEFAULT_MAX_RESULTS,
                         case_id: str = "0", prune: bool = True,
                         distance: Optional[int] = None,
                         boosts: Optional[Dict[str, float]] = None,
                         max_expansions: int = 50,
                         return_expansion: bool = False,
                         filter: Optional[str] = None,
                         filter_docs=None,
                         offset: int = 0):
        """Lucene-MultiTermQuery top-k: each query term expands to the
        corpus terms within its max edit distance (``relam~1``; unsuffixed
        terms use ``distance``, default 0 = exact), matching its prefix
        (``spar*`` — trailing wildcard) or matching its regexp
        (``/s[cp][a-z]+/`` — Lucene RegexpQuery slash syntax, whole-term
        match; wildcard and regexp clauses bypass the analyzer per
        Lucene's rule); every expanded term scores as an OR clause with
        weight boost * (1 - dist/min(len)) (fuzzy) or boost
        (prefix/regexp) folded into its idf — the ONE weight feeding
        scoring and the WAND/block-max bounds, so expanded queries stay
        lossless under pruning.  Repeated query terms dedup (qtf = 1 per
        expanded term — Lucene's BooleanQuery rewrite).  Also reachable as
        ``search_ids(query, mode="fuzzy", distance=d)``.  The reference
        sketched fuzzy search but never shipped it (commented out,
        search_pdfs.go:176-186)."""
        from pyspark.sql import functions as F

        self._check_fresh()
        if k is None or k < 0:
            k = DEFAULT_MAX_RESULTS
        if offset < 0:
            raise ValueError(f"offset must be >= 0, got {offset}")
        d_default = 0 if distance is None else int(distance)
        if d_default < 0 or d_default > MAX_FUZZY_DISTANCE:
            raise ValueError(
                f"distance must be 0..{MAX_FUZZY_DISTANCE}, got {distance}")
        query, raw_boosts = parse_boosts(query)
        query, raw_fuzzy, raw_prefixes, raw_regexps = parse_fuzzy(
            query, default_distance=d_default)
        # rekey ^boosts written inside a ~d, * or /re/ suffix (term~1^2
        # parses the boost first, leaving the ~1 / * / slashes on the raw
        # key)
        for key in list(raw_boosts):
            m = _FUZZY_RE.match(key) or _PREFIX_RE.match(key) \
                or _REGEX_RE.match(key)
            if m:
                b = raw_boosts.pop(key)
                k2 = m.group(1) if _FUZZY_RE.match(key) else m.group(1).lower()
                raw_boosts[k2] = raw_boosts.get(k2, 1.0) * b
        empty = pd.DataFrame(columns=["doc_id", "score"])
        if case_id not in self._corpus:
            return (empty, {}) if return_expansion else empty
        # per analyzed term: (max distance, composed boost) over the raw
        # tokens that produced it, through the same analyzer as the query
        fuzzy: Dict[str, Tuple[int, float]] = {}
        for raw, d in raw_fuzzy.items():
            b = raw_boosts.get(raw, 1.0)
            for t in set(self._analyze(raw)):
                d0, b0 = fuzzy.get(t, (0, 1.0))
                fuzzy[t] = (max(d0, d), b0 * b)
        for t, b in (boosts or {}).items():
            if b <= 0:
                raise ValueError(f"term boost must be > 0, got {t!r}: {b}")
            if t in fuzzy:  # boosts weight query terms, never add clauses
                d0, b0 = fuzzy[t]
                fuzzy[t] = (d0, b0 * b)
        prefixes = {p: raw_boosts.get(p, 1.0) for p in set(raw_prefixes)}
        regexps = {r: raw_boosts.get(r, 1.0) for r in set(raw_regexps)}
        if not fuzzy and not prefixes and not regexps:
            return (empty, {}) if return_expansion else empty
        n_docs, avgdl, _sum_dl = self._corpus[case_id]
        expanded = self.expand_fuzzy(case_id, fuzzy,
                                     max_expansions=max_expansions,
                                     prefixes=prefixes,
                                     regexps=regexps)
        if not expanded:
            return (empty, {}) if return_expansion else empty
        idfs = {e: sc.idf(n_docs, df) * w for e, (w, df) in expanded.items()}
        qtf = {e: 1 for e in expanded}
        dfs = {e: df for e, (_w, df) in expanded.items()}
        buckets = sorted({term_bucket(e, self.n_buckets) for e in expanded})
        blocks = self.postings.filter(
            (F.col("case_id") == case_id)
            & F.col("term_bucket").isin(self._bucket_lit(buckets))
            & F.col("term").isin(list(expanded))
        )
        excl = self._tombstones.get(case_id)
        filter_docs, filter_ids = self._split_filter_docs(filter_docs)
        if filter_ids is not None and filter is not None:
            filter_docs, filter_ids = self._ids_df(filter_ids), None
        allowed = self._allowed_df(case_id, filter, filter_docs)
        k_fetch = k + offset
        if self._use_local(sum(dfs.values()), prune=prune,
                           allowed_df=allowed):
            pdf = self._score_blocks_local(blocks, idfs, qtf, avgdl,
                                           k_fetch, 0, exclude=excl,
                                           spec=(case_id, list(expanded)),
                                           allow=filter_ids)
            pdf = pdf.iloc[offset:offset + k].reset_index(drop=True)
            return (pdf, expanded) if return_expansion else pdf
        if filter_ids is not None:
            allowed = self._allowed_df(case_id, None, self._ids_df(filter_ids))
        p1_pdf = None
        if prune and sum(dfs.values()) > self.prune_min_postings:
            blocks, p1_pdf, allowed = self._prune_blocks(
                blocks, idfs, qtf, avgdl, k_fetch, 0, exclude=excl,
                allowed_df=allowed)
        pdf = self._score_blocks(blocks, idfs, qtf, avgdl, k_fetch, 0,
                                 exclude=excl, allowed_df=allowed)
        if p1_pdf is not None:
            pdf = pd.concat([p1_pdf, pdf], ignore_index=True)
        pdf = pdf.sort_values(["score", "doc_id"], ascending=[False, True],
                              kind="stable"
                              ).iloc[offset:offset + k].reset_index(drop=True)
        return (pdf, expanded) if return_expansion else pdf

    def suggest(self, terms, case_id: str = "0", max_edits: int = 2,
                top: int = 3):
        """Spelling suggestions — the Lucene DirectSpellChecker analog
        over the index vocabulary.  For each (lowercased, un-analyzed —
        suggestions should show what the user could type, not a stem)
        input term, returns up to ``top`` corpus terms within
        ``max_edits`` Levenshtein edits, best first by (similarity desc,
        df desc, term asc) with similarity = 1 - dist/min(len) — the same
        FuzzyTermsEnum weight search_ids_fuzzy folds into idf.  The term
        itself (dist 0) is never suggested.  Returns a Spark DataFrame
        (query_term, suggestion, dist, df) — at most |terms| * ``top``
        rows.

        Scale shape: ONE distributed job over term_stats (the
        vocabulary-sized metadata table, never the postings) with the
        length-band prefilter pushed to the scan and the per-term cap
        applied IN Spark — the same bounded-driver-volume contract as
        expand_fuzzy."""
        from functools import reduce
        from operator import or_

        from pyspark.sql import Window
        from pyspark.sql import functions as F

        if max_edits < 1 or max_edits > MAX_FUZZY_DISTANCE:
            raise ValueError(
                f"max_edits must be 1..{MAX_FUZZY_DISTANCE}, got {max_edits}")
        qs = sorted({t.lower() for t in terms if t})
        schema = ("query_term string, suggestion string, dist int, "
                  "df bigint")
        if not qs:
            return self.spark.createDataFrame([], schema=schema)
        d = int(max_edits)
        # vocabulary-local path (see LOCAL_MAX_VOCAB): same candidates,
        # weights, and (sim desc, df desc, term asc) per-term cap as the
        # Spark job below, computed driver-side over the cached vocabulary
        vocab = self._local_vocab(case_id)
        if vocab is not None:
            terms_all = list(vocab)
            rows = []
            for q in qs:
                cand = [t for t in terms_all if abs(len(t) - len(q)) <= d]
                dists = _lev_batch(q, cand)
                sel = []
                for t, dist in zip(cand, dists):
                    dist = int(dist)
                    if not (1 <= dist <= d):
                        continue
                    minlen = min(len(t), len(q))
                    w = 1.0 - dist / minlen
                    if w > 0:  # dist == min length conveys nothing
                        sel.append((w, vocab[t], t, dist))
                sel.sort(key=lambda r: (-r[0], -r[1], r[2]))
                rows += [(q, t, dist, df)
                         for _w, df, t, dist in sel[:int(top)]]
            return self.spark.createDataFrame(rows, schema=schema)
        conds = [
            (F.length("term") >= len(q) - d) & (F.length("term") <= len(q) + d)
            & (F.levenshtein(F.col("term"), F.lit(q)) <= d)
            for q in qs
        ]
        cand = (
            self._term_stats.filter(F.col("case_id") == case_id)
            .filter(reduce(or_, conds))
            # df is additive across append-batch stats commits
            .groupBy("term").agg(F.sum("df").alias("df"))
        )
        q_df = self.spark.createDataFrame([(q,) for q in qs], "q string")
        lev = F.levenshtein(F.col("term"), F.col("q"))
        sim = (F.lit(1.0) - lev / F.least(F.length("term"), F.length("q")))
        win = Window.partitionBy("q").orderBy(
            F.desc("w"), F.desc("df"), F.asc("term"))
        return (
            cand.join(F.broadcast(q_df), (lev <= d) & (lev >= 1))
            .withColumn("w", sim)
            .filter(F.col("w") > 0)  # dist == min length conveys nothing
            .withColumn("dist", lev)
            .withColumn("rn", F.row_number().over(win))
            .filter(F.col("rn") <= int(top))
            .select(F.col("q").alias("query_term"),
                    F.col("term").alias("suggestion"),
                    F.col("dist").cast("int"),
                    F.col("df").cast("bigint"))
        )

    def more_like_this(self, text: str, k: int = DEFAULT_MAX_RESULTS,
                       case_id: str = "0", max_query_terms: int = 5,
                       prune: bool = True, return_terms: bool = False):
        """Lucene MoreLikeThis analog: find documents similar to ``text``.

        The text runs through the index's analyzer; its
        ``max_query_terms`` most characteristic terms — ranked by
        tf_in_text * idf, ties by term asc, terms absent from the corpus
        dropped (they can't match) — become an OR-of-terms BM25 query
        with qtf=1 per term (Lucene's MLT BooleanQuery, boost=false).
        Returns the same (doc_id, score) frame as :meth:`search_ids`;
        with ``return_terms=True`` also the selected terms (best first).
        To run MLT for an indexed document, pass its stored text — the
        source doc itself may appear in the results (Lucene excludes it
        only in the like-by-docid form).

        Scale shape: analysis + tf of ONE request-sized text is driver
        work by design (bounded by the doc, not the corpus); df lookup is
        the bucket-pruned term_stats scan (_term_dfs) over the text's
        distinct terms; scoring is the regular pruned block funnel.
        (Lucene's minTermFreq/minDocFreq pre-filters default to neutral
        here — the top-N cut is the selection.)"""
        import pandas as pd

        self._check_fresh()
        if k is None or k < 0:
            k = DEFAULT_MAX_RESULTS
        if max_query_terms < 1:
            raise ValueError(
                f"max_query_terms must be >= 1, got {max_query_terms}")
        empty = pd.DataFrame(columns=["doc_id", "score"])
        if case_id not in self._corpus:
            return (empty, []) if return_terms else empty
        terms, counts = self._analyze_query(text)
        if not terms:
            return (empty, []) if return_terms else empty
        n_docs, avgdl, _sum_dl = self._corpus[case_id]
        dfs_all = self._term_dfs(case_id, terms)
        ranked = sorted(
            ((counts[t] * sc.idf(n_docs, df), t) for t, df in dfs_all.items()),
            key=lambda x: (-x[0], x[1]))
        sel = [t for _s, t in ranked[:max_query_terms]]
        if not sel:
            return (empty, []) if return_terms else empty
        # score the selected terms directly through the block funnel —
        # they are ALREADY analyzed (re-running the analyzer on a stem is
        # not guaranteed to be a no-op), qtf=1 per term (Lucene MLT's
        # BooleanQuery of plain TermQuerys)
        from pyspark.sql import functions as F

        idfs = {t: sc.idf(n_docs, dfs_all[t]) for t in sel}
        qtf = {t: 1 for t in sel}
        buckets = sorted({term_bucket(t, self.n_buckets) for t in sel})
        blocks = self.postings.filter(
            (F.col("case_id") == case_id)
            & F.col("term_bucket").isin(self._bucket_lit(buckets))
            & F.col("term").isin(sel)
        )
        excl = self._tombstones.get(case_id)
        if self._use_local(sum(dfs_all[t] for t in sel), prune=prune):
            pdf = self._score_blocks_local(blocks, idfs, qtf, avgdl, k, 0,
                                           exclude=excl,
                                           spec=(case_id, sel))
            return (pdf, sel) if return_terms else pdf
        p1_pdf = None
        if prune and sum(dfs_all[t] for t in sel) > self.prune_min_postings:
            blocks, p1_pdf, _ = self._prune_blocks(blocks, idfs, qtf, avgdl,
                                                   k, 0, exclude=excl)
        pdf = self._score_blocks(blocks, idfs, qtf, avgdl, k, 0,
                                 exclude=excl)
        if p1_pdf is not None:
            pdf = pd.concat([p1_pdf, pdf], ignore_index=True)
        pdf = pdf.sort_values(["score", "doc_id"], ascending=[False, True],
                              kind="stable").head(k).reset_index(drop=True)
        return (pdf, sel) if return_terms else pdf

    def search_ids_many(self, queries: Dict[str, str],
                        k: int = DEFAULT_MAX_RESULTS, case_id: str = "0",
                        mode: str = "any", prune: bool = True,
                        window: Optional[int] = None) -> pd.DataFrame:
        """Batched top-k for a whole query log in ONE postings scan.

        ``queries``: qid -> query string.  Returns a pandas frame
        (qid, doc_id, score) with each query's top-k, identical to
        per-query ``search_ids`` (same decode, weights, sum
        order, tie-breaks — enforced by test).  Queries with no live terms
        (or, under ``mode="all"``/``"phrase"``, any corpus-absent term)
        yield no rows.  ``mode="phrase"`` (index built with
        ``store_positions=True``) batches exact-phrase queries: postings
        AND positions are decoded once per segment and shared across the
        whole query log, bit-identical to per-query
        ``search_ids(mode="phrase")``.

        Scale shape: the scan is filtered to the UNION of live terms
        (partition pruning on their buckets still applies), each posting
        block is decoded once and shared across queries, and only
        O(|queries| * k) rows per segment leave the executors.  This is the
        offline query-log pattern: per-query Spark-job overhead is paid
        once for the batch instead of per query.  ``prune=True`` (default;
        gated on candidate volume like ``search_ids``) additionally runs
        the batched lossless block-max prune (``_prune_many_blocks``):
        per-query θs are established from one shared phase-1 pass and a
        block is decoded only when at least one query's top-k can still
        need it — the query-log replay stops decoding every block of the
        union terms.  Phrase/near modes never prune (their candidate
        volume is already the conjunctive intersection).  ``mode="near"``
        batches unordered-proximity queries, each within the shared
        ``window`` (search_ids semantics).  ``mode="boolean"`` batches
        Lucene ``+must -must_not should`` queries (search_ids_boolean
        semantics): scoring AND prohibited terms decode once per segment,
        each plan applies its own gates over the shared arrays,
        bit-identical to per-query boolean (enforced by test); boolean
        never prunes (same reason as the single-query path — the must
        intersection already bounds candidates and θ bounds are not
        not-term-aware)."""
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        self._check_fresh()
        if mode not in ("any", "all", "phrase", "near", "boolean"):
            raise ValueError(
                f"mode must be any|all|phrase|near|boolean, got {mode!r} "
                "(fuzzy is a single-query mode — its expansion job "
                "dominates; loop over search_ids for fuzzy logs)")
        if mode in ("phrase", "near") and not self.positions_stored:
            raise ValueError(
                f"mode={mode!r} needs an index built with "
                "store_positions=True"
            )
        if mode == "near" and (window is None or window < 0):
            raise ValueError("mode='near' needs window >= 0")
        if k is None or k < 0:
            k = DEFAULT_MAX_RESULTS
        empty = pd.DataFrame(columns=["qid", "doc_id", "score"])
        if case_id not in self._corpus or not queries:
            return empty
        n_docs, avgdl, _sum_dl = self._corpus[case_id]

        if mode == "boolean":
            plans, vols = self._boolean_plans(queries, case_id, n_docs)
            if not plans:
                return empty
            return self._score_many_blocks(
                plans, avgdl, case_id, k, mode, prune=False,
                local=self._use_local_batch(vols))

        parsed = {qid: parse_boosts(q) for qid, q in queries.items()}
        analyzed = {qid: self._analyze_query(q)
                    for qid, (q, _rb) in parsed.items()}
        union_terms = sorted({t for terms, _ in analyzed.values() for t in terms})
        dfs = self._term_dfs(case_id, union_terms)  # one batched stats probe

        plans: Dict[str, tuple] = {}
        for qid, (terms, qtf) in analyzed.items():
            live = [t for t in set(terms) if t in dfs]
            if not live or (mode in ("all", "phrase", "near")
                            and len(live) < len(set(terms))):
                continue
            idfs = self._apply_boosts(
                {t: sc.idf(n_docs, dfs[t]) for t in live},
                parsed[qid][1], None)
            if mode == "phrase":
                plans[qid] = (idfs, list(terms), dict(qtf))
            elif mode == "near":
                plans[qid] = (idfs, list(terms), dict(qtf), int(window))
            else:
                plans[qid] = (idfs, dict(qtf),
                              len(live) if mode == "all" else 0)
        if not plans:
            return empty
        # volume is summed over the SURVIVING plans' terms — a dropped
        # query's terms are never scanned, so they must not tip the gates
        plan_terms = {t for p in plans.values() for t in p[0]}
        vol = sum(dfs[t] for t in plan_terms)
        do_prune = (prune and mode in ("any", "all")
                    and vol > self.prune_min_postings * len(plans))
        # the driver-local batch gate (see _use_local_batch): every plan
        # must clear the single-query gate on its own volume AND the
        # summed per-plan volume must stay under the measured crossover —
        # a large query log stays on the distributed shared-decode scan
        vols = [sum(dfs[t] for t in p[0]) for p in plans.values()]
        return self._score_many_blocks(
            plans, avgdl, case_id, k, mode, prune=do_prune,
            local=(not do_prune) and self._use_local_batch(vols))

    def _boolean_plans(self, queries: Dict[str, str], case_id: str,
                       n_docs: int) -> Dict[str, tuple]:
        """Build batched boolean plans (qid -> (idfs, qtf, must_live,
        not_live)) from Lucene ``+must -must_not should`` query strings —
        ONE batched df probe over the union of every clause's terms.
        Clause semantics are search_ids_boolean's: a query with a
        corpus-absent MUST term or no live positive clause drops (it
        yields no rows); absent should terms drop; absent must_not terms
        are no-ops.  Returns (plans, per_plan_volumes) — each surviving
        plan's own scanned-postings volume feeds the driver-local batch
        gate (_use_local_batch)."""
        parts: Dict[str, tuple] = {}
        union: set = set()
        for qid, q in queries.items():
            # (parse_boolean already rejected any '-term^boost' token)
            must_raw, should_raw, not_raw = parse_boolean(q)
            must_q, mb = parse_boosts(" ".join(must_raw))
            should_q, sb = parse_boosts(" ".join(should_raw))
            must_terms = self._analyze(must_q)
            should_terms = self._analyze(should_q)
            not_terms = sorted(set(self._analyze(" ".join(not_raw))))
            rb = dict(mb)
            for t, b in sb.items():
                rb[t] = rb.get(t, 1.0) * b
            parts[qid] = (must_terms, should_terms, not_terms, rb)
            union |= set(must_terms) | set(should_terms) | set(not_terms)
        dfs = self._term_dfs(case_id, sorted(union))
        plans: Dict[str, tuple] = {}
        for qid, (must_terms, should_terms, not_terms, rb) in parts.items():
            pos = must_terms + should_terms
            must_live = sorted({t for t in must_terms if t in dfs})
            if not pos or len(must_live) < len(set(must_terms)):
                continue
            live = sorted({t for t in pos if t in dfs})
            if not live:
                continue
            idfs = self._apply_boosts(
                {t: sc.idf(n_docs, dfs[t]) for t in live}, rb, None)
            plans[qid] = (idfs, dict(Counter(pos)), tuple(must_live),
                          tuple(t for t in not_terms if t in dfs))
        vols = [sum(dfs[t] for t in set(p[0]) | set(p[3]))
                for p in plans.values()]
        return plans, vols

    def _score_many_blocks(self, plans: Dict[str, tuple], avgdl: float,
                           case_id: str, k: int, mode: str,
                           prune: bool = False,
                           local: bool = False) -> pd.DataFrame:
        """ONE partition-pruned postings scan scoring every prebuilt plan;
        the shared engine of ``search_ids_many`` and the NRT hybrid's
        batched index side (streaming.search_with_arrivals, which injects
        union-corpus idfs/avgdl).  ``plans``: qid -> (idfs, qtf, require),
        or (idfs, terms, qtf) under mode="phrase".  Returns pandas
        (qid, doc_id, score), each query's top-k.  ``prune=True`` (callers
        gate it on candidate volume; never under mode="phrase") runs the
        batched lossless block-max prune first — see
        ``_prune_many_blocks``."""
        from pyspark.sql import functions as F

        term_set = {t for p in plans.values() for t in p[0]}
        if mode == "boolean":  # prohibited terms decode too (gate-only)
            term_set |= {t for p in plans.values() for t in p[3]}
        all_terms = sorted(term_set)
        buckets = sorted({term_bucket(t, self.n_buckets) for t in all_terms})
        blocks = self.postings.filter(
            (F.col("case_id") == case_id)
            & F.col("term_bucket").isin(self._bucket_lit(buckets))
            & F.col("term").isin(all_terms)
        )

        excl = self._tombstones.get(case_id)
        if local and not prune:
            return self._many_pass_local(blocks, plans, avgdl, k, mode,
                                         excl, spec=(case_id, all_terms))
        p1_pdf = None
        if prune and mode in ("any", "all"):
            blocks, p1_pdf = self._prune_many_blocks(blocks, plans, avgdl,
                                                     k, mode, exclude=excl)
        pdf = self._many_pass(blocks, plans, avgdl, k, mode, excl)
        if p1_pdf is not None:
            pdf = pd.concat([p1_pdf, pdf], ignore_index=True)
            pdf = (
                pdf.sort_values(["qid", "score", "doc_id"],
                                ascending=[True, False, True], kind="stable")
                .groupby("qid", group_keys=False, sort=False).head(k)
                .reset_index(drop=True)
            )
        return pdf

    def _many_pass(self, blocks, plans: Dict[str, tuple], avgdl: float,
                   k: int, mode: str,
                   excl: Optional[np.ndarray]) -> pd.DataFrame:
        """One applyInPandas scoring pass of every plan over ``blocks``:
        per-segment shared decode, per-query local top-k, then a window
        reduces to each query's global top-k before O(|queries| * k) rows
        reach the driver.  Returns pandas (qid, doc_id, score) sorted by
        (qid, score desc, doc_id)."""
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        out_schema = "qid string, doc_id long, score double"
        phrase = mode in ("phrase", "near")

        def score_one(key, pdf: pd.DataFrame) -> pd.DataFrame:
            import zlib

            for ib, tb, db, crc in zip(pdf["doc_ids_bin"], pdf["tfs_bin"],
                                       pdf["dls_bin"], pdf["crc32"]):
                got = zlib.crc32(ib) ^ zlib.crc32(tb) ^ zlib.crc32(db)
                if got != crc:
                    raise IOError(
                        f"posting block CRC mismatch in segment {key[0]}"
                    )
            if phrase:
                for pb, pcrc in zip(pdf["pos_bin"], pdf["pos_crc32"]):
                    if zlib.crc32(pb) != pcrc:
                        raise IOError(
                            f"position payload CRC mismatch in segment "
                            f"{key[0]}"
                        )
                rows = list(
                    zip(pdf["term"], pdf["n"], pdf["doc_ids_bin"],
                        pdf["tfs_bin"], pdf["dls_bin"], pdf["pos_bin"])
                )
                qids, ids_l, scores_l = sc.score_segment_blocks_multi_phrase(
                    rows, plans, avgdl, k, exclude=excl
                )
            else:
                rows = list(
                    zip(pdf["term"], pdf["n"], pdf["doc_ids_bin"],
                        pdf["tfs_bin"], pdf["dls_bin"])
                )
                if mode == "boolean":
                    qids, ids_l, scores_l = (
                        sc.score_segment_blocks_multi_boolean(
                            rows, plans, avgdl, k, exclude=excl))
                else:
                    qids, ids_l, scores_l = sc.score_segment_blocks_multi(
                        rows, plans, avgdl, k, exclude=excl
                    )
            if not qids:
                return pd.DataFrame(columns=["qid", "doc_id", "score"])
            return pd.DataFrame({
                "qid": np.repeat(qids, [len(a) for a in ids_l]),
                "doc_id": np.concatenate(ids_l),
                "score": np.concatenate(scores_l),
            })

        cols = ["segment_id", "term", "n", "doc_ids_bin", "tfs_bin",
                "dls_bin", "crc32"]
        if phrase:
            cols += ["pos_bin", "pos_crc32"]
        sdf = (
            blocks.select(*cols)
            .groupBy("segment_id")
            .applyInPandas(score_one, schema=out_schema)
        )
        w = Window.partitionBy("qid").orderBy(
            F.col("score").desc(), F.col("doc_id").asc()
        )
        pdf = (
            sdf.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .drop("_rn")
            .toPandas()
        )
        return (
            pdf.sort_values(["qid", "score", "doc_id"],
                            ascending=[True, False, True], kind="stable")
            .reset_index(drop=True)
        )

    def _score_blocks(self, blocks_df, idfs, qtf, avgdl, k,
                      require: int = 0,
                      exclude: Optional[np.ndarray] = None,
                      allowed_df=None) -> pd.DataFrame:
        """Distributed segment-local scoring -> union of local top-ks.

        Single-term queries take a shuffle-free fast path: with no cross-term
        sum, every posting's score is block-local, so blocks are scored in
        place with mapInPandas and only per-batch top-ks leave the scan.
        (A filter context needs the per-segment allowed slice, so it always
        takes the grouped cogroup path.)

        Block payloads are CRC-checked before decode (reference parity:
        per-blob CRC32 verification at doc_positions.go:222-226)."""
        out_schema = "doc_id long, score double"

        if len(idfs) == 1 and allowed_df is None:
            return self._score_blocks_single_term(blocks_df, idfs, qtf,
                                                  avgdl, k, exclude=exclude)

        def score_one(key, pdf: pd.DataFrame,
                      allow: Optional[np.ndarray]) -> pd.DataFrame:
            import zlib

            for ib, tb, db, crc in zip(pdf["doc_ids_bin"], pdf["tfs_bin"],
                                       pdf["dls_bin"], pdf["crc32"]):
                got = zlib.crc32(ib) ^ zlib.crc32(tb) ^ zlib.crc32(db)
                if got != crc:
                    raise IOError(
                        f"posting block CRC mismatch in segment {key[0]}: "
                        f"{got} != {crc}"
                    )
            rows = list(
                zip(pdf["term"], pdf["n"], pdf["doc_ids_bin"], pdf["tfs_bin"],
                    pdf["dls_bin"])
            )
            ids, scores = sc.score_segment_blocks(rows, idfs, qtf, avgdl, k,
                                                  require_terms=require,
                                                  exclude=exclude,
                                                  allow=allow)
            return pd.DataFrame({"doc_id": ids, "score": scores})

        sdf = self._cogroup_score(
            blocks_df.select("segment_id", "term", "n", "doc_ids_bin",
                             "tfs_bin", "dls_bin", "crc32"),
            allowed_df, score_one, out_schema)
        from pyspark.sql import functions as F

        return (
            sdf.orderBy(F.col("score").desc(), F.col("doc_id").asc())
            .limit(k)
            .toPandas()
        )

    def _score_blocks_boolean(self, blocks_df, idfs, qtf, avgdl, k,
                              must_terms, not_terms,
                              exclude: Optional[np.ndarray] = None,
                              allowed_df=None) -> pd.DataFrame:
        """Distributed boolean scoring (score.score_segment_blocks_boolean):
        per segment, must-intersection + not-union gates around the shared
        top-k funnel, then the usual union-of-local-top-ks.  Payloads are
        CRC-checked exactly like _score_blocks."""
        from pyspark.sql import functions as F

        out_schema = "doc_id long, score double"

        def score_one(key, pdf: pd.DataFrame,
                      allow: Optional[np.ndarray]) -> pd.DataFrame:
            import zlib

            for ib, tb, db, crc in zip(pdf["doc_ids_bin"], pdf["tfs_bin"],
                                       pdf["dls_bin"], pdf["crc32"]):
                got = zlib.crc32(ib) ^ zlib.crc32(tb) ^ zlib.crc32(db)
                if got != crc:
                    raise IOError(
                        f"posting block CRC mismatch in segment {key[0]}: "
                        f"{got} != {crc}"
                    )
            rows = list(
                zip(pdf["term"], pdf["n"], pdf["doc_ids_bin"], pdf["tfs_bin"],
                    pdf["dls_bin"])
            )
            ids, scores = sc.score_segment_blocks_boolean(
                rows, idfs, qtf, avgdl, k,
                must_terms=must_terms, not_terms=not_terms, exclude=exclude,
                allow=allow)
            return pd.DataFrame({"doc_id": ids, "score": scores})

        sdf = self._cogroup_score(
            blocks_df.select("segment_id", "term", "n", "doc_ids_bin",
                             "tfs_bin", "dls_bin", "crc32"),
            allowed_df, score_one, out_schema)
        return (
            sdf.orderBy(F.col("score").desc(), F.col("doc_id").asc())
            .limit(k)
            .toPandas()
        )

    def _score_blocks_phrase(self, blocks_df, idfs, qterms, qtf, avgdl,
                             k,
                             exclude: Optional[np.ndarray] = None,
                             window: Optional[int] = None,
                             allowed_df=None) -> pd.DataFrame:
        """Distributed exact-phrase scoring: per segment, posting-list
        intersection + position adjacency (score.score_segment_blocks_phrase)
        then the usual union-of-local-top-ks.  Payloads are CRC-checked
        (3-buffer xor AND the separate positions CRC).  ``window`` switches
        the position test to unordered proximity (mode="near")."""
        from pyspark.sql import functions as F

        out_schema = "doc_id long, score double"

        def score_one(key, pdf: pd.DataFrame,
                      allow: Optional[np.ndarray]) -> pd.DataFrame:
            import zlib

            for ib, tb, db, crc, pb, pcrc in zip(
                pdf["doc_ids_bin"], pdf["tfs_bin"], pdf["dls_bin"],
                pdf["crc32"], pdf["pos_bin"], pdf["pos_crc32"]
            ):
                got = zlib.crc32(ib) ^ zlib.crc32(tb) ^ zlib.crc32(db)
                if got != crc or zlib.crc32(pb) != pcrc:
                    raise IOError(
                        f"posting block CRC mismatch in segment {key[0]}"
                    )
            rows = list(
                zip(pdf["term"], pdf["n"], pdf["doc_ids_bin"], pdf["tfs_bin"],
                    pdf["dls_bin"], pdf["pos_bin"])
            )
            ids, scores = sc.score_segment_blocks_phrase(
                rows, idfs, qterms, qtf, avgdl, k, exclude=exclude,
                window=window, allow=allow
            )
            return pd.DataFrame({"doc_id": ids, "score": scores})

        sdf = self._cogroup_score(
            blocks_df.select("segment_id", "term", "n", "doc_ids_bin",
                             "tfs_bin", "dls_bin", "pos_bin", "pos_crc32",
                             "crc32"),
            allowed_df, score_one, out_schema)
        return (
            sdf.orderBy(F.col("score").desc(), F.col("doc_id").asc())
            .limit(k)
            .toPandas()
        )

    def _score_blocks_single_term(self, blocks_df, idfs, qtf, avgdl, k,
                                  exclude: Optional[np.ndarray] = None
                                  ) -> pd.DataFrame:
        from pyspark.sql import functions as F

        import zlib

        (term, idf_val), = idfs.items()
        w = qtf.get(term, 1)

        def score_batches(batches):
            from pysearch import codec
            from pysearch import score as ssc

            for pdf in batches:
                if len(pdf) == 0:
                    continue
                for ib, tb, db, crc in zip(pdf["doc_ids_bin"], pdf["tfs_bin"],
                                           pdf["dls_bin"], pdf["crc32"]):
                    got = zlib.crc32(ib) ^ zlib.crc32(tb) ^ zlib.crc32(db)
                    if got != crc:
                        raise IOError("posting block CRC mismatch")
                # one vectorized decode for the whole Arrow batch of blocks
                ids, tfs, dls = codec.unpack_blocks_batch(
                    pdf["n"].to_numpy(), list(pdf["doc_ids_bin"]),
                    list(pdf["tfs_bin"]), list(pdf["dls_bin"]),
                )
                if exclude is not None and exclude.size:
                    keep = np.isin(ids, exclude, invert=True)
                    ids, tfs, dls = ids[keep], tfs[keep], dls[keep]
                if ids.size == 0:
                    continue
                scores = ssc.bm25(tfs, dls, idf_val, avgdl) * w
                o = np.lexsort((ids, -scores))[:k]
                yield pd.DataFrame({"doc_id": ids[o], "score": scores[o]})

        sdf = blocks_df.select(
            "n", "doc_ids_bin", "tfs_bin", "dls_bin", "crc32"
        ).mapInPandas(score_batches, schema="doc_id long, score double")
        return (
            sdf.orderBy(F.col("score").desc(), F.col("doc_id").asc())
            .limit(k)
            .toPandas()
        )

    def _ub_expr(self, idfs, qtf, avgdl, tf_col="max_tf", dl_col="min_dl"):
        """BM25 upper-bound Column for a (max_tf, min_dl) metadata pair:
        tf-normalization is increasing in tf and decreasing in dl, so
        (max_tf, min_dl) bounds every posting the metadata covers."""
        from pyspark.sql import functions as F

        from pysearch import B, K1

        widf = F.create_map(
            *[x for t, v in idfs.items()
              for x in (F.lit(t), F.lit(v * qtf.get(t, 1)))]
        )
        return (
            widf[F.col("term")]
            * (F.col(tf_col) * (K1 + 1.0))
            / (F.col(tf_col) + K1 * (1.0 - B + B * F.col(dl_col) / avgdl))
        )

    def _per_term_ub(self, blocks_df, idfs, qtf, avgdl):
        """(segment_id, term, ub) — each query term's max BM25 upper bound
        within each segment, computed in Spark from block *metadata* only
        (the packed binary columns are never read — column pruning keeps
        this a metadata scan)."""
        from pyspark.sql import functions as F

        per_term = blocks_df.groupBy("segment_id", "term").agg(
            F.max("max_tf").alias("max_tf"), F.min("min_dl").alias("min_dl")
        )
        return per_term.select(
            "segment_id", "term",
            self._ub_expr(idfs, qtf, avgdl).alias("ub"),
        )

    def _prune_blocks(self, blocks_df, idfs, qtf, avgdl, k, require: int = 0,
                      exclude: Optional[np.ndarray] = None,
                      allowed_df=None):
        """Lossless WAND-style pruning, fully distributed, two granularities.

        Phase 1 exactly scores the PRUNE_FIRST_SEGMENTS segments with the
        highest upper bounds to establish θ = running kth score; phase 2
        keeps only segments whose summed per-term upper bound reaches θ
        (their true scores cannot otherwise reach the top-k), then — the
        block-max refinement — drops individual BLOCKS inside surviving
        segments that cannot matter: block b of term t is kept only when

            ub(b) + Σ_{t' ≠ t} seg_max_ub(t')  >=  θ

        Lossless: every doc in b scores at most ub(b) from t and at most
        seg_max_ub(t') from each other term (all of a doc's postings live in
        one segment), so when the sum is < θ every doc in b has true score
        < θ.  Dropping b only SUBTRACTS contributions, so an affected doc's
        computed score is ≤ its true score < θ = the running kth score — it
        can neither enter the final top-k nor tie the kth score, and every
        unaffected doc keeps its exact score.  The same argument covers
        mode="all": losing an appearance can only drop sub-θ docs from the
        intersection, never add one.  >= not >, as with segments: a bound
        EQUAL to θ could produce a doc that ties the kth score and wins the
        doc_id-ascending tie-break.

        Only O(PRUNE_FIRST_SEGMENTS + k) rows ever reach the driver; the
        bound aggregates are metadata-only scans and the surviving
        (segment, term) bound table is broadcast, so pruned blocks' packed
        payloads are dropped at the scan — they neither shuffle to the
        scorer nor decode (the remaining 100×-scale lever on the query
        path: hot segments keep cold blocks, e.g. long-tail docs of a
        skewed term, out of the decode entirely)."""
        from pyspark.sql import functions as F

        ptu = self._per_term_ub(blocks_df, idfs, qtf, avgdl)
        seg_ub = ptu.groupBy("segment_id").agg(
            F.sum("ub").alias("seg_ub"),
            F.count("*").alias("n_terms"),  # distinct by construction
        )
        if require > 0:
            # conjunctive: a segment missing any query term cannot hold a
            # hit (all of a doc's postings live in its segment) — drop it
            # before bound ordering AND from phase 2 (lossless)
            seg_ub = seg_ub.filter(F.col("n_terms") >= require)
        # one job: top (P+1) upper-bound segments; if <= P exist, pruning
        # cannot help — score everything in a single pass
        top = (
            seg_ub.orderBy(F.col("seg_ub").desc(), F.col("segment_id"))
            .limit(PRUNE_FIRST_SEGMENTS + 1)
            .collect()
        )
        if len(top) <= PRUNE_FIRST_SEGMENTS:
            return blocks_df, None, allowed_df
        phase1 = [r["segment_id"] for r in top[:PRUNE_FIRST_SEGMENTS]]
        # `require` propagates so θ is established from CONJUNCTIVE scores
        # when mode="all"; seg_ub (the disjunctive bound) still dominates
        # every conjunctive score, so pruning on it stays lossless
        # a filter context (allowed_df) propagates into phase 1 so θ is the
        # kth FILTERED score — an unfiltered θ could overshoot and prune
        # blocks the filtered query needs; block/segment upper bounds stay
        # valid a fortiori (filtering only removes candidate docs).  The
        # allowed set is narrowed to the phase-1 segments BEFORE the
        # cogroup exchange: at corpus-fraction filter sizes, shuffling the
        # whole set into an 8-segment job would dominate the phase.
        allowed_p1 = (None if allowed_df is None else
                      allowed_df.filter(F.col("segment_id").isin(phase1)))
        p1 = self._score_blocks(
            blocks_df.filter(F.col("segment_id").isin(phase1)), idfs, qtf,
            avgdl, k, require, exclude=exclude, allowed_df=allowed_p1
        )
        if len(p1) < k:
            # too few hits to establish θ; score all (full filter set)
            return blocks_df, None, allowed_df
        theta = float(p1["score"].iloc[k - 1])
        # surviving segments' per-term bounds + each segment's summed bound;
        # phase-1 segments are excluded (their scores are already in p1)
        surv = (
            seg_ub.filter(
                (F.col("seg_ub") >= theta)
                & ~F.col("segment_id").isin(phase1)
            ).select("segment_id", "seg_ub")
        )
        meta = ptu.join(surv, "segment_id")
        # block-max filter: ub(block) + (seg_ub - own term's seg max) >= θ.
        # the (segment, term) join also subsumes the old segment semi-join.
        phase2 = (
            blocks_df.join(F.broadcast(meta), ["segment_id", "term"])
            .filter(
                self._ub_expr(idfs, qtf, avgdl)
                + F.col("seg_ub") - F.col("ub") >= theta
            )
            .drop("ub", "seg_ub")
        )
        if self.count_scored_blocks:
            # test/diagnostic hook: how many blocks survive to decode vs
            # the unpruned candidate set (two extra metadata-only jobs)
            self.last_block_counts = {
                "candidate": blocks_df.count(),
                "scored": phase2.count()
                + blocks_df.filter(
                    F.col("segment_id").isin(phase1)).count(),
            }
        # narrow the filter set to the SURVIVING segments before phase 2's
        # cogroup exchange — pruned segments' allowed slices would only
        # shuffle into empty-left groups (at corpus-fraction filter sizes
        # that dead shuffle dominates); surv is O(segments) metadata and
        # broadcast, mirroring the meta join above
        allowed2 = (None if allowed_df is None else allowed_df.join(
            F.broadcast(surv.select("segment_id")), "segment_id",
            "left_semi"))
        return phase2, p1, allowed2

    def _prune_many_blocks(self, blocks_df, plans: Dict[str, tuple],
                           avgdl: float, k: int, mode: str,
                           exclude: Optional[np.ndarray] = None):
        """Per-QUERY lossless block-max pruning for the batched scan —
        ``_prune_blocks`` generalized to a whole query log while keeping
        the one-shared-decode property.

        The per-query BM25 upper bound of a (max_tf, min_dl) metadata pair
        factors as w_q(t) * bub, where bub is the UNWEIGHTED
        tf-normalization bound (shared by every query) and
        w_q(t) = idf_q(t) * qtf_q(t) is a per-(query, term) scalar.  So:

        1. One metadata-only aggregate builds bub per (segment, term) for
           the union terms; joining the tiny (qid, term, w) table and
           summing gives each query's per-segment bound seg_ub_q, with a
           per-query count of present terms (mode="all" drops segments
           missing any of q's terms — lossless, all of a doc's postings
           live in one segment).
        2. Phase 1 scores ONE shared pass over the union of each query's
           top-``PRUNE_FIRST_SEGMENTS`` bound segments; a query q gets
           θ_q = its running kth score (−inf when phase 1 found fewer than
           k hits — q then prunes nothing).  Queries whose segments ALL
           sit in phase 1 are final there and drop out of phase 2.
           Sharing the pass can only include EXTRA exact scores for a
           query, so θ_q stays a valid lower bound of q's true kth score.
        3. Block b of term t in segment s is needed by q iff

               w_q(t) * bub(b) + (seg_ub_q(s) − w_q(t) * bub(s, t)) ≥ θ_q
               ⇔  bub(b) ≥ bub(s, t) + (θ_q − seg_ub_q(s)) / w_q(t)

           so each q contributes one CUT scalar per (segment, term), and
           b must be decoded iff bub(b) ≥ min over queries of their cuts.
           The min-cut table is (segment, term)-sized metadata (Catalyst
           picks the join strategy — at corpus scale it stays a fraction
           of the block payload scan it prunes); per-query rows whose cut
           exceeds bub(s, t) — the segment's best block can't serve q —
           drop before the min, which only removes never-admitting
           constraints.

        Losslessness per query is ``_prune_blocks``'s argument verbatim
        (dropping b only subtracts from docs already bounded < θ_q; ≥
        keeps kth-ties exact; conjunctive scores stay dominated by the
        disjunctive bound).  A block kept for q1 but not needed by q2 just
        gives q2 exact extra contributions — exact scores can never
        wrongly displace a true top-k doc.  Returns (phase2_blocks,
        p1_pandas); (blocks_df, None) when no query has enough segments
        for pruning to help, or when the phase-1 union would already
        cover more than half the candidate segments (coverage bail-out —
        the caller's one-pass scan is then the better plan)."""
        from collections import defaultdict

        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        from pysearch import B, K1

        spark = self.spark
        qt_rows = []
        for qid, (idfs, qtf, _require) in plans.items():
            for t, v in idfs.items():
                qt_rows.append((qid, t, float(v) * float(qtf.get(t, 1))))
        qterm = spark.createDataFrame(qt_rows,
                                      "qid string, term string, w double")

        bub = (F.col("max_tf") * (K1 + 1.0)) / (
            F.col("max_tf") + K1 * (1.0 - B + B * F.col("min_dl") / avgdl))
        base = (
            blocks_df.groupBy("segment_id", "term")
            .agg(F.max("max_tf").alias("max_tf"),
                 F.min("min_dl").alias("min_dl"))
            .select("segment_id", "term", bub.alias("bub"))
        )
        contrib = base.join(F.broadcast(qterm), "term").select(
            "qid", "segment_id", (F.col("w") * F.col("bub")).alias("ub"))
        seg = contrib.groupBy("qid", "segment_id").agg(
            F.sum("ub").alias("seg_ub"),
            F.count("*").alias("n_terms"),  # distinct terms by construction
        )
        if mode == "all":
            req = spark.createDataFrame(
                [(q, int(p[2])) for q, p in plans.items()],
                "qid string, require int")
            seg = (seg.join(F.broadcast(req), "qid")
                   .filter(F.col("n_terms") >= F.col("require"))
                   .drop("require"))
        w_rank = Window.partitionBy("qid").orderBy(
            F.col("seg_ub").desc(), F.col("segment_id"))
        top = (
            seg.withColumn("_rn", F.row_number().over(w_rank))
            .filter(F.col("_rn") <= PRUNE_FIRST_SEGMENTS + 1)
            .select("qid", "segment_id", "_rn")
            .collect()
        )
        per_q: dict = defaultdict(list)
        for r in top:
            per_q[r["qid"]].append((int(r["_rn"]), r["segment_id"]))
        if not any(len(v) > PRUNE_FIRST_SEGMENTS for v in per_q.values()):
            return blocks_df, None  # no query spans enough segments
        phase1, final_in_p1 = set(), set()
        for qid, v in per_q.items():
            if len(v) <= PRUNE_FIRST_SEGMENTS:
                # ALL of q's (require-surviving) segments are in phase 1 —
                # q's phase-1 results are its final results
                phase1.update(s for _rn, s in v)
                final_in_p1.add(qid)
            else:
                v.sort()
                phase1.update(s for _rn, s in v[:PRUNE_FIRST_SEGMENTS])
        # coverage bail-out: when the per-query top-P unions already span
        # most candidate segments (common on small/local indexes, or query
        # logs whose hot segments are disjoint), phase 2 can only prune the
        # remainder — not enough decode to pay for a second pass + the
        # bound jobs.  One metadata-only count decides.
        n_segs = seg.select("segment_id").distinct().count()
        if 2 * len(phase1) > n_segs:
            return blocks_df, None
        p1 = self._many_pass(
            blocks_df.filter(F.col("segment_id").isin(list(phase1))),
            plans, avgdl, k, mode, excl=exclude)

        by_q = p1.groupby("qid", sort=False) if len(p1) else None
        theta_rows = []
        for qid in plans:
            if qid in final_in_p1 or qid not in per_q:
                continue  # answered in phase 1 / no surviving segment
            g = (by_q.get_group(qid) if by_q is not None
                 and qid in by_q.groups else None)
            th = (float(g["score"].iloc[k - 1])
                  if g is not None and len(g) >= k else float("-inf"))
            theta_rows.append((qid, th))
        empty_blocks = blocks_df.filter(F.lit(False))
        if not theta_rows:
            return empty_blocks, p1  # whole log answered in phase 1
        theta = spark.createDataFrame(theta_rows, "qid string, theta double")

        segq = (
            seg.join(F.broadcast(theta), "qid")
            .filter(~F.col("segment_id").isin(list(phase1)))
            .filter(F.col("seg_ub") >= F.col("theta"))
        )
        cut = (
            segq.join(F.broadcast(qterm), "qid")
            .join(base, ["segment_id", "term"])
            .select(
                "segment_id", "term", "bub",
                (F.col("bub")
                 + (F.col("theta") - F.col("seg_ub")) / F.col("w")
                 ).alias("cut"),
            )
            .filter(F.col("cut") <= F.col("bub"))  # unreachable rows drop
            .groupBy("segment_id", "term").agg(F.min("cut").alias("cut"))
        )
        phase2 = (
            blocks_df.join(cut, ["segment_id", "term"])
            .filter(bub >= F.col("cut"))
            .drop("cut")
        )
        if self.count_scored_blocks:
            self.last_block_counts = {
                "candidate": blocks_df.count(),
                "scored": phase2.count()
                + blocks_df.filter(
                    F.col("segment_id").isin(list(phase1))).count(),
            }
        return phase2, p1

    # ------------------------------------------------------------------
    def _hit_positions(self, case_id: str, terms: List[str],
                       hit_ids: List[int]) -> Dict[int, Dict[str, list]]:
        """Per-hit-doc term positions read from the INDEX (pos_bin), not by
        re-analyzing text: one partition+segment-pruned metadata-sized scan
        over the hit docs' segments.  Returns doc_id -> term -> [positions].
        """
        from pyspark.sql import functions as F

        if not hit_ids:
            return {}
        segs = sorted({(int(i) - 1) // self.segment_size for i in hit_ids})
        buckets = sorted({term_bucket(t, self.n_buckets) for t in terms})
        lo, hi = min(hit_ids), max(hit_ids)
        blocks = self.postings.filter(
            (F.col("case_id") == case_id)
            & F.col("term_bucket").isin(self._bucket_lit(buckets))
            & F.col("term").isin(list(terms))
            & F.col("segment_id").isin(segs)
            & (F.col("min_doc_id") <= hi) & (F.col("max_doc_id") >= lo)
            & F.col("pos_bin").isNotNull()
        )
        hit_set = set(int(i) for i in hit_ids)

        def extract(batches):
            import zlib

            from pysearch import codec

            for pdf in batches:
                rows = []
                for r in pdf.itertuples(index=False):
                    if zlib.crc32(r.pos_bin) != r.pos_crc32:
                        raise IOError("position payload CRC mismatch")
                    ids, tfs, _dls = codec.unpack_block(
                        r.n, r.doc_ids_bin, r.tfs_bin, r.dls_bin
                    )
                    pos = codec.unpack_positions_batch(tfs, [r.pos_bin])
                    ends = np.cumsum(tfs)
                    starts = ends - tfs
                    for j in np.flatnonzero(np.isin(ids, list(hit_set))):
                        rows.append((
                            r.term, int(ids[j]),
                            [int(p) for p in pos[starts[j]:ends[j]]],
                        ))
                yield pd.DataFrame(
                    rows, columns=["term", "doc_id", "positions"]
                )

        out: Dict[int, Dict[str, list]] = {}
        for r in blocks.select(
            "term", "n", "doc_ids_bin", "tfs_bin", "dls_bin",
            "pos_bin", "pos_crc32"
        ).mapInPandas(
            extract, schema="term string, doc_id long, positions array<long>"
        ).collect():
            out.setdefault(int(r["doc_id"]), {}).setdefault(
                r["term"], []
            ).extend(int(p) for p in r["positions"])
        return out

    def search(self, query: str, k: int = DEFAULT_MAX_RESULTS,
               case_id: str = "0", prune: bool = True,
               best_filter: bool = True, max_spans: int = 100,
               mode: str = "any", spans: str = "auto",
               window: "Optional[int]" = None,
               distance: "Optional[int]" = None,
               filter: Optional[str] = None,
               filter_docs=None,
               offset: int = 0):
        """Full search: top-k + phrase spans + Best filter + line numbers.

        Returns a Spark DataFrame with MATCHES schema (SURVEY §1.1 match-set
        mapping of PdfMatchSet, search_pdfs.go:29-60).  ``max_spans`` caps
        spans per match (reference P6 caps: modify_pdf.go:74-96).

        ``spans`` selects how phrase spans are constructed:
        - ``"reanalyze"``: tokenize each hit's text at query time (the only
          option for indexes built without positions; span cost scales with
          doc length);
        - ``"index"``: read term positions from the index (pos_bin) and
          char offsets from the docs table's token sidecar — reference
          parity with bleve term-vector Locations (search_pdfs.go:382-484),
          span cost O(query-term postings + matched tokens) per hit;
        - ``"auto"`` (default): ``"index"`` when the index stores
          positions, else ``"reanalyze"``.  Both paths produce identical
          spans (pinned by test).

        ``mode``/``window``/``distance`` follow :meth:`search_ids`
        (any|all|phrase|near|boolean|fuzzy).  Span terms adapt to the
        mode: boolean uses the positive clauses only, fuzzy/prefix uses
        the expanded terms (a misspelling or wildcard never occurs in a
        matched doc — its expansions do).  ``filter``/``filter_docs``
        gate candidates (filter context, see :meth:`search_ids`).
        """
        from pyspark.sql import functions as F

        from pysearch.schema import MATCHES

        if spans not in ("auto", "index", "reanalyze"):
            raise ValueError(f"spans must be auto|index|reanalyze, got {spans!r}")
        use_index_pos = (
            self.positions_stored if spans == "auto" else spans == "index"
        )
        if use_index_pos and not self.positions_stored:
            raise ValueError("index was built without store_positions=True")

        expanded = None
        if mode == "fuzzy":
            hits, expanded = self.search_ids_fuzzy(
                query, k, case_id, prune, distance=distance,
                return_expansion=True, filter=filter,
                filter_docs=filter_docs, offset=offset)
        else:
            hits = self.search_ids(query, k, case_id, prune, mode,
                                   window=window, filter=filter,
                                   filter_docs=filter_docs, offset=offset)
        spark = self.spark
        if hits.empty:
            return spark.createDataFrame([], schema=MATCHES)
        # boosts change scores, not spans: strip the ^ syntax before the
        # span-construction analysis so boosted terms still align; under
        # mode="boolean", spans come from the POSITIVE clauses only (a
        # prohibited term never occurs in a matched doc); under
        # mode="fuzzy", spans come from the EXPANDED terms (the query's
        # misspelling never occurs in a matched doc — its expansions do)
        if expanded is not None:
            qterms = sorted(expanded)
        else:
            span_query = query
            if mode == "boolean":
                must_raw, should_raw, _not_raw = parse_boolean(query)
                span_query = " ".join(must_raw + should_raw)
            qterms = self._analyze(parse_boosts(span_query)[0])
        offsets_fn = self._analyze_offsets

        hits_df = spark.createDataFrame(hits, schema="doc_id long, score double")
        doc_cols = ["case_id", "doc_id", "url", "text"]
        pos_by_doc: Dict[int, Dict[str, list]] = {}
        if use_index_pos:
            doc_cols += ["n_tokens", "tok_starts_bin", "tok_lens_bin",
                         "offs_crc32"]
            pos_by_doc = self._hit_positions(
                case_id, sorted(set(qterms)), [int(i) for i in hits["doc_id"]]
            )
        docs = self.docs.filter(F.col("case_id") == case_id).select(*doc_cols)
        joined = docs.join(F.broadcast(hits_df), "doc_id")

        def _spans_reanalyze(r):
            toks = offsets_fn(r.text)
            doc_terms = [t for t, _, _ in toks]
            offsets = [(s, e) for _, s, e in toks]
            return sc.align_phrase(doc_terms, offsets, qterms)

        def _spans_from_index(r):
            import zlib

            from pysearch import codec

            tok_spans = sc.align_phrase_positions(
                qterms, pos_by_doc.get(int(r.doc_id), {})
            )
            if not tok_spans:
                return []
            if zlib.crc32(r.tok_starts_bin) ^ zlib.crc32(r.tok_lens_bin) \
                    != r.offs_crc32:
                raise IOError("token-offset sidecar CRC mismatch")
            n = int(r.n_tokens)
            starts = np.cumsum(
                codec.varint_decode(r.tok_starts_bin, n).astype(np.int64)
            )
            lens = codec.varint_decode(r.tok_lens_bin, n).astype(np.int64)
            return [
                (int(starts[f]), int(starts[last] + lens[last]), score)
                for f, last, score in tok_spans
            ]

        span_fn = _spans_from_index if use_index_pos else _spans_reanalyze

        def build_matches(pdf: pd.DataFrame) -> pd.DataFrame:
            out = []
            for r in pdf.itertuples(index=False):
                spans = span_fn(r)[:max_spans]
                line_nums, lines = [], []
                for (cs, _ce, _s) in spans:
                    ln, line = sc.line_lookup(r.text, cs)
                    line_nums.append(ln)
                    lines.append(line)
                out.append({
                    "case_id": r.case_id,
                    "doc_id": r.doc_id,
                    "url": r.url,
                    "score": float(r.score),
                    "spans": [
                        {"start": int(s), "end": int(e), "score": float(sco)}
                        for (s, e, sco) in spans
                    ],
                    "line_nums": line_nums,
                    "lines": lines,
                    # reference Fragment (search_pdfs.go:50,189-192):
                    # ellipsized highlight around the best span
                    "fragment": sc.make_fragment(r.text, spans),
                })
            return pd.DataFrame(out, columns=[
                "case_id", "doc_id", "url", "score", "spans", "line_nums",
                "lines", "fragment",
            ])

        matches = joined.mapInPandas(
            lambda it: (build_matches(pdf) for pdf in it), schema=MATCHES
        )

        if best_filter:
            # reference Best(): keep only matches whose best span score equals
            # the global maximum span score (search_pdfs.go:63-102)
            from pyspark.sql.window import Window

            matches = matches.withColumn(
                "best_span", F.array_max(F.col("spans.score"))
            )
            w = Window.partitionBy(F.lit(1))
            matches = (
                matches.withColumn("gmax", F.max("best_span").over(w))
                .filter(
                    F.col("best_span").isNotNull()
                    & (F.col("best_span") >= F.col("gmax"))
                )
                .drop("best_span", "gmax")
            )
        return matches.orderBy(F.col("score").desc(), F.col("doc_id").asc())
