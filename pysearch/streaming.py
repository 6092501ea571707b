"""Structured Streaming: the "check for terms as documents arrive" path.

Reference use case 2 (/root/reference/GOPHERCON.md:56): a short-lived
in-memory index that matches watch-terms against each arriving document,
served there by the in-memory bleve index
(/root/reference/internal/doclib/bleve_glue.go:35-38, selected when
persistDir == "" at index_pdfs.go:50-55).  Spark-first redesign:

- ``watch_terms_stream``: readStream(webtext) -> analyzer pandas UDF ->
  explode -> broadcast semi-join against the watch-term set -> per-doc
  matched terms.  Stateless, scales with executor count.
- ``windowed_term_counts``: event-time tumbling window counts per term with
  a watermark for late data.
- ``foreach_batch_matcher``: exactly-once micro-batch sink hook.
"""

from __future__ import annotations

from typing import List

import pandas as pd


def _analyze_udf():
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from pysearch.analyze import analyze_series

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def analyze_terms(texts: pd.Series) -> pd.Series:
        return analyze_series(texts)

    return analyze_terms


def watch_terms_stream(stream_df, watch_terms: List[str],
                       watermark: str = "1 hour"):
    """Streaming webtext -> (url, warc_ts, term) rows for watched terms.

    ``watch_terms`` are raw query strings; they pass through the same
    analyzer as documents (F1 invariant: one analyzer for index and query).
    Dedup state is bounded by the event-time watermark — a plain
    dropDuplicates would grow the state store forever on a long-running
    stream.
    """
    from pyspark.sql import functions as F

    from pysearch.analyze import analyze

    analyzed = sorted({t for q in watch_terms for t in analyze(q)})
    udf = _analyze_udf()
    src = stream_df
    if stream_df.isStreaming:
        src = src.withWatermark("warc_ts", watermark)
    toks = src.select("url", "warc_ts", F.explode(udf("text")).alias("term"))
    matched = toks.filter(F.col("term").isin(analyzed))
    if stream_df.isStreaming:
        # watermark-bounded dedup state; plain dropDuplicates would grow
        # the state store forever on a long-running stream
        return matched.dropDuplicatesWithinWatermark(["url", "term"])
    return matched.dropDuplicates(["url", "term"])  # foreachBatch static path


def windowed_term_counts(stream_df, watch_terms: List[str],
                         window: str = "10 minutes",
                         watermark: str = "30 minutes"):
    """Event-time tumbling-window counts per watched term with late-data
    handling via watermark."""
    from pyspark.sql import functions as F

    matches = watch_terms_stream(stream_df, watch_terms, watermark=watermark)
    return (
        matches
        .groupBy(F.window("warc_ts", window), "term")
        .agg(F.count("*").alias("n_docs"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "term",
            "n_docs",
        )
    )


def streaming_dedup(stream_df, watermark: str = "1 hour"):
    """Stateful streaming exact-dedup: first occurrence of each content
    hash wins; later duplicates are dropped across micro-batches (state
    bounded by the event-time watermark).  The streaming face of the P4
    dedup family — Spark's dropDuplicatesWithinWatermark keeps the hash
    state store, giving exactly-once duplicate suppression."""
    from pyspark.sql import functions as F

    hashed = stream_df.withColumn(
        "content_hash",
        F.sha2(
            F.coalesce(F.col("html"), F.encode(F.col("text"), "utf-8")), 256
        ),
    ).withWatermark("warc_ts", watermark)
    return hashed.dropDuplicatesWithinWatermark(["content_hash"])


def foreach_batch_matcher(watch_terms: List[str], out_dir: str):
    """Exactly-once micro-batch sink: append per-batch matches to parquet.

    The short-lived in-memory index of the reference becomes a per-batch
    match job; the epoch id makes re-delivered batches idempotent
    (overwrite-by-epoch partition)."""

    def handle(batch_df, epoch_id: int) -> None:
        from pyspark.sql import functions as F

        matched = watch_terms_stream(batch_df, watch_terms)
        (
            matched.withColumn("epoch", F.lit(epoch_id))
            .write.mode("overwrite")
            .parquet(f"{out_dir}/epoch={epoch_id}")
        )

    return handle


def _shape_batch_text(batch_df):
    """Engine-parity corpus shaping, stage 1 (build_docs_stage semantics,
    build.py): S4 text extraction for html-only rows FIRST (r3 ADVICE:
    dropping text-null rows silently diverged from the persistent-index
    path), then the content hash and the P1 empty filter.  Returns
    (url, content_hash, text)."""
    from pyspark.sql import functions as F

    df = batch_df
    if "text" not in df.columns or "html" in df.columns:
        from pyspark.sql import types as T

        from pysearch.corpus import extract_text_series

        @F.pandas_udf(T.StringType())
        def extract_udf(htmls: pd.Series) -> pd.Series:
            return extract_text_series(htmls)

        if "text" not in df.columns:
            df = df.withColumn("text", extract_udf("html"))
        else:
            # extraction UDF only on the rows that need it (same split as
            # build_docs_stage — a blanket when/otherwise would push every
            # row through the Python worker)
            with_text = df.filter(F.col("text").isNotNull())
            need = df.filter(
                F.col("text").isNull() & F.col("html").isNotNull()
            )
            df = with_text.unionByName(
                need.withColumn("text", extract_udf("html"))
            )
    df = df.filter(F.col("text").isNotNull())
    text_hash = F.sha2(F.encode(F.col("text"), "utf-8"), 256)
    if "html" in df.columns:
        content_hash = F.when(
            F.col("html").isNotNull(), F.sha2(F.col("html"), 256)
        ).otherwise(text_hash)
    else:
        content_hash = text_hash
    return (
        df.withColumn("content_hash", content_hash)
        .filter(F.length(F.trim(F.col("text"))) > 0)
        .select("url", "content_hash", "text")
    )


def _dedupe_batch(df):
    """Engine-parity corpus shaping, stage 2: content-dedupe keeping the
    min url per hash (P4), then url-dedupe keeping the min content hash
    (P3) — the same winners build_docs_stage picks.  The dedupe windows run
    on a TEXT-FREE projection (docs-stage rule: no shuffle carries document
    bodies for id/dedupe work); winners join back broadcast/AQE-sized.
    Returns (url, text)."""
    from pyspark.sql import functions as F

    proj = df.select("url", "content_hash")
    # min-aggregates, not rank windows: a groupBy(min) partially aggregates
    # map-side before the exchange and needs no per-partition sort, while
    # picking the SAME winners — "keep the row whose url is the min of its
    # hash group" == one (hash -> min url) row per group, then "min hash
    # per url among those" == the second aggregate
    winners = (
        proj.groupBy("content_hash").agg(F.min("url").alias("url"))
        .groupBy("url").agg(F.min("content_hash").alias("content_hash"))
        .select("url", "content_hash")
    )
    # rows equal on (url, hash) are identical by the content-hash contract,
    # so the dropDuplicates after the semi join is value-deterministic
    return (
        df.join(winners, ["url", "content_hash"], "left_semi")
        .dropDuplicates(["url"])
        .select("url", "text")
    )


def _contains(hay, needle):
    n = len(needle)
    first = needle[0]
    for i in range(len(hay) - n + 1):
        if hay[i] == first and tuple(hay[i:i + n]) == needle:
            return True
    return False


def _tok_query_tfs(an, qset, phrase_seqs):
    """mapInPandas transform over (url, text): one tokenize pass emitting a
    per-doc stats row (term NULL, dl = analyzed length) plus one
    (url, dl, term, tf) row per query term the doc contains.  Phrase
    containment markers ride the same rows as real terms under a reserved
    "\\x00p:" prefix ("\\x00" can never appear in an analyzed term), so
    presence lands in the same per-url map the scorer already builds — no
    extra column, job, or join."""

    def tok(batches):
        for pdf in batches:
            urls, dls, terms, tfs = [], [], [], []
            for url, text in zip(pdf["url"], pdf["text"]):
                toks = an(text)
                urls.append(url)
                dls.append(len(toks))
                terms.append(None)  # per-doc stats row
                tfs.append(0)
                counts: dict = {}
                for t in toks:
                    if t in qset:
                        counts[t] = counts.get(t, 0) + 1
                for t, c in counts.items():
                    urls.append(url)
                    dls.append(len(toks))
                    terms.append(t)
                    tfs.append(c)
                for qid, seq in phrase_seqs.items():
                    # cheap pre-gate: every phrase term must have counted
                    if all(t in counts for t in seq) and _contains(toks, seq):
                        urls.append(url)
                        dls.append(len(toks))
                        terms.append("\x00p:" + qid)
                        tfs.append(1)
            yield pd.DataFrame(
                {"url": urls, "dl": dls, "term": terms, "tf": tfs}
            )

    return tok


def _build_plans(analyzed, dfs, n_docs, mode):
    """Per-query scoring plan against corpus stats (n_docs, per-term dfs):
    (live terms sorted ascending, idfs, query-term tfs, conjunctive
    requirement, phrase marker).  Queries with no live terms — or, under
    all/phrase, any corpus-absent term — get no plan."""
    from pysearch import score as sc

    plans = {}
    for qid, terms in analyzed.items():
        live = sorted({t for t in terms if dfs.get(t, 0) > 0})
        if not live or (mode in ("all", "phrase")
                        and len(live) < len(set(terms))):
            continue
        qtf = {}
        for t in terms:
            qtf[t] = qtf.get(t, 0) + 1
        idfs = {t: sc.idf(n_docs, dfs[t]) for t in live}
        plans[qid] = (live, idfs, qtf,
                      len(live) if mode in ("all", "phrase") else 0,
                      ("\x00p:" + qid) if mode == "phrase" else None)
    return plans


def _score_mem_topk(toks, plans, avgdl, k, materialize: bool = True):
    """Score the tokenized (url, dl, term, tf) rows against every plan and
    return the per-query top-k as a DataFrame (qid, url, score), ties by
    url ascending.  ``materialize=True`` (default) localCheckpoints the
    result so it survives the caller's ``toks.unpersist()``; callers that
    collect() while ``toks`` is still persisted pass False and save that
    extra action."""
    import numpy as np
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from pysearch import B, K1

    def score_parts(batches):
        # partition-wise scoring: repartition("url") co-locates each
        # doc's term rows; accumulate per-url term maps across arrow
        # batches, then score every doc in ONE Python call per
        # partition (a per-group applyInPandas paid ~2ms of call
        # overhead per DOCUMENT — measured 12s for 5k docs at sf0.1)
        acc: dict = {}
        for pdf in batches:
            for url, term, tf, dl in zip(pdf["url"], pdf["term"],
                                         pdf["tf"], pdf["dl"]):
                acc.setdefault(url, {})[term] = (tf, dl)
        out_q, out_u, out_s = [], [], []
        for url, have in acc.items():
            for qid, (live, idfs, qtf, require, marker) in plans.items():
                if marker is not None and marker not in have:
                    continue
                present = [t for t in live if t in have]
                if not present or (require and len(present) < require):
                    continue
                terms_s = []
                for t in present:  # live sorted -> ascending term order
                    tf, dl = have[t]
                    tf = np.float64(tf)
                    denom = tf + K1 * (1.0 - B + B * np.float64(dl) / avgdl)
                    terms_s.append(
                        float(idfs[t] * (tf * (K1 + 1.0)) / denom * qtf[t])
                    )
                # sum with the ENGINE's reduction (np.add.reduceat in
                # _topk_from_decoded), not a scalar loop: numpy's
                # reduce is pairwise, so for >=3 terms a left-to-right
                # += differs by 1 ULP from the engine — found by the
                # multi-term parity test; same slice length + element
                # order == same reduction tree == bit-equal scores
                s = float(np.add.reduceat(
                    np.asarray(terms_s, dtype=np.float64), [0])[0])
                out_q.append(qid)
                out_u.append(url)
                out_s.append(s)
        yield pd.DataFrame({"qid": out_q, "url": out_u, "score": out_s})

    scored = (
        toks.filter(F.col("term").isNotNull())
        .repartition("url")
        .mapInPandas(score_parts,
                     schema="qid string, url string, score double")
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("score").desc(), F.col("url").asc()
    )
    out = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
        .orderBy("qid", F.col("score").desc(), "url")
    )
    # materialize before the caller's unpersist (see docstring)
    return out.localCheckpoint() if materialize else out


def _mem_local_gate() -> int:
    """Row gate for the driver-local mem-side scorer — the same knob and
    default as the engine's local scoring path (query.LOCAL_MAX_POSTINGS;
    env PYSEARCH_LOCAL_MAX_POSTINGS, 0 disables).  The mem side's
    candidate volume — one (url, dl, term, tf) row per (doc, query-term
    or phrase-marker) hit — is known EXACTLY from the stats aggregate's
    per_term counts before any scoring job runs."""
    import os

    from pysearch.query import LOCAL_MAX_POSTINGS

    return int(os.environ.get("PYSEARCH_LOCAL_MAX_POSTINGS",
                              LOCAL_MAX_POSTINGS))


def _score_mem_topk_local(tok_rows, plans, avgdl, k):
    """Driver-local counterpart of _score_mem_topk: same per-url term
    maps, same np.float64 op order and np.add.reduceat reduction, same
    (qid asc, score desc, url asc) per-query top-k — bit-identical by
    construction (pinned by test).  Replaces the second distributed job
    (repartition(url) exchange + python workers + rank window) with one
    bounded collect of the persisted candidate rows."""
    import numpy as np

    from pysearch import B, K1

    acc: dict = {}
    for r in tok_rows:
        acc.setdefault(r["url"], {})[r["term"]] = (r["tf"], r["dl"])
    out = []
    for url, have in acc.items():
        for qid, (live, idfs, qtf, require, marker) in plans.items():
            if marker is not None and marker not in have:
                continue
            present = [t for t in live if t in have]
            if not present or (require and len(present) < require):
                continue
            terms_s = []
            for t in present:  # live sorted -> ascending term order
                tf, dl = have[t]
                tf = np.float64(tf)
                denom = tf + K1 * (1.0 - B + B * np.float64(dl) / avgdl)
                terms_s.append(
                    float(idfs[t] * (tf * (K1 + 1.0)) / denom * qtf[t])
                )
            s = float(np.add.reduceat(
                np.asarray(terms_s, dtype=np.float64), [0])[0])
            out.append((qid, url, s))
    # (qid asc, score desc, url asc) == the distributed path's window
    # rank + final orderBy; scores are > 0 so -s is a total order key
    out.sort(key=lambda r: (r[0], -r[2], r[1]))
    res, taken = [], {}
    for qid, url, s in out:
        c = taken.get(qid, 0)
        if c < k:
            res.append((qid, url, s))
            taken[qid] = c + 1
    return res


def score_arriving_batch(batch_df, queries: dict, k: int = 10,
                         analyzer: str = "en", mode: str = "any"):
    """Scored in-memory arrival index — reference use case 2
    (/root/reference/GOPHERCON.md:56: "Check for terms in a PDF as it
    arrives. (Short-lived in-memory index.)", served there by the in-memory
    bleve index, bleve_glue.go:35-38): run a full BM25 ranked search over
    JUST the arriving micro-batch, no persistent index.

    ``queries``: qid -> query string.  Returns a DataFrame
    (qid, url, score) with each query's top-k over the batch, RANK-IDENTICAL
    to building a real index over the same batch and searching it (same
    analyzer, same P1/P3/P4 dedupe rules, same idf/BM25 arithmetic summed in
    ascending term order, ties by url ascending == the engine's doc_id
    ascending since doc_ids are url ranks) — pinned by test.

    The batch is treated as ONE corpus (batch-local N/avgdl/df, the
    reference's short-lived-index semantics).  Scale shape: one tokenize
    pass emitting only query-term tfs plus one stats row per doc, two tiny
    aggregates, then a groupBy(url) scoring pass — nothing corpus-sized
    ever reaches the driver.

    ``mode="all"`` requires every analyzed query term to occur in the doc
    (conjunctive), matching ``Searcher.search_ids(mode="all")``.

    ``mode="phrase"`` additionally requires the analyzed query terms at
    CONSECUTIVE positions, matching ``Searcher.search_ids(mode="phrase")``:
    positions are ungapped indices into the analyzed token stream
    (analyze.py), so adjacency == contiguous-sublist containment of the
    analyzed query in the analyzed doc — checked inside the same tokenize
    pass that counts tfs (the token stream is already in hand; no extra
    scan, no positions shuffle).  Phrase hits score bit-identically to
    their mode="all" scores, as in the engine."""
    from pyspark.sql import functions as F

    from pysearch.analyze import get_analyzer

    if mode not in ("any", "all", "phrase"):
        raise ValueError(f"mode must be 'any', 'all' or 'phrase', got {mode!r}")
    an, _, _ = get_analyzer(analyzer)
    analyzed = {qid: an(q) for qid, q in queries.items()}
    union_terms = sorted({t for ts in analyzed.values() for t in ts})
    # phrase containment markers ride the same (url, dl, term, tf) rows as
    # real terms under a reserved "\x00p:" prefix ("\x00" can never appear
    # in an analyzed term), so presence lands in the same per-url map the
    # scorer already builds — no extra column, job, or join
    phrase_seqs = (
        {qid: tuple(ts) for qid, ts in analyzed.items() if ts}
        if mode == "phrase" else {}
    )

    spark = batch_df.sparkSession
    empty = spark.createDataFrame([], schema="qid string, url string, score double")
    if not union_terms:
        return empty

    df = _dedupe_batch(_shape_batch_text(batch_df))
    toks = df.mapInPandas(
        _tok_query_tfs(an, set(union_terms), phrase_seqs),
        schema="url string, dl long, term string, tf long",
    ).persist()
    try:
        # ONE aggregate job serves both corpus stats and term dfs: the
        # per-doc stats rows carry term=NULL, so their group gives (N,
        # sum_dl) and every other group gives that term's df
        per_term = {
            r["term"]: (int(r["n"]), int(r["s"]))
            for r in toks.groupBy("term").agg(
                F.count("*").alias("n"),
                F.coalesce(F.sum("dl"), F.lit(0)).alias("s"),
            ).collect()
        }
        n_docs, sum_dl = per_term.pop(None, (0, 0))
        if n_docs == 0:
            return empty
        avgdl = sum_dl / n_docs
        dfs = {t: n for t, (n, _s) in per_term.items()}

        plans = _build_plans(analyzed, dfs, n_docs, mode)
        if not plans:
            return empty
        # candidate volume == the stats aggregate's per-term row counts;
        # under the gate, score driver-side from one bounded collect of
        # the persisted rows (no exchange, no python workers, no window)
        local_max = _mem_local_gate()
        vol_mem = sum(n for n, _s in per_term.values())
        if 0 < vol_mem <= local_max:
            rows = _score_mem_topk_local(
                toks.filter(F.col("term").isNotNull()).collect(),
                plans, avgdl, k)
        else:
            # collect while toks is persisted and hand back a local frame
            # — one action instead of localCheckpoint + caller's collect
            rows = _score_mem_topk(toks, plans, avgdl, k,
                                   materialize=False).collect()
        return spark.createDataFrame(
            rows, schema="qid string, url string, score double")
    finally:
        toks.unpersist()


def search_with_arrivals(searcher, batch_df, queries: dict, k: int = 10,
                         case_id: str = "0", mode: str = "any",
                         prune: bool = True) -> pd.DataFrame:
    """Near-real-time HYBRID search: score a query log against the
    persistent index AND a not-yet-flushed arrival batch together, under
    the COMBINED corpus statistics — the answer the index will give after
    ``build_index(append=batch)`` flushes, before paying for the flush
    (Lucene's NRT-reader model; reference use case 2 upgraded from
    batch-local stats to whole-corpus stats).

    Returns a pandas frame (qid, url, score): each query's top-k over
    index ∪ batch, with scores BIT-IDENTICAL to appending the batch and
    searching (pinned by test), for mode any|all|phrase.  Semantics mirror
    the append exactly:

    - batch shaping = build_docs_stage: S4 html→text extraction, P1 empty
      filter, THEN the append anti-joins (a batch row whose url or content
      hash already exists in the index is the index doc — append never
      updates), THEN within-batch P4/P3 dedup — the same order as
      build.py, because winner selection is order-sensitive.
    - combined stats: n = n_idx + n_mem, avgdl = (sum_dl_idx + sum_dl_mem)
      / n as one float64 division of exact longs (identical to the
      finalize arithmetic), df(t) = df_idx(t) + df_mem(t); both sides
      score with these, so a mem doc and an index doc with the same tf/dl
      get the same score.
    - tie order: post-append doc_ids put every arrival AFTER every index
      doc (next segment boundary), arrivals ordered by url — the merge
      reproduces that exactly (index hits by doc_id, then arrivals by
      url, within equal scores).

    Scale shape: the index side scores the WHOLE query log in ONE
    partition-pruned postings scan (the ``search_ids_many`` engine —
    shared per-segment decode, O(k · |queries|) rows to the driver);
    ``prune=True`` (default) adds the batched lossless per-query block-max
    prune on top (θ_q from index candidates — a lower bound of the
    index-side kth score, so pruning stays lossless under the merge),
    ``prune=False`` keeps the exhaustive one-pass scan.  The mem side is
    one tokenize pass + two tiny aggregates over the batch either way."""
    from pyspark.sql import functions as F

    from pysearch import score as sc

    if mode not in ("any", "all", "phrase"):
        raise ValueError(f"mode must be 'any', 'all' or 'phrase', got {mode!r}")
    if mode == "phrase" and not searcher.positions_stored:
        raise ValueError(
            "mode='phrase' needs an index built with store_positions=True"
        )
    searcher._check_fresh()
    an = searcher._analyze
    analyzed = {qid: an(q) for qid, q in queries.items()}
    union_terms = sorted({t for ts in analyzed.values() for t in ts})
    empty = pd.DataFrame(columns=["qid", "url", "score"])
    if not union_terms:
        return empty
    phrase_seqs = (
        {qid: tuple(ts) for qid, ts in analyzed.items() if ts}
        if mode == "phrase" else {}
    )

    # ---- arrival side: shape -> append anti-joins -> dedupe -> tokenize
    src = batch_df
    if "case_id" in src.columns:
        # a hybrid search serves ONE case; rows bound for other cases
        # cannot affect it (they would append elsewhere)
        src = src.filter(F.col("case_id").cast("string") == case_id)
    df = _shape_batch_text(src)
    keys = searcher._catalog_keys(case_id)
    if keys is not None:
        # catalog under the LOCAL_MAX_CATALOG gate: the "already indexed"
        # anti-joins keep their shape but build their broadcast side from
        # the cached in-memory key relations — no docs-table scan job per
        # hybrid query; same surviving rows
        url_df, hash_df = keys
        df = df.join(F.broadcast(url_df), "url", "left_anti")
        df = df.join(F.broadcast(hash_df), "content_hash", "left_anti")
    else:
        existing = searcher.docs.filter(F.col("case_id") == case_id)
        df = df.join(existing.select("url"), "url", "left_anti")
        df = df.join(existing.select("content_hash"), "content_hash",
                     "left_anti")
    df = _dedupe_batch(df)
    toks = df.mapInPandas(
        _tok_query_tfs(an, set(union_terms), phrase_seqs),
        schema="url string, dl long, term string, tf long",
    ).persist()
    try:
        per_term = {
            r["term"]: (int(r["n"]), int(r["s"]))
            for r in toks.groupBy("term").agg(
                F.count("*").alias("n"),
                F.coalesce(F.sum("dl"), F.lit(0)).alias("s"),
            ).collect()
        }
        n_mem, sum_dl_mem = per_term.pop(None, (0, 0))
        dfs_mem = {t: n for t, (n, _s) in per_term.items()}

        # ---- combined corpus stats (exact long arithmetic, one division)
        n_idx, _avgdl_idx, sum_dl_idx = searcher._corpus.get(
            case_id, (0, 0.0, 0))
        dfs_idx = searcher._term_dfs(case_id, union_terms) if n_idx else {}
        n_docs = n_idx + n_mem
        if n_docs == 0:
            return empty
        avgdl = (sum_dl_idx + sum_dl_mem) / n_docs
        dfs = {t: dfs_idx.get(t, 0) + dfs_mem.get(t, 0)
               for t in union_terms}
        plans = _build_plans(analyzed, dfs, n_docs, mode)
        if not plans:
            return empty

        # ---- mem side: all plans in one pass, per-query top-k (collected
        # while toks is still persisted — no checkpoint action needed);
        # under the local gate the pass is one bounded collect + driver
        # scoring (bit-identical — see _score_mem_topk_local)
        mem_hits: dict = {}
        if n_mem:
            vol_mem = sum(n for n, _s in per_term.values())
            if 0 < vol_mem <= _mem_local_gate():
                recs = _score_mem_topk_local(
                    toks.filter(F.col("term").isNotNull()).collect(),
                    plans, avgdl, k)
            else:
                recs = [(r["qid"], r["url"], r["score"])
                        for r in _score_mem_topk(
                            toks, plans, avgdl, k,
                            materialize=False).collect()]
            for qid, url, s in recs:
                mem_hits.setdefault(qid, []).append((url, float(s)))
    finally:
        toks.unpersist()

    # ---- index side, with the UNION stats injected (idfs/avgdl/require).
    # BOTH routes score the whole query log's index side in ONE postings
    # scan via the batched engine (the search_ids_many amortization —
    # shared decode, O(k·|queries|) rows to the driver).  prune=True
    # additionally runs the batched lossless per-query block-max prune
    # (Searcher._prune_many_blocks) when candidate volume clears the gate;
    # prune=False keeps the exhaustive one-pass scan.  Either way results
    # are identical to per-query scoring (pruning is lossless; pinned by
    # the NRT bit-identity tests).  θ_q comes from index-side candidates
    # only — a lower bound of the index-side kth score, so pruning the
    # index list stays lossless regardless of the mem-side merge.
    idx_plans: dict = {}
    for qid, (live, idfs, qtf, require, _marker) in plans.items():
        live_idx = [t for t in live if dfs_idx.get(t, 0) > 0]
        if not live_idx or (mode in ("all", "phrase")
                            and len(live_idx) < len(live)):
            continue  # no index doc can contain a term the index lacks
        idfs_idx = {t: idfs[t] for t in live_idx}
        if mode == "phrase":
            idx_plans[qid] = (idfs_idx, list(analyzed[qid]), dict(qtf))
        else:
            idx_plans[qid] = (idfs_idx, dict(qtf), require)
    idx_hits: dict = {}
    if idx_plans:
        vol_idx = sum(dfs_idx.get(t, 0) for t in union_terms)
        do_prune = (
            prune and mode in ("any", "all")
            and vol_idx > searcher.prune_min_postings * len(idx_plans)
        )
        vols = [sum(dfs_idx.get(t, 0) for t in p[0])
                for p in idx_plans.values()]
        many = searcher._score_many_blocks(
            idx_plans, avgdl, case_id, k, mode, prune=do_prune,
            local=(not do_prune) and searcher._use_local_batch(vols))
        for r in many.itertuples(index=False):
            idx_hits.setdefault(r.qid, []).append(
                (int(r.doc_id), float(r.score)))

    # one catalog lookup for every index hit across the whole query log
    url_of = {}
    all_ids = sorted({i for hits in idx_hits.values() for i, _ in hits})
    if all_ids:
        url_of = {
            int(r["doc_id"]): r["url"]
            for r in searcher.docs.filter(
                (F.col("case_id") == case_id)
                & F.col("doc_id").isin(all_ids)
            ).select("doc_id", "url").collect()
        }

    # ---- merge: equal scores order index-before-mem (post-append ids put
    # arrivals last), index by doc_id asc, arrivals by url asc
    rows = []
    for qid in sorted(plans):
        cand = [(s, 0, i, url_of[i]) for i, s in idx_hits.get(qid, [])]
        cand += [(s, 1, u, u) for u, s in mem_hits.get(qid, [])]
        cand.sort(key=lambda t: (-t[0], t[1], t[2]))
        rows += [(qid, u, s) for s, _g, _key, u in cand[:k]]
    return pd.DataFrame(rows, columns=["qid", "url", "score"])


def foreach_batch_scored_matcher(queries: dict, out_dir: str, k: int = 10,
                                 analyzer: str = "en", mode: str = "any"):
    """Streaming sink for the scored arrival index: per micro-batch, run
    ``score_arriving_batch`` and append the per-query top-k to parquet,
    idempotent by epoch (overwrite-by-epoch partition)."""

    def handle(batch_df, epoch_id: int) -> None:
        from pyspark.sql import functions as F

        if batch_df.isEmpty():
            return
        res = score_arriving_batch(batch_df, queries, k=k,
                                   analyzer=analyzer, mode=mode)
        (
            res.withColumn("epoch", F.lit(epoch_id))
            .write.mode("overwrite")
            .parquet(f"{out_dir}/epoch={epoch_id}")
        )

    return handle


def foreach_batch_indexer(index_dir: str, compact_every: int = 16,
                          **build_kwargs):
    """Continuous index maintenance: append each micro-batch to a
    persistent index via ``build_index(append=True)`` — the streaming face
    of incremental append (reference open-existing parity,
    bleve_glue.go:20-30; use case 2's arriving-documents path upgraded
    from match-only to full index ingestion).

    Re-delivered micro-batches are idempotent without tracking epoch ids:
    append dedupes against the existing docs table by (case_id, url) and
    content hash, so re-processing a batch appends nothing.  The first
    batch against an empty directory is a fresh build.

    Compaction policy (the r2 scale flaw: commits accumulated unboundedly
    between MANUAL compactions, degrading query planning linearly in batch
    count on a long-running stream): once the postings table holds more
    than ``compact_every`` commit batches, the sink compacts the index
    in-line before the next batch — the stream is the index's only WRITER
    inside foreachBatch, so the single-writer precondition holds by
    construction.  Query cost is thereby bounded at O(compact_every)
    commit scans regardless of stream lifetime.

    Compaction is safe under concurrent READERS (r4): it commits as an
    atomic snapshot generation flip that retains the superseded
    generation on disk, so a live ``Searcher``'s resolved plans keep
    reading their files through the flip and its next search refreshes
    onto the new generation (``Searcher._check_fresh``).  A reader is
    only at risk if it stays pinned (``on_stale="ignore"``) across TWO
    compactions — its generation is then expired; refresh at least once
    per compaction cycle, or run ``compact.expire_generations`` only in
    maintenance windows.  ``compact_every=0`` disables the policy."""

    def handle(batch_df, epoch_id: int) -> None:
        from pysearch.build import build_index
        from pysearch.compact import compact_index
        from pysearch.lineage import IndexLayout

        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        build_index(spark, batch_df, index_dir, append=True, **build_kwargs)
        if compact_every:
            layout = IndexLayout(index_dir)
            if len(layout.list_commits(layout.postings)) > compact_every:
                compact_index(spark, index_dir)

    return handle


def foreach_batch_nrt(index_dir: str, queries: dict, out_dir: str,
                      k: int = 10, case_id: str = "0", mode: str = "any",
                      compact_every: int = 16, **build_kwargs):
    """Serve-then-flush streaming sink: per micro-batch, FIRST answer the
    query log over index ∪ batch (``search_with_arrivals`` — results
    available before paying for the flush), write the per-epoch top-k to
    parquet, THEN append the batch to the index (same ingestion +
    auto-compaction policy as ``foreach_batch_indexer``).

    Epoch results are idempotent under micro-batch redelivery: a
    re-delivered batch's rows are already in the index, so the hybrid's
    append anti-joins collapse the mem side to empty and the index side
    returns exactly the ranks the original hybrid computed (the flush
    changed nothing the hybrid hadn't already accounted for) — and the
    epoch partition is overwritten either way.  The first batch against a
    missing/empty index is served by the batch-local arrival scorer
    (``score_arriving_batch`` — there is no corpus to combine with yet),
    then becomes the initial build."""

    def handle(batch_df, epoch_id: int) -> None:
        from pyspark.sql import functions as F

        from pysearch.build import build_index
        from pysearch.compact import compact_index
        from pysearch.lineage import IndexLayout
        from pysearch.query import Searcher

        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        layout = IndexLayout(index_dir)
        if layout.stage_done("finalize"):
            s = Searcher(spark, index_dir)
            res = spark.createDataFrame(
                search_with_arrivals(s, batch_df, queries, k=k,
                                     case_id=case_id, mode=mode),
                schema="qid string, url string, score double",
            )
        else:
            serve_df = batch_df
            if "case_id" in serve_df.columns:
                # the serve path answers ONE case, like the hybrid
                serve_df = serve_df.filter(
                    F.col("case_id").cast("string") == case_id)
            res = score_arriving_batch(
                serve_df, queries, k=k, mode=mode,
                analyzer=build_kwargs.get("analyzer", "en"))
        (
            res.withColumn("epoch", F.lit(epoch_id))
            .write.mode("overwrite")
            .parquet(f"{out_dir}/epoch={epoch_id}")
        )
        build_index(spark, batch_df, index_dir, append=True, **build_kwargs)
        if compact_every:
            if len(layout.list_commits(layout.postings)) > compact_every:
                compact_index(spark, index_dir)

    return handle
