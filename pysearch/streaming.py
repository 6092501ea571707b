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


def foreach_batch_indexer(index_dir: str, **build_kwargs):
    """Continuous index maintenance: append each micro-batch to a
    persistent index via ``build_index(append=True)`` — the streaming face
    of incremental append (reference open-existing parity,
    bleve_glue.go:20-30; use case 2's arriving-documents path upgraded
    from match-only to full index ingestion).

    Re-delivered micro-batches are idempotent without tracking epoch ids:
    append dedupes against the existing docs table by (case_id, url) and
    content hash, so re-processing a batch appends nothing.  The first
    batch against an empty directory is a fresh build.
    """

    def handle(batch_df, epoch_id: int) -> None:
        from pysearch.build import build_index

        if batch_df.isEmpty():
            return
        build_index(batch_df.sparkSession, batch_df, index_dir,
                    append=True, **build_kwargs)

    return handle
