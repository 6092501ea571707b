"""pysearch — PySpark-native full-text inverted-index build + BM25 top-k search.

A brand-new engine with the capabilities of PaperCutSoftware/pdfsearch
(reference at /root/reference, studied in SURVEY.md), re-designed Spark-first
for Common-Crawl-style webtext tables ``(url, warc_ts, html, text, lang)``:

- SPIMI-style distributed index build: vectorized Arrow/pandas tokenization,
  doc-range *segments* so posting-block construction never shuffles by term
  (structural skew immunity), delta-gap + varint block compression with
  per-block max-score metadata, per-partition lineage + metrics, resumable
  from checkpoints.
- Top-k query engine: segment-local BM25 scoring (k1=1.2, b=0.75) with
  block-max / segment-max pruning (lossless WAND-style), phrase-span
  alignment and best-match filtering matching the reference's semantics
  (reference: internal/doclib/search_pdfs.go:382-484, :63-102).
"""

from pysearch.version import __version__  # noqa: F401

K1 = 1.2
B = 0.75
