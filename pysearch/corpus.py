"""Deterministic synthetic webtext corpus — the doMatch fixture generator.

Reproduces, per FIXTURES.md, the deterministic test corpus of the reference's
search-correctness oracle (/root/reference/internal/doclib/bleve_mem_test.go:
``makeMemIndex`` :66-100, ``phrase`` :142-150, ``makeWords`` :155-167,
``allText`` :169-225).  ``ALL_TEXT`` below is the corpus *data constant*
mandated byte-for-byte by FIXTURES.md §2 (it is the GopherCon talk abstract,
i.e. fixture data, not engine code).

Output table shape is the BASELINE.json ``input_hint`` webtext schema:
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``
plus a ``case_id`` partition column (each case is an independent corpus).

Per-row invariant: ``extract_text(html)`` is byte-identical to ``text``.

Generators come in two forms:
- ``case_pandas`` — driver-side pandas for small fixtures/tests.
- ``webtext_df`` — distributed ``spark.range`` + ``mapInPandas`` generation
  (no driver-side materialization) for bench corpora up to millions of docs.
"""

from __future__ import annotations

import datetime as _dt
from typing import Iterator, List, Tuple

import pandas as pd

EPOCH = _dt.datetime(2019, 7, 30, 0, 0, 0, tzinfo=_dt.timezone.utc)

# The 8 reference query cases: (case_id, term, num_docs, doc_len)
# (/root/reference/internal/doclib/bleve_mem_test.go:17-24)
CASES: List[Tuple[int, str, int, int]] = [
    (1, "be the person who", 5, 100),
    (2, "but I prefer Python when", 5, 2000),
    (3, "be the person who", 50, 100),
    (4, "with good intentions for", 50, 1000),
    (5, "but I prefer Python when", 100, 2000),
    (6, "in the realm of", 500, 200),
    (7, "a cornucopia of", 5000, 100),
    (8, "if you are wrong then", 100, 100000),
]

ALL_TEXT = """
Many modern software product developers work close to the top of a powerful open source
software stack and focus on their customer problems.

This talk is about how I worked further down the Go software stack to write a PDF Full Text
Search library and solve customer problems in unexpected ways.

This talk is about how I wrote a PDF Full Text Search library. This sounds like it
could take a long time to write and is not necessarily the kind of project that you would
expect a small Australian software product company to undertake.

Modern software product companies often solve customer problems using a powerful open source
software stack, such as the Go ecosystem. It takes extra work to create
libraries further down the software stack, but there is extra value in doing so: if a necessary
library doesn’t exist then you can build it yourself. This is critical for companies who survive on
the technical depth of their software.

The Go programming culture and library ecosystem allowed me to work effectively further down the
software stack to build a PDF Full Text Search library. The main factors that made it possible were:
* Most of the work in my solution was done by the high-quality Go libraries my library calls,
 UniDoc for the PDF text extraction and
 bleve for the indexing and full text search.
* These two libraries were written in Go style so they were simple and I could understand how they
 worked which allowed me to figure out how to combine them to solve my problem.
* It was possible to do PDF full text search with these two libraries using one simple additional
  concept, a mapping between PDF text bounding boxes and the offsets of substrings in the text extracted from PDF pages_.
* It took only a small pull request to UniDoc to get a
 function that provided these mappings. UniDoc's idiomatic Go style made this simple.
* It was easy to create bleve indexes over the text extracted by UniDoc then do full text search in
 bleve to get back the page numbers and offsets of the matches. Then I used the offset-bounding-box mappings above and more UniDoc code to mark up the original PDFs with rectangles around the matches.

This sounds straightforward and it was. But it didn't have to be. Not all software stacks have code
much functionality that is as easy to understand and use as that in the Go ecosystem.

Doing PDF full text search with a pure Go library provided several benefits for the software
products my employer, PaperCut, makes.
* Product developers could just call my library from my Go code rather than setting up a web service
 running Elasticsearch. The developer time saved here quickly paid back the 2-3 developer weeks I
 spent writing the Go library.
* The code was used in three apps that were all easy with light-weight executables but would have
been harder with big Java apps running on a JVM.
  1) Search over a user’s files stored locally on disk. Nothing leaves the user's computer.
  2) Check for terms in a PDF as it arrives. (Short-lived in-memory index.)
  3) Search over a shared index stored on a bucket. The app writer needed to run the indexing and
   search code on a Google node and to store the index as a flat memory buffer.

Using a simple pure Go library for PDF full text search has several additional advantages:
* It runs fast. This is a Go app that does nothing but index and search PDFs. It is a tiny fraction of the code in Adobe Reader. Therefore it can run fast.
* It can be fixed fast. There are heuristics in text extraction. These are much easier to tweek in idiomatic Go than in mature Java code.
* It is possible to extend to domain-specific searches with some extra Go coding. E.g. Extract
tables from the PDFs and create indexes over tables for scientific and financial work.

PaperCut decided to open source this code to allow our software product teams to work at the top of
the Go software stack and use a simple high-value open source library for functionality. (This means
that I will spend some time cleaning up the code over the next few weeks in the hope that software
product developers can use it the way I used Go libraries it is based on.)
"""


def make_words(text: str) -> List[str]:
    """Split on newlines then spaces, dropping '' and '*' (ref :155-167)."""
    words: List[str] = []
    for line in text.split("\n"):
        for w in line.split(" "):
            if w == "" or w == "*":
                continue
            words.append(w)
    return words


ALL_WORDS = make_words(ALL_TEXT)


def phrase(i0: int, n: int) -> str:
    """Filler phrase of n words starting at (i0+17)*47 (ref :142-150)."""
    i0 = (i0 + 17) * 47
    nw = len(ALL_WORDS)
    return " ".join(ALL_WORDS[i % nw] for i in range(i0, i0 + n))


def _blen(s: str) -> int:
    """Length in UTF-8 bytes (Go ``len`` semantics; corpus has U+2019)."""
    return len(s.encode("utf-8"))


def doc_text(i: int, term: str, num_docs: int, doc_len: int) -> str:
    """Document text for 1-based doc i; matches iff i % 3 != 2 (ref :74-95)."""
    payload = f" {term} " if do_match(i) else " "
    text = f"Phrase {i}: {phrase(i, 5)}{payload}{phrase(i + num_docs, 10)}"
    j = 1
    while _blen(text) < doc_len:
        text += " ||| " + phrase(i + j, doc_len - _blen(text))
        j += 1
    return text


def do_match(i: int) -> bool:
    return i % 3 != 2


def escape_html(text: str) -> str:
    return text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def unescape_html(text: str) -> str:
    return text.replace("&gt;", ">").replace("&lt;", "<").replace("&amp;", "&")


_PRE = "<html><body><pre>"
_POST = "</pre></body></html>"


def wrap_html(text: str) -> bytes:
    return f"{_PRE}{escape_html(text)}{_POST}".encode("utf-8")


def extract_text_one(html: bytes) -> str:
    """Inverse of wrap_html; the per-row extraction invariant (input_hint)."""
    s = html.decode("utf-8")
    if not (s.startswith(_PRE) and s.endswith(_POST)):
        raise ValueError("not a webtext-wrapped html payload")
    return unescape_html(s[len(_PRE) : len(s) - len(_POST)])


def extract_text_series(htmls: pd.Series) -> pd.Series:
    """Vectorized extract_text for pandas UDF use; null-safe (None in ->
    None out, rows that are not webtext-wrapped html -> None)."""
    s = htmls.map(lambda b: b.decode("utf-8") if b is not None else None)
    ok = s.map(
        lambda t: t is not None and t.startswith(_PRE) and t.endswith(_POST)
    )
    body = s.where(ok).str.slice(len(_PRE), -len(_POST))
    return (
        body.str.replace("&gt;", ">", regex=False)
        .str.replace("&lt;", "<", regex=False)
        .str.replace("&amp;", "&", regex=False)
    )


def row(case_id: int, i: int, term: str, num_docs: int, doc_len: int) -> dict:
    text = doc_text(i, term, num_docs, doc_len)
    return {
        "url": f"doc://{case_id}/{i:04d}",
        "warc_ts": EPOCH + _dt.timedelta(seconds=i),
        "html": wrap_html(text),
        "text": text,
        "lang": "en",
        "case_id": str(case_id),
    }


def case_pandas(case_id: int, term: str, num_docs: int, doc_len: int) -> pd.DataFrame:
    return pd.DataFrame([row(case_id, i, term, num_docs, doc_len) for i in range(1, num_docs + 1)])


def all_cases_pandas(cases=CASES) -> pd.DataFrame:
    return pd.concat(
        [case_pandas(*c) for c in cases], ignore_index=True
    )


WEBTEXT_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string, case_id string"
)


def webtext_df(spark, cases=CASES, partitions: int | None = None):
    """Distributed generation: one spark.range per case, text built inside
    ``mapInPandas`` from pure arithmetic (nothing shipped from the driver but
    the case parameters). Scales to bench corpora of millions of docs."""
    from pyspark.sql import functions as F

    parts = []
    for case_id, term, num_docs, doc_len in cases:
        n_part = partitions or max(1, min(256, num_docs // 256 + 1))
        rng = spark.range(1, num_docs + 1, 1, n_part).withColumnRenamed("id", "i")

        def gen(batches: Iterator[pd.DataFrame], _c=case_id, _t=term, _n=num_docs, _l=doc_len):
            for pdf in batches:
                rows = [row(_c, int(i), _t, _n, _l) for i in pdf["i"]]
                yield pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang", "case_id"])

        parts.append(rng.mapInPandas(gen, schema=WEBTEXT_SCHEMA))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
