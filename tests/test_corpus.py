"""doMatch corpus generator fidelity (FIXTURES.md §2) + extraction invariant."""

import datetime as dt

from pysearch import corpus


def test_word_list():
    assert len(corpus.ALL_WORDS) > 500
    assert "*" not in corpus.ALL_WORDS
    assert "" not in corpus.ALL_WORDS


def test_phrase_arithmetic():
    # phrase(i0, n) starts at (i0+17)*47 mod len(allWords)
    n = len(corpus.ALL_WORDS)
    i0 = (3 + 17) * 47
    expected = " ".join(corpus.ALL_WORDS[i % n] for i in range(i0, i0 + 4))
    assert corpus.phrase(3, 4) == expected


def test_doc_text_match_rule():
    term = "a cornucopia of"
    for i in range(1, 20):
        t = corpus.doc_text(i, term, 20, 100)
        assert (f" {term} " in t) == (i % 3 != 2), i
        assert t.startswith(f"Phrase {i}: ")
        assert len(t.encode("utf-8")) >= 100


def test_doc_len_padding_bytes():
    t = corpus.doc_text(1, "x y z", 5, 2000)
    assert len(t.encode("utf-8")) >= 2000
    assert " ||| " in t


def test_html_roundtrip_invariant():
    # Per-row invariant (BASELINE.json input_hint): extract_text(html) == text
    for i in (1, 2, 3, 50):
        t = corpus.doc_text(i, "be the person who", 50, 1000)
        assert corpus.extract_text_one(corpus.wrap_html(t)) == t
    tricky = 'a < b & b > c && <pre>"nested&amp;"</pre>'
    assert corpus.extract_text_one(corpus.wrap_html(tricky)) == tricky


def test_case_pandas_schema():
    pdf = corpus.case_pandas(1, "be the person who", 5, 100)
    assert list(pdf.columns) == ["url", "warc_ts", "html", "text", "lang", "case_id"]
    assert pdf["url"].tolist() == [f"doc://1/{i:04d}" for i in range(1, 6)]
    assert pdf["warc_ts"][0] == dt.datetime(2019, 7, 30, 0, 0, 1, tzinfo=dt.timezone.utc)
    assert (pdf["lang"] == "en").all()
    import pandas as pd
    ext = corpus.extract_text_series(pd.Series(list(pdf["html"])))
    assert (ext.values == pdf["text"].values).all()


def test_webtext_df_distributed_equals_pandas(spark):
    cases = [(1, "be the person who", 5, 100), (6, "in the realm of", 20, 200)]
    sdf = corpus.webtext_df(spark, cases=cases)
    got = sdf.orderBy("case_id", "url").toPandas()
    import pandas as pd

    want = pd.concat([corpus.case_pandas(*c) for c in cases], ignore_index=True)
    want = want.sort_values(["case_id", "url"]).reset_index(drop=True)
    assert got["url"].tolist() == want["url"].tolist()
    assert got["text"].tolist() == want["text"].tolist()
    assert [bytes(b) for b in got["html"]] == [bytes(b) for b in want["html"]]
