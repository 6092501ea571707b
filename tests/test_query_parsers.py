"""Pure-Python unit + property tests for the query-string parsers
(parse_boosts / parse_boolean / parse_fuzzy) — the Lucene grammar layer
in front of the engine.  No SparkSession needed.

Grammar (outermost-first, per Lucene classic syntax):
``[+|-]token[~d][^boost]`` — occurs prefix, then fuzzy/wildcard suffix,
then boost suffix.
"""

import pytest
from hypothesis import given
from hypothesis import strategies as st

from pysearch.query import parse_boolean, parse_boosts, parse_fuzzy

WORD = st.text(alphabet="abcdefghij", min_size=1, max_size=8)


def test_parse_boosts_basic():
    q, b = parse_boosts("spark^2 join fast^0.5")
    assert q == "spark join fast"
    assert b == {"spark": 2.0, "fast": 0.5}
    # repeated boosts on one token compose multiplicatively
    q, b = parse_boosts("x^2 x^3")
    assert q == "x x" and b == {"x": 6.0}
    with pytest.raises(ValueError, match="boost must be > 0"):
        parse_boosts("x^0")


@given(st.lists(WORD, min_size=1, max_size=6))
def test_parse_boosts_roundtrip_unboosted(tokens):
    """Queries without ^ suffixes pass through byte-identically."""
    q = " ".join(tokens)
    clean, boosts = parse_boosts(q)
    assert clean == q and boosts == {}


def test_parse_boolean_clauses():
    must, should, notc = parse_boolean("+a -b c +d^2 e^0.5 -f")
    assert must == ["a", "d^2"]
    assert should == ["c", "e^0.5"]
    assert notc == ["b", "f"]
    # a bare +/- is a SHOULD token, not an empty clause
    must, should, notc = parse_boolean("+ - x")
    assert must == [] and notc == [] and should == ["+", "-", "x"]
    with pytest.raises(ValueError, match="MUST_NOT"):
        parse_boolean("-b^2")


@given(st.lists(WORD, min_size=1, max_size=6))
def test_parse_boolean_partition(tokens):
    """Every token lands in exactly one clause list, order preserved
    within its clause."""
    q = " ".join(f"+{t}" if i % 3 == 0 else (f"-{t}" if i % 3 == 1 else t)
                 for i, t in enumerate(tokens))
    must, should, notc = parse_boolean(q)
    assert len(must) + len(should) + len(notc) == len(tokens)
    assert must == [t for i, t in enumerate(tokens) if i % 3 == 0]
    assert notc == [t for i, t in enumerate(tokens) if i % 3 == 1]
    assert should == [t for i, t in enumerate(tokens) if i % 3 == 2]


def test_parse_fuzzy_suffixes():
    clean, fuzz, prefixes, regexps = parse_fuzzy("relam~1 software spar* UP*")
    assert clean == "relam software"
    assert fuzz == {"relam": 1, "software": 0}
    assert prefixes == ["spar", "up"]  # lowercased, analyzer bypassed
    assert regexps == []
    # default distance applies to unsuffixed tokens only
    clean, fuzz, _, _ = parse_fuzzy("a~2 b", default_distance=1)
    assert fuzz == {"a": 2, "b": 1}
    # repeated token keeps the max distance
    _, fuzz, _, _ = parse_fuzzy("x~2 x")
    assert fuzz == {"x": 2}
    with pytest.raises(ValueError, match="fuzzy distance"):
        parse_fuzzy("x~3")
    # a bare * is a plain token (no empty prefix clause)
    clean, fuzz, prefixes, regexps = parse_fuzzy("* y")
    assert prefixes == [] and "*" in clean.split()


def test_parse_fuzzy_regexp_clauses():
    clean, fuzz, prefixes, regexps = parse_fuzzy("/s[cp]an?k?/ fast /JO.*/")
    assert clean == "fast" and fuzz == {"fast": 0} and prefixes == []
    assert regexps == ["s[cp]an?k?", "jo.*"]  # lowercased, slashes stripped
    # a lone / pair with empty body is a plain token, not a regexp clause
    clean, _, _, regexps = parse_fuzzy("// y")
    assert regexps == [] and "//" in clean.split()


def test_grammar_order_boost_outermost():
    """term~d^w and term*^w: parse_boosts strips the ^w first, leaving
    the ~d / * on the raw key (rekeyed downstream by search_ids_fuzzy)."""
    q, b = parse_boosts("relam~1^2 spar*^0.5 /sp.rk/^3")
    assert q == "relam~1 spar* /sp.rk/"
    assert b == {"relam~1": 2.0, "spar*": 0.5, "/sp.rk/": 3.0}
    clean, fuzz, prefixes, regexps = parse_fuzzy(q)
    assert clean == "relam" and fuzz == {"relam": 1} and prefixes == ["spar"]
    assert regexps == ["sp.rk"]


@given(st.lists(WORD, min_size=1, max_size=6),
       st.integers(min_value=0, max_value=2))
def test_parse_fuzzy_roundtrip_plain(tokens, d):
    """Suffix-free queries round-trip with every token at the default
    distance and no prefixes."""
    q = " ".join(tokens)
    clean, fuzz, prefixes, regexps = parse_fuzzy(q, default_distance=d)
    assert clean == q and prefixes == [] and regexps == []
    assert fuzz == {t: d for t in tokens}
