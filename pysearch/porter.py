"""Classic Porter (1980) stemmer, pure Python.

The reference's index analyzer is bleve v0.8.1's English chain, whose stemmer
is the classic Porter algorithm (reference: /root/reference/go.mod:5 pulls
bleve v0.8.1; the ``en`` analyzer is selected at
/root/reference/internal/doclib/bleve_glue.go:44-45,59).  This is an
independent implementation of the published algorithm
(M.F. Porter, "An algorithm for suffix stripping", Program 14(3) 1980),
not a translation of any Go code.

Only lowercase ASCII words are meaningfully stemmed; anything containing
non-alpha characters is returned unchanged except for the plain suffix rules
that still apply (matching the tolerant behavior of rune-based stemmers).
"""

from __future__ import annotations

from functools import lru_cache

_VOWELS = "aeiou"


def _is_cons(word: str, i: int) -> bool:
    ch = word[i]
    if ch in _VOWELS:
        return False
    if ch == "y":
        return True if i == 0 else not _is_cons(word, i - 1)
    return True


def _measure(word: str, end: int) -> int:
    """Number of VC sequences in word[:end+1]."""
    n = 0
    i = 0
    # skip initial consonants
    while True:
        if i > end:
            return n
        if not _is_cons(word, i):
            break
        i += 1
    while True:
        # in vowel run
        while True:
            if i > end:
                return n
            if _is_cons(word, i):
                break
            i += 1
        n += 1
        # in consonant run
        while True:
            if i > end:
                return n
            if not _is_cons(word, i):
                break
            i += 1


def _has_vowel(word: str, end: int) -> bool:
    return any(not _is_cons(word, i) for i in range(end + 1))


def _ends_double_cons(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_cons(word, len(word) - 1)
    )


def _cvc(word: str) -> bool:
    """stem ends cvc where the final c is not w, x or y."""
    if len(word) < 3:
        return False
    i = len(word) - 1
    if not _is_cons(word, i) or _is_cons(word, i - 1) or not _is_cons(word, i - 2):
        return False
    return word[-1] not in "wxy"


def _step1a(w: str) -> str:
    if w.endswith("sses"):
        return w[:-2]
    if w.endswith("ies"):
        return w[:-2]
    if w.endswith("ss"):
        return w
    if w.endswith("s"):
        return w[:-1]
    return w


def _step1b(w: str) -> str:
    if w.endswith("eed"):
        stem = w[:-3]
        if _measure(w, len(stem) - 1) > 0:
            return w[:-1]
        return w
    flag = False
    if w.endswith("ed") and _has_vowel(w, len(w) - 3):
        w = w[:-2]
        flag = True
    elif w.endswith("ing") and _has_vowel(w, len(w) - 4):
        w = w[:-3]
        flag = True
    if flag:
        if w.endswith(("at", "bl", "iz")):
            return w + "e"
        if _ends_double_cons(w) and w[-1] not in "lsz":
            return w[:-1]
        if _measure(w, len(w) - 1) == 1 and _cvc(w):
            return w + "e"
    return w


def _step1c(w: str) -> str:
    if w.endswith("y") and _has_vowel(w, len(w) - 2):
        return w[:-1] + "i"
    return w


_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
]

_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]

_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def _apply_list(w: str, rules, m_min: int) -> str:
    for suffix, repl in rules:
        if w.endswith(suffix):
            stem = w[: len(w) - len(suffix)]
            if _measure(w, len(stem) - 1) > m_min:
                return stem + repl
            return w
    return w


def _step4(w: str) -> str:
    for suffix in _STEP4:
        if w.endswith(suffix):
            stem = w[: len(w) - len(suffix)]
            if suffix == "ion" and (not stem or stem[-1] not in "st"):
                return w
            if _measure(w, len(stem) - 1) > 1:
                return stem
            return w
    return w


def _step5a(w: str) -> str:
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(w, len(stem) - 1)
        if m > 1 or (m == 1 and not _cvc(stem)):
            return stem
    return w


def _step5b(w: str) -> str:
    if w.endswith("ll") and _measure(w, len(w) - 1) > 1:
        return w[:-1]
    return w


@lru_cache(maxsize=1 << 18)
def stem(word: str) -> str:
    """Porter-stem a (lowercased) token. Tokens of length <= 2 are unchanged."""
    if len(word) <= 2:
        return word
    w = _step1a(word)
    w = _step1b(w)
    w = _step1c(w)
    w = _apply_list(w, _STEP2, 0)
    w = _apply_list(w, _STEP3, 0)
    w = _step4(w)
    w = _step5a(w)
    w = _step5b(w)
    return w
