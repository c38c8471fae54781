"""Analyzer stack: tokenizer + per-language analysis.

Re-expresses the reference's analyzer behavior in pure Python so it can run
inside Arrow-batched pandas UDFs:

- Tokenization mirrors Lucene's StandardTokenizer at the granularity miru
  uses it (reference: miru-plugin/.../query/TermTokenizer.java:34-54 --
  tokenStream + StandardFilter, collect non-blank terms): split on
  non-alphanumeric boundaries, lowercase.
- Per-locale analyzers (reference: miru-plugin/.../query/TermAnalyzers.java:43-136)
  are scoped to `en` (English stopwords + Porter2 stemming, mirroring
  Lucene's EnglishAnalyzer with the custom stopword set in
  EnStopwords.java:998-1004) with everything else falling back to Standard
  behavior (lowercase tokens, no stop/stem) exactly like
  TermAnalyzers.findAnalyzer's StandardAnalyzer fallback
  (TermAnalyzers.java:117-136). Locale resolution strips `_` suffixes.

This module is shared by the Spark pipeline AND the pure-Python oracle, so
both sides tokenize identically by construction; golden fixtures in
tests/test_analyzer.py freeze the behavior.
"""

from __future__ import annotations

import re
from functools import lru_cache

# Lucene's classic 33-word English stopword list (StandardAnalyzer /
# EnglishAnalyzer default; the reference wires a custom EnStopwords set for
# its wiki ingest -- we use the classic list and freeze it in fixtures).
ENGLISH_STOPWORDS = frozenset(
    """a an and are as at be but by for if in into is it no not of on or
    such that the their then there these they this to was will with""".split()
)

_TOKEN_RE = re.compile(r"[0-9A-Za-z_À-ɏЀ-ӿ]+")

_VOWELS = frozenset("aeiouy")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_ENDING = frozenset("cdeghkmnrt")

# ---------------------------------------------------------------------------
# Porter2 (Snowball English) stemmer -- public algorithm, implemented from
# the published specification (snowballstem.org/algorithms/english/stemmer).
# ---------------------------------------------------------------------------

_EXCEPTIONS1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    # invariant forms
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
_EXCEPTIONS2 = frozenset(
    ["inning", "outing", "canning", "herring", "earring", "proceed",
     "exceed", "succeed"]
)

_STEP2_SUFFIXES = [
    ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
    ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
    ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
    ("ation", "ate"), ("alism", "al"), ("aliti", "al"), ("ousli", "ous"),
    ("iviti", "ive"), ("fulli", "ful"), ("enci", "ence"), ("anci", "ance"),
    ("abli", "able"), ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
    ("bli", "ble"),
]

_STEP3_SUFFIXES = [
    ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
    ("icate", "ic"), ("iciti", "ic"), ("ical", "ic"), ("ful", ""),
    ("ness", ""),
]

_STEP4_SUFFIXES = [
    "ement", "ance", "ence", "able", "ible", "ment", "ant", "ent", "ism",
    "ate", "iti", "ous", "ive", "ize", "al", "er", "ic",
]


def _is_vowel(word: str, i: int) -> bool:
    return word[i] in _VOWELS


def _regions(word: str) -> tuple[int, int]:
    """Return (r1, r2) start offsets per the Porter2 definition."""
    n = len(word)
    r1 = n
    for prefix in ("gener", "commun", "arsen"):
        if word.startswith(prefix):
            r1 = len(prefix)
            break
    else:
        for i in range(1, n):
            if not _is_vowel(word, i) and _is_vowel(word, i - 1):
                r1 = i + 1
                break
    r2 = n
    for i in range(r1 + 1, n):
        if not _is_vowel(word, i) and _is_vowel(word, i - 1):
            r2 = i + 1
            break
    return r1, r2


def _ends_short_syllable(word: str) -> bool:
    n = len(word)
    if n == 2:
        return _is_vowel(word, 0) and not _is_vowel(word, 1)
    if n >= 3:
        c = word[-1]
        if (
            not _is_vowel(word, n - 1)
            and c not in "wxY"
            and _is_vowel(word, n - 2)
            and not _is_vowel(word, n - 3)
        ):
            return True
    return False


def _contains_vowel(word: str, start: int, end: int) -> bool:
    return any(word[i] in _VOWELS for i in range(start, end))


def _porter2_stem_uncached(word: str) -> str:
    """Porter2 / Snowball English stemmer. Input must be lowercase."""
    if len(word) <= 2:
        return word
    if word in _EXCEPTIONS1:
        return _EXCEPTIONS1[word]

    word = word.lstrip("'")
    if len(word) <= 2:
        return word
    # mark consonant-y as Y
    if word[0] == "y":
        word = "Y" + word[1:]
    chars = list(word)
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _VOWELS:
            chars[i] = "Y"
    word = "".join(chars)

    r1, r2 = _regions(word)

    # Step 0: strip apostrophe suffixes
    for suf in ("'s'", "'s", "'"):
        if word.endswith(suf):
            word = word[: -len(suf)]
            break

    # Step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith(("ied", "ies")):
        word = word[:-2] if len(word) > 4 else word[:-1]
    elif word.endswith(("us", "ss")):
        pass
    elif word.endswith("s"):
        if _contains_vowel(word, 0, len(word) - 2):
            word = word[:-1]

    if word in _EXCEPTIONS2:
        return word.replace("Y", "y")

    # Step 1b
    did_delete = False
    if word.endswith("eedly"):
        if len(word) - 5 >= r1:
            word = word[:-3]
    elif word.endswith("eed"):
        if len(word) - 3 >= r1:
            word = word[:-1]
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if word.endswith(suf):
                stem = word[: -len(suf)]
                if _contains_vowel(stem, 0, len(stem)):
                    word = stem
                    did_delete = True
                break
    if did_delete:
        if word.endswith(("at", "bl", "iz")):
            word += "e"
        elif word.endswith(_DOUBLES):
            word = word[:-1]
        elif r1 >= len(word) and _ends_short_syllable(word):
            word += "e"

    # Step 1c
    if (
        len(word) > 2
        and word[-1] in "yY"
        and word[-2] not in _VOWELS
    ):
        word = word[:-1] + "i"

    # Step 2 (in R1)
    for suf, repl in _STEP2_SUFFIXES:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                word = word[: -len(suf)] + repl
            break
    else:
        if word.endswith("ogi"):
            if len(word) - 3 >= r1 and len(word) >= 4 and word[-4] == "l":
                word = word[:-1]
        elif word.endswith("li"):
            if len(word) - 2 >= r1 and word[-3] in _LI_ENDING:
                word = word[:-2]

    # Step 3 (in R1)
    for suf, repl in _STEP3_SUFFIXES:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                word = word[: -len(suf)] + repl
            break
    else:
        if word.endswith("ative") and len(word) - 5 >= r2:
            word = word[:-5]

    # Step 4 (in R2)
    for suf in _STEP4_SUFFIXES:
        if word.endswith(suf):
            if len(word) - len(suf) >= r2:
                word = word[: -len(suf)]
            break
    else:
        if word.endswith("ion"):
            if len(word) - 3 >= r2 and len(word) >= 4 and word[-4] in "st":
                word = word[:-3]

    # Step 5
    if word.endswith("e"):
        if len(word) - 1 >= r2:
            word = word[:-1]
        elif len(word) - 1 >= r1 and not _ends_short_syllable(word[:-1]):
            word = word[:-1]
    elif word.endswith("ll") and len(word) - 1 >= r2:
        word = word[:-1]

    return word.replace("Y", "y")


# Natural-language term distributions are Zipfian, so a bounded memo on the
# stemmer turns the hot tokenize path from O(tokens) stem runs into
# O(distinct terms) -- ~10-20x on web text.
porter2_stem = lru_cache(maxsize=1 << 18)(_porter2_stem_uncached)


# ---------------------------------------------------------------------------
# Tokenization / analysis
# ---------------------------------------------------------------------------

def standard_tokenize(text: str) -> list[str]:
    """StandardAnalyzer-style: lowercase + alphanumeric token split.

    Mirrors TermTokenizer.tokenize (TermTokenizer.java:34-54): tokenize,
    drop blanks. Lowercasing is part of every Lucene analyzer miru wires.
    """
    if not text:
        return []
    return _TOKEN_RE.findall(text.lower())


def analyze(text: str, locale: str | None = None) -> list[str]:
    """Analyze text with the locale's analyzer.

    `en` (and `en_*` -- locale suffix stripping per TermAnalyzers.java:117-131)
    gets English stopword removal + Porter2 stemming; everything else gets
    Standard behavior (documented scope reduction from the reference's 30+
    Lucene language analyzers).
    """
    tokens = standard_tokenize(text)
    base = (locale or "").lower()
    while base and base not in ("en",):
        if "_" in base:
            base = base.rsplit("_", 1)[0]
        else:
            break
    if base == "en":
        return [porter2_stem(t) for t in tokens if t not in ENGLISH_STOPWORDS]
    return tokens


@lru_cache(maxsize=8)
def analyzer_for(locale: str | None):
    """Return a callable text -> tokens for the locale (cached)."""
    def _fn(text: str, _loc=locale):
        return analyze(text, _loc)
    return _fn


def analyze_query_term(term: str, locale: str | None = None) -> str | None:
    """Analyze a single query term; None if it is removed (stopword)."""
    out = analyze(term, locale)
    return out[0] if out else None
