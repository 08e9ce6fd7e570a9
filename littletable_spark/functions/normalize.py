"""Word normalization for the full-text search index.

Capability parity with the reference's normalizer (littletable.py:1616-1699):
lowercasing, punctuation stripping, stopword removal, acronym collapsing
("I.B.M." -> "ibm"), hyphen/snake-case splitting, plural reduction
(regular rules + an irregular map), and significant-suffix extraction
(error/warning/exception). The logic below is an independent
implementation of those behaviors — scoring-relevant output categories
match the reference's, not its code.

This is a pure function so it can run (a) driver-side for query terms and
(b) inside an Arrow-batched pandas UDF for index builds.
"""

from __future__ import annotations

import re
from typing import Iterable, Iterator

# standard small-word stopword list (reference keeps a similar inline list,
# littletable.py:327-342)
STOPWORDS = frozenset(
    """a about above after again against all am an and any are as at be because
    been before being below between both but by could did do does doing down
    during each few for from further had has have having he her here hers
    herself him himself his how i if in into is it its itself just me more most
    my myself no nor not now of off on once only or other our ours ourselves
    out over own same she should so some such than that the their theirs them
    themselves then there these they this those through to too under until up
    very was we were what when where which while who whom why will with you
    your yours yourself yourselves""".split()
)

# irregular plural -> singular
IRREGULAR_PLURALS = {
    "children": "child",
    "feet": "foot",
    "geese": "goose",
    "men": "man",
    "mice": "mouse",
    "people": "person",
    "teeth": "tooth",
    "women": "woman",
    "leaves": "leaf",
    "lives": "life",
    "knives": "knife",
    "wives": "wife",
    "halves": "half",
    "selves": "self",
    "indices": "index",
    "matrices": "matrix",
    "vertices": "vertex",
    "analyses": "analysis",
    "crises": "crisis",
    "data": "datum",
    "criteria": "criterion",
    "phenomena": "phenomenon",
}

# tokens ending in these are indexed under the suffix as well, so a search
# for "error" finds "TimeoutError" (reference: littletable.py:375-379)
SIGNIFICANT_SUFFIXES = ("error", "warning", "exception")

_ACRONYM_RE = re.compile(r"^(?:[A-Za-z]\.){2,}[A-Za-z]?\.?$")
_SPLIT_RE = re.compile(r"[-_/]+")
_NONWORD_RE = re.compile(r"[^a-z0-9']+")


def _singularize(word: str) -> str:
    if word in IRREGULAR_PLURALS:
        return IRREGULAR_PLURALS[word]
    if len(word) > 3:
        if word.endswith("ies") and word[-4] not in "aeiou":
            return word[:-3] + "y"
        if word.endswith(("ches", "shes", "xes", "sses", "zes")):
            return word[:-2]
        if word.endswith("s") and not word.endswith(("ss", "us", "is")):
            return word[:-1]
    return word


def normalize_words(token: str) -> Iterator[str]:
    """Yield the index terms for one raw whitespace-delimited token."""
    token = token.strip()
    if not token:
        return
    if _ACRONYM_RE.match(token):
        yield token.replace(".", "").lower()
        return
    for part in _SPLIT_RE.split(token):
        word = _NONWORD_RE.sub("", part.lower()).strip("'")
        if not word or word in STOPWORDS:
            continue
        word = _singularize(word)
        if not word or word in STOPWORDS:
            continue
        yield word
        for suffix in SIGNIFICANT_SUFFIXES:
            if word.endswith(suffix) and word != suffix:
                yield suffix


def normalize_text(text: str) -> list[str]:
    """All index terms for a free-text value (deduplicated, order-stable)."""
    seen: set[str] = set()
    out: list[str] = []
    for token in (text or "").split():
        for word in normalize_words(token):
            if word not in seen:
                seen.add(word)
                out.append(word)
    return out


def normalize_query_term(term: str) -> list[str]:
    """Normalized variants of a single user query term."""
    return list(dict.fromkeys(normalize_words(term)))
