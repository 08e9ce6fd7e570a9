"""Word normalization for the full-text search index.

Behavioral parity with the reference's normalizer: the stopword list
(littletable.py:327-342, including contractions and the bare
contraction-suffix tokens), the irregular-plural map and the
singulars-that-look-like-plurals list (littletable.py:345-373), the
significant word endings (littletable.py:375-379), and the
``_normalize_word_gen`` pipeline semantics (littletable.py:1633-1693):

- a raw token that is a stopword (before or after punctuation
  stripping) produces no terms;
- a purely alphabetic token yields its singular (irregular map first,
  then pattern rules) when that differs, then the word itself, then a
  significant suffix (error/warning/exception) when present;
- non-alphabetic composites yield their ``.``/``-`` separated parts of
  length > 1, the dot-collapsed acronym when every dot-part is a single
  character (``i.b.m.`` -> ``ibm``), and the token itself.

The word tables are the public English word lists the reference uses;
the code is an independent re-expression of the documented pipeline.

This is a pure module so it can run (a) driver-side for query terms and
(b) inside an Arrow-batched pandas UDF for index builds.
"""

from __future__ import annotations

import re
from functools import lru_cache
from typing import Iterator

# default stopwords (littletable.py:327-342): common English stopwords,
# their contractions, the bare contraction suffixes, and the empty string
# (so fully-stripped tokens fall out naturally)
STOPWORDS = frozenset(
    (
        *"""a about above after again against all am an and any are aren't as at be because been
        before being below between both but by can't cannot could couldn't did didn't do does
        doesn't doing don't down during each few for from further had hadn't has hasn't have haven't
        having he he'd he'll he's her here here's hers herself him himself his how how's i i'd i'll
        i'm i've if in into is isn't it it's its itself let's me more most mustn't my myself no nor
        not of off on once only or other ought our ours ourselves out over own same shan't she she'd
        she'll she's should shouldn't so some such than that that's the their theirs them themselves
        then there there's these they they'd they'll they're they've this those through to too under
        until up very was wasn't we we'd we'll we're we've were weren't what what's when when's
        where where's which while who who's whom why why's with won't would wouldn't you
        you'd you'll you're you've your yours yourself yourselves""".split(),
        *"d ll m re s t ve".split(),
        "",
    )
)

# irregular plural -> singular (littletable.py:345-361)
IRREGULAR_PLURALS = {
    "addenda": "addendum", "addendums": "addendum", "alumnae": "alumna",
    "alumni": "alumnus", "analyses": "analysis", "antennae": "antenna",
    "antennas": "antenna", "antitheses": "antithesis",
    "appendices": "appendix", "appendixes": "appendix",
    "bacilli": "bacillus", "bacteria": "bacterium", "cacti": "cactus",
    "calves": "calf", "children": "child", "corpora": "corpus",
    "crises": "crisis", "criteria": "criterion", "curricula": "curriculum",
    "diagnoses": "diagnosis", "dice": "die", "dwarves": "dwarf",
    "dwarfs": "dwarf", "elves": "elf", "ellipses": "ellipsis",
    "errata": "erratum", "firemen": "fireman", "foci": "focus",
    "feet": "foot", "formulae": "formula", "fungi": "fungus",
    "genera": "genus", "geese": "goose", "halves": "half",
    "hooves": "hoof", "hypotheses": "hypothesis", "indices": "index",
    "indexes": "index", "knives": "knife", "larvae": "larva",
    "leaves": "leaf", "lives": "life", "loaves": "loaf", "loci": "locus",
    "lice": "louse", "men": "man", "matrices": "matrix", "media": "medium",
    "memoranda": "memorandum", "minutiae": "minutia", "mice": "mouse",
    "nebulae": "nebula", "nuclei": "nucleus", "oases": "oasis",
    "opera": "opus", "ova": "ovum", "oxen": "ox",
    "parentheses": "parenthesis", "phenomena": "phenomenon",
    "phyla": "phylum", "quizzes": "quiz", "radii": "radius",
    "referenda": "referendum", "scarves": "scarf", "selves": "self",
    "shelves": "shelf", "staves": "staff", "stimuli": "stimulus",
    "strata": "stratum", "syllabi": "syllabus", "symposia": "symposium",
    "synopses": "synopsis", "tableaux": "tableau", "theses": "thesis",
    "thieves": "thief", "teeth": "tooth", "vertebrae": "vertebra",
    "vertices": "vertex", "vitae": "vita", "vortices": "vortex",
    "wharves": "wharf", "wives": "wife", "wolves": "wolf",
    "women": "woman",
}

# words ending in s that are already singular (littletable.py:362-366)
SINGULARS_THAT_LOOK_LIKE_PLURALS = [
    "rabies", "scabies", "caries", "aries", "series", "billiards",
    "grits", "pliers", "whereabouts", "jeans", "binoculars", "scissors",
    "tidings", "trousers", "clothes", "news", "measles", "mumps",
    "calculus", "molasses", "tweezers", "dominoes", "pants", "odds",
    "riches", "alms", "barracks", "chassis", "corps", "headquarters",
    "ides", "kudos", "species",
]

PLURALS_MAP = {
    **IRREGULAR_PLURALS,
    **{s: s for s in SINGULARS_THAT_LOOK_LIKE_PLURALS},
}

# tokens ending in these are indexed under the suffix as well, so a search
# for "error" finds "TimeoutError" (littletable.py:375-379)
SIGNIFICANT_SUFFIXES = ("error", "warning", "exception")

# strip a single leading non-word char, keep word chars plus ._- , drop
# trailing junk (littletable.py:1597)
_STRIP_RE = re.compile(r"[^\w_]?([\w._-]*)[^\w.]*")

SIGNIFICANT_ENDING_RE = re.compile(
    rf"[a-z]{{2,}}({'|'.join(SIGNIFICANT_SUFFIXES)})$"
)

# plural pattern rules, first substitution that applies wins
# (littletable.py:1602-1614)
_PLURAL_SUBS: tuple[tuple[re.Pattern, str], ...] = (
    (re.compile(r"(.*[^aeiouy])ies$"), r"\1y"),
    (re.compile(r"(.*(?:ch|ss|sh|x))es$"), r"\1"),
    (re.compile(r"(.*(?:[bcdfghklmnprstuvwxz]|(qu))e)s$"), r"\1"),
    (re.compile(r"(.*(?:ness|ics))$"), r"\1"),
    (re.compile(r"(.*[^aeious])s$"), r"\1"),
)

_PUNCT_RSTRIP = ",.!?;:'\"-"


def singularize(word: str) -> str:
    """Singular form of an alphabetic word per the reference's table-then-
    rules order; returns the word unchanged when no rule applies."""
    mapped = PLURALS_MAP.get(word)
    if mapped:
        return mapped
    for rex, repl in _PLURAL_SUBS:
        new, n = rex.subn(repl, word)
        if n:
            return new
    return word


def normalize_words(
    token: str, stopwords: frozenset[str] = STOPWORDS
) -> Iterator[str]:
    """Yield the index terms for one raw whitespace-delimited token
    (littletable.py:1633-1693 semantics)."""
    s = token.lower()
    if s in stopwords:
        return
    m = _STRIP_RE.match(s)
    s = m.group(1) if m else ""
    if s in stopwords:
        return
    sa = s.rstrip(_PUNCT_RSTRIP)
    if sa.isalpha():
        s = sa
        if s in stopwords:
            return
        sing = singularize(s)
        if sing and sing != s:
            yield sing
        yield s
        if s.endswith(SIGNIFICANT_SUFFIXES) and (
            em := SIGNIFICANT_ENDING_RE.match(s)
        ):
            yield em[1]
        return
    # non-alphabetic composites: dotted and hyphenated tokens yield their
    # long parts; all-single-char dot sequences collapse to an acronym
    for sep in ".-":
        if sep in s:
            for ss in s.split(sep):
                if len(ss) > 1:
                    yield ss
            if sep == "." and all(len(ss) <= 1 for ss in s.split(".")):
                yield s.replace(".", "")
    yield s


@lru_cache(maxsize=1 << 20)
def _normalize_token_cached(
    token: str, stopwords: frozenset[str]
) -> tuple[str, ...]:
    """Memoized per-token normalization: a corpus repeats its vocabulary
    thousands of times, so caching per distinct token turns the regex
    pipeline from per-occurrence into per-vocabulary-entry work (the
    index-build hot path inside the Arrow UDF)."""
    return tuple(normalize_words(token, stopwords))


def normalize_text(
    text: str, stopwords: frozenset[str] = STOPWORDS
) -> list[str]:
    """All index terms for a free-text value (deduplicated, order-stable)."""
    seen: set[str] = set()
    out: list[str] = []
    for token in (text or "").split():
        for word in _normalize_token_cached(token, stopwords):
            if word not in seen:
                seen.add(word)
                out.append(word)
    return out


def normalize_query_term(
    term: str, stopwords: frozenset[str] = STOPWORDS
) -> list[str]:
    """Normalized variants of a single user query term (each variant is
    a separate scoring keyword, littletable.py:1813-1846)."""
    return list(dict.fromkeys(normalize_words(term, stopwords)))
