"""Exact-substring duplicate spans and boilerplate line dedup,
cross-checked against pure-Python reference models on small corpora.

Net-new operators (no littletable analog): Lee-et-al-style exact
substring dedup and CCNet/RefinedWeb-style line dedup — the exact-match
complements to the approximate MinHash/SimHash family.
"""

import random

import pytest

from littletable_spark import Table
from littletable_spark.operators.dedup import (
    duplicate_spans,
    line_dedup,
    remove_duplicate_spans,
)


def _toks(s):
    return [w for w in (s or "").strip().split() if w]


def _model_spans(docs, k, min_docs=2):
    """Pure-Python duplicate_spans: positioned k-grams, cross-doc dup
    grams, merged (overlap or adjacency) spans."""
    grams = {}  # gram -> set of doc ids
    pos = {}  # doc -> [p...] (1-based)
    for i, s in docs:
        t = _toks(s)
        for p in range(1, len(t) - k + 2):
            g = " ".join(t[p - 1 : p - 1 + k])
            grams.setdefault(g, set()).add(i)
            pos.setdefault(i, []).append((p, g))
    dup = {g for g, ids in grams.items() if len(ids) >= min_docs}
    out = []
    for i, plist in pos.items():
        marked = sorted(p for p, g in plist if g in dup)
        if not marked:
            continue
        start = prev = marked[0]
        for p in marked[1:]:
            if p > prev + k:  # gap: prev span ends prev+k-1, p starts later than prev+k
                out.append((i, start, prev + k - 1, prev + k - start))
                start = p
            prev = p
        out.append((i, start, prev + k - 1, prev + k - start))
    return sorted(out)


def _model_remove(docs, k, min_docs=2):
    spans = {}
    for i, a, b, _n in _model_spans(docs, k, min_docs):
        spans.setdefault(i, []).append((a, b))
    out = []
    for i, s in docs:
        t = _toks(s)
        kept = [
            w
            for p, w in enumerate(t, start=1)
            if not any(a <= p <= b for a, b in spans.get(i, []))
        ]
        out.append((i, " ".join(kept)))
    return sorted(out)


def _model_line_dedup(docs, min_docs=2, sep="\n"):
    freq = {}
    for i, s in docs:
        for ln in set((s or "").split(sep)):
            freq.setdefault(ln, set()).add(i)
    bad = {ln for ln, ids in freq.items() if len(ids) >= min_docs}
    out = []
    for i, s in docs:
        kept = [ln for ln in (s or "").split(sep) if ln not in bad]
        if kept:
            out.append((i, sep.join(kept), len(kept)))
    return sorted(out)


def _mk(spark, docs):
    t = Table("docs", spark=spark)
    t.insert_many([{"doc_id": i, "text": s} for i, s in docs])
    return t


CORPUS = [
    (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (1, "prefix words alpha beta gamma delta epsilon zeta other tail stuff"),
    (2, "alpha beta gamma delta epsilon unrelated middle zeta eta theta iota kappa"),
    (3, "totally disjoint sentence with its own private vocabulary here"),
    (4, "totally disjoint sentence with its own private vocabulary here"),
]


def test_duplicate_spans_matches_model(spark):
    got = sorted(
        tuple(r)
        for r in duplicate_spans(_mk(spark, CORPUS), "text", "doc_id", k=4)
        .df.collect()
    )
    assert got == _model_spans(CORPUS, k=4)
    assert got  # non-trivial on this corpus


def test_adjacent_hits_merge_into_one_span(spark):
    # doc 0 and 1 share tokens a..h: every 4-gram in that run is marked,
    # consecutive positions merge into ONE maximal span, not 5 spans
    docs = [
        (0, "a b c d e f g h x y z"),
        (1, "q r a b c d e f g h s"),
    ]
    got = sorted(
        tuple(r)
        for r in duplicate_spans(_mk(spark, docs), "text", "doc_id", k=4).df.collect()
    )
    assert got == [(0, 1, 8, 8), (1, 3, 10, 8)]


def test_intra_doc_repeats_do_not_mark(spark):
    docs = [
        (0, "x y z w x y z w x y z w"),  # repeats only within itself
        (1, "completely different tokens here nothing shared at all"),
    ]
    assert duplicate_spans(_mk(spark, docs), "text", "doc_id", k=4).df.count() == 0


def test_min_docs_three(spark):
    docs = [
        (0, "common run one two three four tail0"),
        (1, "common run one two three four tail1"),
        (2, "common run one two three four tail2"),
        (3, "pair only five six seven eight tail3"),
        (4, "pair only five six seven eight tail4"),
    ]
    got = sorted(
        tuple(r)
        for r in duplicate_spans(_mk(spark, docs), "text", "doc_id", k=4, min_docs=3)
        .df.collect()
    )
    assert got == _model_spans(docs, k=4, min_docs=3)
    assert {r[0] for r in got} == {0, 1, 2}  # the pair-only dup is below min_docs


def test_docs_shorter_than_k_emit_nothing(spark):
    docs = [(0, "a b c"), (1, "a b c"), (2, "")]
    assert duplicate_spans(_mk(spark, docs), "text", "doc_id", k=4).df.count() == 0


def test_hash_keys_off_matches_on(spark):
    t = _mk(spark, CORPUS)
    on = sorted(
        tuple(r) for r in duplicate_spans(t, "text", "doc_id", k=4).df.collect()
    )
    off = sorted(
        tuple(r)
        for r in duplicate_spans(t, "text", "doc_id", k=4, hash_keys=False)
        .df.collect()
    )
    assert on == off


def test_remove_duplicate_spans_matches_model(spark):
    got = sorted(
        tuple(r)
        for r in remove_duplicate_spans(_mk(spark, CORPUS), "text", "doc_id", k=4)
        .df.collect()
    )
    assert got == _model_remove(CORPUS, k=4)
    # exact-dup docs 3/4 are fully cut; untouched docs keep all tokens
    d = dict(got)
    assert d[3] == "" and d[4] == ""


def test_remove_null_text_becomes_empty(spark):
    docs = [(0, None), (1, "a b c d e f"), (2, "a b c d e f")]
    got = dict(
        (r[0], r[1])
        for r in remove_duplicate_spans(_mk(spark, docs), "text", "doc_id", k=4)
        .df.collect()
    )
    assert got[0] == "" and got[1] == "" and got[2] == ""


def test_randomized_spans_match_model(spark):
    rng = random.Random(6)
    vocab = [f"w{i}" for i in range(12)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 40))))
        for i in range(30)
    ]
    t = _mk(spark, docs)
    for k, md in ((3, 2), (4, 3)):
        got = sorted(
            tuple(r)
            for r in duplicate_spans(t, "text", "doc_id", k=k, min_docs=md)
            .df.collect()
        )
        assert got == _model_spans(docs, k=k, min_docs=md)


LINED = [
    (0, "keep me zero\nCOOKIE BANNER\nunique tail zero"),
    (1, "keep me one\nCOOKIE BANNER\nNAV BAR\nunique tail one"),
    (2, "NAV BAR\nkeep me two"),
    (3, "COOKIE BANNER\nNAV BAR"),  # all boilerplate -> drops out
]


def test_line_dedup_matches_model(spark):
    got = sorted(
        tuple(r)
        for r in line_dedup(_mk(spark, LINED), "text", "doc_id").df.collect()
    )
    assert got == _model_line_dedup(LINED)
    assert {r[0] for r in got} == {0, 1, 2}  # doc 3 dropped entirely


def test_line_dedup_preserves_order_and_counts(spark):
    got = dict(
        (r["doc_id"], (r["text"], r["n_lines_kept"]))
        for r in line_dedup(_mk(spark, LINED), "text", "doc_id").df.collect()
    )
    assert got[1] == ("keep me one\nunique tail one", 2)


def test_line_dedup_min_docs_three(spark):
    # COOKIE BANNER is in 3 docs -> removed; NAV BAR in 3 docs -> removed;
    # bump min_docs to 4 and both survive
    got = sorted(
        tuple(r)
        for r in line_dedup(_mk(spark, LINED), "text", "doc_id", min_docs=4)
        .df.collect()
    )
    assert got == _model_line_dedup(LINED, min_docs=4)
    assert {r[0] for r in got} == {0, 1, 2, 3}


def test_line_dedup_custom_sep(spark):
    docs = [(0, "a|SHARED|b"), (1, "c|SHARED|d")]
    got = dict(
        (r["doc_id"], r["text"])
        for r in line_dedup(
            _mk(spark, docs), "text", "doc_id", sep=r"\|", join_sep="|"
        ).df.collect()
    )
    assert got == {0: "a|b", 1: "c|d"}


def _model_spans_against(new_docs, corpus_docs, k, min_docs=1):
    grams = {}
    for i, s in corpus_docs:
        t = _toks(s)
        for p in range(1, len(t) - k + 2):
            grams.setdefault(" ".join(t[p - 1 : p - 1 + k]), set()).add(i)
    dup = {g for g, ids in grams.items() if len(ids) >= min_docs}
    out = []
    for i, s in new_docs:
        t = _toks(s)
        marked = sorted(
            p
            for p in range(1, len(t) - k + 2)
            if " ".join(t[p - 1 : p - 1 + k]) in dup
        )
        if not marked:
            continue
        start = prev = marked[0]
        for p in marked[1:]:
            if p > prev + k:
                out.append((i, start, prev + k - 1, prev + k - start))
                start = p
            prev = p
        out.append((i, start, prev + k - 1, prev + k - start))
    return sorted(out)


def test_duplicate_spans_incremental_against_corpus(spark):
    """against= marks new-batch spans whose grams exist in the corpus;
    corpus-internal duplication is irrelevant at min_docs=1 and
    required at min_docs=2."""
    corpus_docs = [
        (0, "alpha beta gamma delta epsilon zeta eta theta"),
        (1, "one two three four five six seven"),
        (2, "one two three four five eight nine"),
    ]
    new_docs = [
        (100, "x alpha beta gamma delta y one two three four z"),
        (101, "nothing shared with anyone at all here"),
    ]
    corpus = _mk(spark, corpus_docs)
    new = Table("newdocs", spark=spark)
    new.insert_many([{"doc_id": i, "text": s} for i, s in new_docs])
    for md in (1, 2):
        got = sorted(
            tuple(r)
            for r in duplicate_spans(
                new, "text", "doc_id", k=4, min_docs=md, against=corpus
            ).df.collect()
        )
        assert got == _model_spans_against(new_docs, corpus_docs, k=4, min_docs=md), md
    # md=1 marks both shared runs; md=2 keeps only the run shared by
    # corpus docs 1 AND 2
    got1 = _model_spans_against(new_docs, corpus_docs, 4, 1)
    got2 = _model_spans_against(new_docs, corpus_docs, 4, 2)
    assert len(got1) == 2 and len(got2) == 1
    assert not any(i == 101 for i, *_ in got1)


def test_remove_spans_incremental(spark):
    """against= on the remove path: only new-batch text is rewritten,
    cutting exactly the corpus-occurring runs."""
    corpus = _mk(spark, [(0, "one two three four five six")])
    new = Table("newdocs2", spark=spark)
    new.insert_many(
        [{"doc_id": 100, "text": "x one two three four y"},
         {"doc_id": 101, "text": "untouched novel words entirely here"}]
    )
    got = dict(
        (r["doc_id"], r["text"])
        for r in remove_duplicate_spans(
            new, "text", "doc_id", k=4, min_docs=1, against=corpus
        ).df.collect()
    )
    assert got == {100: "x y", 101: "untouched novel words entirely here"}


def test_line_dedup_incremental(spark):
    """against=: boilerplate learned from the corpus, applied to the
    new batch only; min_docs counts corpus docs."""
    corpus = _mk(spark, LINED)
    new = Table("newlined", spark=spark)
    new.insert_many(
        [{"doc_id": 100, "text": "fresh headline\nCOOKIE BANNER\nfresh tail"},
         {"doc_id": 101, "text": "keep me zero\nall novel"}]
    )
    got = dict(
        (r["doc_id"], (r["text"], r["n_lines_kept"]))
        for r in line_dedup(
            new, "text", "doc_id", min_docs=2, against=corpus
        ).df.collect()
    )
    # COOKIE BANNER is in >= 2 corpus docs -> stripped from the batch;
    # "keep me zero" is in only ONE corpus doc -> kept at min_docs=2
    assert got == {
        100: ("fresh headline\nfresh tail", 2),
        101: ("keep me zero\nall novel", 2),
    }
    # min_docs=1: any corpus-seen line goes, including "keep me zero"
    got1 = dict(
        (r["doc_id"], r["text"])
        for r in line_dedup(
            new, "text", "doc_id", min_docs=1, against=corpus
        ).df.collect()
    )
    assert got1 == {100: "fresh headline\nfresh tail", 101: "all novel"}


def test_span_gram_table_round_trip(spark, tmp_path):
    """Prebuilt corpus gram set equals the raw against= path, including
    after a parquet round trip (the durable-asset contract)."""
    from littletable_spark import Table
    from littletable_spark.operators.dedup import (
        duplicate_spans,
        remove_duplicate_spans,
        span_gram_table,
    )

    d = Table.parquet_import(spark, "/root/testdata/sf0.001/documents.parquet")
    new = Table.from_df(d.df.where("doc_id % 10 = 0"))
    corpus = Table.from_df(d.df.where("doc_id % 10 != 0"))
    expect = {
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicate_spans(
            new, "text", "doc_id", k=5, min_docs=1, against=corpus
        )
    }
    grams = span_gram_table(corpus, "text", "doc_id", k=5, min_docs=1)
    p = str(tmp_path / "grams")
    grams.parquet_export(p)
    reloaded = Table.parquet_import(spark, p)
    got = {
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicate_spans(new, "text", "doc_id", k=5, against_grams=reloaded)
    }
    assert got == expect
    # the remove passthrough produces identical cleaned text
    a = {
        r.doc_id: r.text
        for r in remove_duplicate_spans(
            new, "text", "doc_id", k=5, min_docs=1, against=corpus
        )
    }
    b = {
        r.doc_id: r.text
        for r in remove_duplicate_spans(
            new, "text", "doc_id", k=5, against_grams=reloaded
        )
    }
    assert a == b
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not both"):
        duplicate_spans(
            new, "text", "doc_id", k=5, against=corpus, against_grams=grams
        )
    with _pytest.raises(ValueError, match="column 'g'"):
        duplicate_spans(new, "text", "doc_id", k=5, against_grams=new)


def test_boilerplate_line_table_round_trip(spark, tmp_path):
    """Prebuilt corpus line set equals the raw against= path after a
    parquet round trip; baked-in min_docs is respected."""
    from littletable_spark import Table
    from littletable_spark.operators.dedup import (
        boilerplate_line_table,
        line_dedup,
    )

    corpus = Table("blcorp", spark=spark)
    corpus.insert_many(
        [
            {"doc_id": 1, "text": "COOKIE BANNER\nreal a"},
            {"doc_id": 2, "text": "COOKIE BANNER\nreal b"},
            {"doc_id": 3, "text": "NAV BAR\nreal c"},
        ]
    )
    new = Table("blnew", spark=spark)
    new.insert_many(
        [{"doc_id": 10, "text": "COOKIE BANNER\nNAV BAR\nfresh content"}]
    )
    expect = {
        r.doc_id: (r.text, r.n_lines_kept)
        for r in line_dedup(new, "text", "doc_id", min_docs=2, against=corpus)
    }
    lines = boilerplate_line_table(corpus, "text", "doc_id", min_docs=2)
    # min_docs=2: only COOKIE BANNER is boilerplate (NAV BAR once)
    assert {r.line for r in lines} == {"COOKIE BANNER"}
    p = str(tmp_path / "lines")
    lines.parquet_export(p)
    reloaded = Table.parquet_import(spark, p)
    got = {
        r.doc_id: (r.text, r.n_lines_kept)
        for r in line_dedup(new, "text", "doc_id", against_lines=reloaded)
    }
    assert got == expect
    assert got[10] == ("NAV BAR\nfresh content", 2)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="column 'line'"):
        line_dedup(new, "text", "doc_id", against_lines=new)


def test_duplicate_spans_self_mode_rejects_min_docs_below_2(spark):
    """self mode counts the document's own occurrence, so min_docs=1
    would mark every span of every doc; it raises instead of silently
    coercing to >=2 (against=/against_grams= still honor min_docs=1)."""
    t = Table("mdguard", spark=spark)
    t.insert_many([{"doc_id": 1, "text": "a b c d e f"}])
    with pytest.raises(ValueError, match="degenerate in self mode"):
        duplicate_spans(t, "text", "doc_id", k=3, min_docs=1)
