"""unigram_logprob (LM-quality proxy) and tfidf_top_terms, cross-checked
against pure-Python models."""

import math

import pytest

from littletable_spark import Table
from littletable_spark.operators.textops import tfidf_top_terms, unigram_logprob

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the log"),
    (2, "weird zyxwv qqqq tokens appear here"),
    (3, ""),
    (4, "the the the the"),
]


def _mk(spark, docs=DOCS):
    t = Table("docs", spark=spark)
    t.insert_many([{"doc_id": i, "text": s} for i, s in docs])
    return t


def _toks(s):
    return [w for w in (s or "").strip().split() if w]


def _model_logprob(score_docs, train_docs, alpha=0.5, vocab_size=None):
    freq = {}
    for _i, s in train_docs:
        for w in _toks(s):
            freq[w] = freq.get(w, 0) + 1
    n = float(sum(freq.values()))
    if vocab_size is not None:
        keep = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
        freq = dict(keep)
    out = {}
    for i, s in score_docs:
        t = _toks(s)
        if not t:
            continue
        lp = [math.log(freq.get(w, alpha) / n) for w in t]
        out[i] = (len(t), sum(lp) / len(lp))
    return out


def _model_tfidf(docs, k):
    tf = {}
    for i, s in docs:
        for w in _toks(s):
            tf[(i, w)] = tf.get((i, w), 0) + 1
    dfreq = {}
    for (_i, w), _c in tf.items():
        dfreq[w] = dfreq.get(w, 0) + 1
    d = float(len(docs))
    rows = []
    for i, _s in docs:
        terms = [
            (w, c, dfreq[w], c * math.log(d / dfreq[w]))
            for (j, w), c in tf.items()
            if j == i
        ]
        terms.sort(key=lambda t: (-t[3], t[0]))
        for rank, (w, c, df_, sc) in enumerate(terms[:k], start=1):
            rows.append((i, w, c, df_, round(sc, 9), rank))
    return sorted(rows)


def test_logprob_matches_model(spark):
    got = {
        r["doc_id"]: (r["n_tokens"], r["logprob_per_token"])
        for r in unigram_logprob(_mk(spark), "text", "doc_id").df.collect()
    }
    want = _model_logprob(DOCS, DOCS)
    assert set(got) == set(want)  # empty doc 3 emits no row
    for i in want:
        assert got[i][0] == want[i][0]
        assert got[i][1] == pytest.approx(want[i][1], rel=1e-9)
    # doc 4 is all high-frequency tokens -> best score; doc 2 is all
    # rare tokens -> worst (gibberish filtering works)
    scores = {i: v[1] for i, v in got.items()}
    assert scores[4] == max(scores.values())
    assert scores[2] == min(scores.values())


def test_logprob_vocab_cap_and_oov(spark):
    got = {
        r["doc_id"]: r["logprob_per_token"]
        for r in unigram_logprob(
            _mk(spark), "text", "doc_id", alpha=0.25, vocab_size=3
        ).df.collect()
    }
    want = _model_logprob(DOCS, DOCS, alpha=0.25, vocab_size=3)
    for i in want:
        assert got[i] == pytest.approx(want[i][1], rel=1e-9)


def test_logprob_train_score_split(spark):
    train = _mk(spark)
    new = [(100, "the cat sat"), (101, "zzz unseen everywhere")]
    score = _mk(spark, new)
    got = {
        r["doc_id"]: (r["n_tokens"], r["logprob_per_token"])
        for r in unigram_logprob(
            score, "text", "doc_id", train_table=train
        ).df.collect()
    }
    want = _model_logprob(new, DOCS)
    for i in want:
        assert got[i][0] == want[i][0]
        assert got[i][1] == pytest.approx(want[i][1], rel=1e-9)
    assert got[100][1] > got[101][1]  # in-vocab doc beats OOV doc


def test_tfidf_matches_model(spark):
    got = sorted(
        (
            r["doc_id"],
            r["term"],
            r["tf"],
            r["df"],
            round(r["tfidf"], 9),
            r["term_rank"],
        )
        for r in tfidf_top_terms(_mk(spark), "text", "doc_id", k=3).df.collect()
    )
    assert got == _model_tfidf(DOCS, k=3)


def test_tfidf_rank_is_total_and_k_bounds(spark):
    out = tfidf_top_terms(_mk(spark), "text", "doc_id", k=2).df.collect()
    per_doc = {}
    for r in out:
        per_doc.setdefault(r["doc_id"], []).append(r["term_rank"])
    for i, ranks in per_doc.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 2
    # near-ubiquitous "the" has the lowest idf -> not a top-2 term here
    terms0 = {r["term"] for r in out if r["doc_id"] == 0}
    assert "the" not in terms0
