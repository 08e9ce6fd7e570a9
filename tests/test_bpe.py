"""BPE tokenizer: driver merge loop vs a brute-force reference,
greedy encode vs sequential merge replay, Spark end-to-end, durable
merges round-trip, and pack_sequences integration."""

import random
import re

import pytest
from pyspark.sql import functions as F

from littletable_spark import Table
from littletable_spark.operators.bpe import (
    END,
    _encode_word,
    _train_merges,
    _word_symbols,
    apply_bpe,
    train_bpe,
)
from littletable_spark.operators.textops import BPE_TOKEN_RE


# ------------------------------------------------------------------ #
# reference implementations (deliberately naive)


def _ref_train(word_counts, num_merges):
    """Recount every pair from scratch each round — O(n²) but obviously
    correct; same tie-break (max count, then lexicographically smallest
    pair)."""
    words = {i: list(_word_symbols(w)) for i, (w, _) in enumerate(word_counts)}
    counts = {i: c for i, (_, c) in enumerate(word_counts)}
    merges = []
    for _ in range(num_merges):
        pair_counts = {}
        for i, syms in words.items():
            for p in zip(syms, syms[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + counts[i]
        if not pair_counts:
            break
        best = min(pair_counts, key=lambda p: (-pair_counts[p], p))
        merges.append(best)
        for i, syms in words.items():
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and (syms[j], syms[j + 1]) == best:
                    out.append(best[0] + best[1])
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = out
    return merges


def _ref_apply_in_order(word, merges):
    """Apply merges sequentially in rank order (the definitional
    semantics); greedy-lowest-rank must agree."""
    syms = list(_word_symbols(word))
    for left, right in merges:
        out, j = [], 0
        while j < len(syms):
            if j + 1 < len(syms) and syms[j] == left and syms[j + 1] == right:
                out.append(left + right)
                j += 2
            else:
                out.append(syms[j])
                j += 1
        syms = out
    return tuple(syms)


# ------------------------------------------------------------------ #


def test_train_matches_bruteforce_reference():
    rng = random.Random(42)
    alphabet = "abcde"
    for trial in range(5):
        words = {
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8))): rng.randint(1, 20)
            for _ in range(30)
        }
        wc = sorted(words.items())
        got = _train_merges(wc, num_merges=25)
        want = _ref_train(wc, num_merges=25)
        assert got == want, f"trial {trial}: {got[:5]} vs {want[:5]}"


def test_hand_computed_merges():
    # "aaab" x3, "ab" x2: pairs: (a,a)=6, (a,b</w>)=5 -> merge (a,a);
    # then (aa,a)=3, (a,b</w>)=5 -> merge (a,b</w>); then (aa, ab</w>)=3
    wc = [("aaab", 3), ("ab", 2)]
    merges = _train_merges(wc, num_merges=3)
    assert merges == [("a", "a"), ("a", "b" + END), ("aa", "ab" + END)]


def test_greedy_encode_equals_sequential_replay():
    rng = random.Random(7)
    wc = [
        ("".join(rng.choice("abcd") for _ in range(rng.randint(2, 9))), rng.randint(1, 9))
        for _ in range(40)
    ]
    merges = _train_merges(sorted(set(wc)), num_merges=30)
    ranks = {p: i for i, p in enumerate(merges)}
    for w, _ in wc:
        assert _encode_word(w, ranks) == _ref_apply_in_order(w, merges), w
    # unseen words too
    for w in ("dcba", "abcdabcd", "x", "xa"):
        assert _encode_word(w, ranks) == _ref_apply_in_order(w, merges), w


def test_encode_reconstructs_word():
    merges = _train_merges([("hello", 5), ("help", 3)], num_merges=10)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ("hello", "help", "hell", "zzz"):
        pieces = _encode_word(w, ranks)
        assert "".join(pieces) == w + END


def test_spark_train_apply_end_to_end(spark):
    docs = Table("docs", spark=spark)
    texts = [
        "the cat sat on the mat",
        "the dog sat on the log",
        "the the the cat cat",
        "a completely different sentence here",
        "",
    ]
    docs.insert_many([{"doc_id": i, "text": t} for i, t in enumerate(texts)])
    merges = train_bpe(docs, "text", num_merges=40, max_words=1000)
    mrows = sorted(
        ((r.rank, r.left, r.right) for r in merges if r.right is not None),
        key=lambda r: r[0],
    )
    # the asset also carries the training alphabet (rank/right NULL)
    alpha = sorted(r.left for r in merges if r.right is None)
    assert alpha and alpha == sorted(set(alpha))
    # distributed word-count + driver loop == all-local reference train
    local_words = {}
    rx = re.compile(BPE_TOKEN_RE)
    for t in texts:
        for w in rx.findall(t):
            local_words[w] = local_words.get(w, 0) + 1
    want = _ref_train(sorted(local_words.items()), num_merges=40)
    assert [(l, r) for _, l, r in mrows] == want

    out = apply_bpe(docs, "text", "doc_id", merges, emit_pieces=True)
    rows = {r.doc_id: r for r in out}
    assert rows[4].n_bpe_tokens == 0 and rows[4].pieces == []
    ranks = {p: i for i, p in enumerate(want)}
    for i, t in enumerate(texts):
        pieces = []
        for w in rx.findall(t):
            pieces.extend(_encode_word(w, ranks))
        assert list(rows[i].pieces) == pieces
        assert rows[i].n_bpe_tokens == len(pieces)
        # pieces reconstruct the text (single-spaced input, lossless regex)
        assert "".join(pieces).replace(END, "") == t


def test_merges_table_is_durable(spark, tmp_path):
    docs = Table("docs", spark=spark)
    docs.insert_many(
        [{"doc_id": i, "text": f"repeat repeat token{i}"} for i in range(20)]
    )
    merges = train_bpe(docs, "text", num_merges=15)
    path = str(tmp_path / "merges.parquet")
    merges.parquet_export(path)
    back = Table.parquet_import(spark, path, "merges")
    a = apply_bpe(docs, "text", "doc_id", merges)
    b = apply_bpe(docs, "text", "doc_id", back)
    assert sorted((r.doc_id, r.n_bpe_tokens) for r in a) == sorted(
        (r.doc_id, r.n_bpe_tokens) for r in b
    )


def test_pack_sequences_budgets_in_bpe_tokens(spark):
    from littletable_spark.operators.textops import pack_sequences

    docs = Table("docs", spark=spark)
    docs.insert_many(
        [
            {"doc_id": i, "text": "word " * (i + 1) + "ending"}
            for i in range(30)
        ]
    )
    merges = train_bpe(docs, "text", num_merges=20)
    counts = apply_bpe(docs, "text", "doc_id", merges)
    joined = docs.join(counts, doc_id="doc_id")
    packed = pack_sequences(
        joined, "text", "doc_id", budget_tokens=50, n_shards=4,
        weight_col="n_bpe_tokens",
    )
    rows = list(packed)
    assert len(rows) == 30  # every doc assigned exactly once
    by_id = {r.doc_id: r for r in rows}
    cnt = {r.doc_id: r.n_bpe_tokens for r in counts}
    # n_tokens is the BPE weight, not the whitespace count
    for i in range(30):
        assert by_id[i].n_tokens == cnt[i]
    # pack invariant: a doc starts in the pack where its first token lands
    import collections

    stream = collections.defaultdict(int)
    for r in sorted(rows, key=lambda r: (r.shard, r.doc_id)):
        assert r.pack == stream[r.shard] // 50
        assert r.pack_offset == stream[r.shard] % 50
        stream[r.shard] += r.n_tokens


def test_apply_rejects_wrong_table(spark):
    docs = Table("docs", spark=spark)
    docs.insert_many([{"doc_id": 0, "text": "x"}])
    with pytest.raises(ValueError, match="merges table"):
        apply_bpe(docs, "text", "doc_id", docs)


def test_pieces_preserve_interior_whitespace(spark):
    """Newlines / tabs / multi-space runs are their own pre-tokenizer
    tokens (round-9 fix: they used to be silently dropped, fusing
    'hello\\nworld' into 'helloworld'), so piece concatenation and
    chunk_by_pieces reconstruction keep interior whitespace exact."""
    from littletable_spark.operators.bpe import chunk_by_pieces

    docs = Table("docs", spark=spark)
    texts = [
        "hello\nworld",
        "para one\n\npara two\there",
        "a  b   c\r\nd",
    ]
    docs.insert_many([{"doc_id": i, "text": t} for i, t in enumerate(texts)])
    merges = train_bpe(docs, "text", num_merges=10)
    pieces = apply_bpe(docs, "text", "doc_id", merges, emit_pieces=True)
    by_id = {r.doc_id: list(r.pieces) for r in pieces}
    for i, t in enumerate(texts):
        assert "".join(p.replace(END, "") for p in by_id[i]) == t, i
    # one chunk covering the whole doc reproduces it (edge-trim only;
    # these texts have no leading/trailing whitespace)
    chunks = chunk_by_pieces(pieces, "pieces", "doc_id", chunk_tokens=64)
    got = {r.doc_id: r.chunk_text for r in chunks}
    assert got == {i: t for i, t in enumerate(texts)}


def test_chunk_by_pieces(spark):
    from littletable_spark.operators.bpe import chunk_by_pieces

    docs = Table("docs", spark=spark)
    texts = [
        "the cat sat on the mat and the dog sat on the log today",
        "short one",
        "",
    ]
    docs.insert_many([{"doc_id": i, "text": t} for i, t in enumerate(texts)])
    merges = train_bpe(docs, "text", num_merges=30)
    pieces = apply_bpe(docs, "text", "doc_id", merges, emit_pieces=True)
    chunks = chunk_by_pieces(pieces, "pieces", "doc_id", chunk_tokens=5, overlap=1)
    rows = sorted(
        ((r.doc_id, r.chunk_id, r.chunk_text, r.n_chunk_tokens) for r in chunks)
    )
    by_doc = {}
    for d, c, t, n in rows:
        by_doc.setdefault(d, []).append((c, t, n))
    # empty doc emits no chunks; short doc emits one
    assert 2 not in by_doc and len(by_doc[1]) == 1
    # every chunk obeys the budget in REAL tokens
    assert all(n <= 5 for chs in by_doc.values() for _, _, n in chs)
    # reconstructing doc 0 from non-overlapping parts of its chunks
    # yields the original text (chunk_text is trainable text)
    p0 = {r.doc_id: list(r.pieces) for r in pieces}[0]
    full = "".join(p0).replace(END, "").strip()
    assert full == texts[0]
    step = 4  # chunk_tokens - overlap
    rebuilt_pieces = []
    for c, t, n in sorted(by_doc[0]):
        start = c * step
        rebuilt_pieces.extend(p0[start : start + 5][: max(0, len(p0) - start)])
    # chunk texts individually match their piece windows
    for c, t, n in by_doc[0]:
        want = "".join(p0[c * step : c * step + 5]).replace(END, "").strip()
        assert t == want and n == len(p0[c * step : c * step + 5])
    # the union of windows covers every piece (overlap rule: no
    # chunk starts past len - overlap)
    covered = set()
    for c, _, n in by_doc[0]:
        covered.update(range(c * step, c * step + n))
    assert covered == set(range(len(p0)))


def test_encode_word_properties_hypothesis():
    """Any unicode word, any merges: pieces always concatenate back to
    word+</w>, and greedy-lowest-rank == sequential merge replay."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    words = st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)), min_size=1, max_size=12
    )

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.tuples(words, st.integers(1, 50)), min_size=1, max_size=25),
           st.integers(0, 40), words)
    def check(wc, n_merges, probe):
        merges = _train_merges(sorted(set(wc)), num_merges=n_merges)
        ranks = {p: i for i, p in enumerate(merges)}
        for w, _ in wc + [(probe, 1)]:
            pieces = _encode_word(w, ranks)
            assert "".join(pieces) == w + END
            assert pieces == _ref_apply_in_order(w, merges)

    check()


# ------------------------------------------------------------------ #
# token-id surface (round 9): vocab, emit_ids, detokenize, packed ids


def test_vocab_stable_and_complete(spark):
    """bpe_vocab is derived purely from the merges asset: id 0 is unk,
    then the sorted base alphabet, then merge products in rank order —
    so two independent holders of the same asset agree on every id."""
    from littletable_spark.operators.bpe import _vocab_list, bpe_vocab

    docs = Table("docs", spark=spark)
    docs.insert_many(
        [{"doc_id": i, "text": t} for i, t in enumerate(
            ["the cat sat", "the bat sat", "the cat mat"] * 3
        )]
    )
    merges = train_bpe(docs, "text", num_merges=15)
    vt = bpe_vocab(merges)
    rows = sorted((r.token_id, r.piece) for r in vt)
    assert rows[0] == (0, "<unk>")
    ids = [i for i, _ in rows]
    assert ids == list(range(len(rows)))  # dense, zero-based
    pieces = [p for _, p in rows]
    assert len(set(pieces)) == len(pieces)  # injective
    # deterministic re-derivation from the raw asset rows
    mrows = [
        (r.rank, r.left, r.right) for r in merges if r.right is not None
    ]
    alpha = [r.left for r in merges if r.right is None]
    assert pieces == _vocab_list(mrows, alpha)
    # base alphabet segment is sorted and precedes all merge products
    produced = {l + r for _, l, r in mrows}
    n_base = len(pieces) - 1 - len(produced)
    base = pieces[1 : 1 + n_base]
    assert base == sorted(base)
    # the asset alphabet is fully in-vocab (no base symbol is unk)
    assert set(alpha) - produced <= set(base)


def test_ids_pieces_text_roundtrip(spark):
    """apply_bpe(emit_ids=True) ids map 1:1 to pieces via the vocab,
    and detokenize_bpe reconstructs the original text exactly
    (including interior newlines) when every piece is in-vocab."""
    from littletable_spark.operators.bpe import bpe_vocab, detokenize_bpe

    texts = [
        "aa ab aa ab\naa ab",
        "ab aa\tab",
        "aa aa aa ab ab",
    ]
    docs = Table("docs", spark=spark)
    docs.insert_many([{"doc_id": i, "text": t} for i, t in enumerate(texts)])
    # enough merges that every symbol the corpus contains is consumed
    merges = train_bpe(docs, "text", num_merges=40)
    enc = apply_bpe(docs, "text", "doc_id", merges, emit_pieces=True, emit_ids=True)
    vt = {r.token_id: r.piece for r in bpe_vocab(merges)}
    by_id = {r.doc_id: r for r in enc}
    for i, t in enumerate(texts):
        r = by_id[i]
        assert len(r.token_ids) == r.n_bpe_tokens == len(r.pieces)
        assert [vt[tid] for tid in r.token_ids] == list(r.pieces)
        assert 0 not in r.token_ids  # fully in-vocab
    detok = detokenize_bpe(enc, "token_ids", "doc_id", merges)
    got = {r.doc_id: r.text for r in detok}
    assert got == {i: t for i, t in enumerate(texts)}


def test_unk_ids(spark):
    """Characters the training corpus never merged map to UNK_ID and
    detokenize to the unk piece — a closed vocabulary, not a crash."""
    from littletable_spark.operators.bpe import (
        UNK_ID,
        bpe_vocab,
        detokenize_bpe,
    )

    train = Table("train", spark=spark)
    train.insert_many(
        [{"doc_id": i, "text": "aa bb aa bb aa"} for i in range(3)]
    )
    merges = train_bpe(train, "text", num_merges=20)
    test = Table("test", spark=spark)
    test.insert_many([{"doc_id": 0, "text": "aa zz"}])
    enc = apply_bpe(test, "text", "doc_id", merges, emit_ids=True, emit_pieces=True)
    r = list(enc)[0]
    assert UNK_ID in r.token_ids
    vt = {p: i for i, p in ((x.token_id, x.piece) for x in bpe_vocab(merges))}
    detok = detokenize_bpe(enc, "token_ids", "doc_id", merges)
    out = list(detok)[0].text
    assert "<unk>" in out and out.startswith("aa ")
    # unk collision guard ('a' is a base alphabet symbol)
    with pytest.raises(ValueError, match="collides"):
        bpe_vocab(merges, unk_piece="a")


def test_pack_token_ids_invariants(spark):
    """pack_sequences + emit_ids + pack_token_ids: every doc's ids
    appear exactly once, concatenated in id order within each pack,
    and pack token totals equal the member docs' counts."""
    from littletable_spark.operators.bpe import pack_token_ids
    from littletable_spark.operators.textops import pack_sequences

    rng = random.Random(5)
    texts = [
        " ".join(rng.choice(["aa", "ab", "ba", "bb"]) for _ in range(rng.randint(1, 12)))
        for _ in range(40)
    ]
    docs = Table("docs", spark=spark)
    docs.insert_many([{"doc_id": i, "text": t} for i, t in enumerate(texts)])
    merges = train_bpe(docs, "text", num_merges=25)
    enc = apply_bpe(docs, "text", "doc_id", merges, emit_ids=True)
    packed = pack_sequences(
        docs.join(enc, doc_id="doc_id"), "text", "doc_id",
        budget_tokens=16, n_shards=4, weight_col="n_bpe_tokens",
    )
    joined = packed.join(enc.select("doc_id token_ids"), doc_id="doc_id")
    out = pack_token_ids(joined, "doc_id")
    ids_by_doc = {r.doc_id: list(r.token_ids) for r in enc}
    meta = {
        r.doc_id: (r.shard, r.pack, r.pack_offset, r.n_tokens)
        for r in packed
    }
    packs = {(r.shard, r.pack): r for r in out}
    # totals: n_tokens on each pack equals the sum of member doc counts
    for (sh, pk), r in packs.items():
        members = sorted(
            d for d, (s, p, _, _) in meta.items() if (s, p) == (sh, pk)
        )
        want = [tid for d in members for tid in ids_by_doc[d]]
        assert list(r.token_ids) == want, (sh, pk)
        assert r.n_docs == len(members)
        assert r.n_tokens == len(want) == sum(meta[d][3] for d in members)
    # every doc is in exactly one pack
    assert sum(r.n_docs for r in packs.values()) == len(texts)


# ------------------------------------------------------------------ #
# byte-level BPE (round 9): GPT-2-style full-coverage tokenizer


def test_byte_map_is_reversible_bijection():
    from littletable_spark.operators.bpe import _B2U, _U2B

    assert len(_B2U) == 256 and len(_U2B) == 256
    for b in range(256):
        assert _U2B[_B2U[b]] == b
    # every mapped char is printable (merged pieces remain readable)
    assert all(c.isprintable() for c in _B2U.values())


def test_byte_level_round_trip_zero_unks(spark):
    """Byte-level assets tokenize ANY text with zero unks — including
    characters the training corpus never saw (emoji, CJK, controls) —
    and detokenize_bpe restores the original exactly."""
    from littletable_spark.operators.bpe import (
        UNK_ID,
        bpe_vocab,
        detokenize_bpe,
    )

    train = Table("train", spark=spark)
    train.insert_many(
        [{"doc_id": i, "text": "the cat sat on the mat"} for i in range(3)]
    )
    merges = train_bpe(train, "text", num_merges=20, byte_level=True)
    # vocab covers the full byte alphabet in plain + word-final forms
    n_vocab = bpe_vocab(merges).df.count()
    assert n_vocab >= 1 + 512

    texts = [
        "the cat sat",                      # in-distribution
        "naïve café — über",                # accents + em dash
        "日本語のテキスト",                   # CJK, never seen
        "mixed 🙂 emoji\nand\tcontrols",     # emoji + whitespace
        "",                                  # empty
    ]
    docs = Table("docs", spark=spark)
    docs.insert_many([{"doc_id": i, "text": t} for i, t in enumerate(texts)])
    enc = apply_bpe(docs, "text", "doc_id", merges, emit_ids=True)
    for r in enc:
        assert UNK_ID not in (r.token_ids or []), r.doc_id
    detok = detokenize_bpe(enc, "token_ids", "doc_id", merges)
    got = {r.doc_id: r.text for r in detok}
    assert got == {i: t for i, t in enumerate(texts)}


def test_literal_end_marker_text_round_trips(spark):
    """Source text containing a literal '</w>' (which maps to exactly
    the END marker's characters in byte space) must survive
    detokenize_bpe and chunk_by_pieces: END strips only piece-finally,
    never as a substring of genuine text."""
    from littletable_spark.operators.bpe import chunk_by_pieces, detokenize_bpe

    texts = [
        "an xml tag </w> in prose",
        "</w>",
        "ends with </w>",
        "<w></w></w>",
    ]
    train = Table("train", spark=spark)
    # train on the same texts so char-level mode has every symbol
    # in-alphabet (no unks) and both modes can round-trip exactly
    train.insert_many([{"doc_id": i, "text": t} for i, t in enumerate(texts)])
    for byte_level in (False, True):
        merges = train_bpe(train, "text", num_merges=5, byte_level=byte_level)
        docs = Table("docs", spark=spark)
        docs.insert_many([{"doc_id": i, "text": t} for i, t in enumerate(texts)])
        enc = apply_bpe(
            docs, "text", "doc_id", merges, emit_ids=True, emit_pieces=True
        )
        detok = detokenize_bpe(enc, "token_ids", "doc_id", merges)
        got = {r.doc_id: r.text for r in detok}
        assert got == dict(enumerate(texts)), f"byte_level={byte_level}"
        chunks = chunk_by_pieces(enc, "pieces", "doc_id", chunk_tokens=1000)
        rebuilt = {r.doc_id: r.chunk_text for r in chunks}
        for i, t in enumerate(texts):
            assert "</w>" in rebuilt[i], (byte_level, i, rebuilt[i])


def test_byte_level_asset_is_durable_and_self_describing(spark, tmp_path):
    """The byte_level marker row survives parquet; a re-imported asset
    applies byte mapping without any caller flag."""
    from littletable_spark.operators.bpe import detokenize_bpe

    train = Table("train", spark=spark)
    train.insert_many([{"doc_id": 0, "text": "hello world hello"}])
    merges = train_bpe(train, "text", num_merges=10, byte_level=True)
    path = str(tmp_path / "bl_merges.parquet")
    merges.parquet_export(path)
    back = Table.parquet_import(spark, path, "merges")

    docs = Table("docs", spark=spark)
    docs.insert_many([{"doc_id": 0, "text": "héllo wörld 🎉"}])
    a = apply_bpe(docs, "text", "doc_id", merges, emit_ids=True)
    b = apply_bpe(docs, "text", "doc_id", back, emit_ids=True)
    assert [list(r.token_ids) for r in a] == [list(r.token_ids) for r in b]
    got = list(detokenize_bpe(b, "token_ids", "doc_id", back))[0].text
    assert got == "héllo wörld 🎉"


def test_byte_level_merges_compress(spark):
    """Merges actually fire in byte space: a repeated word encodes to
    far fewer pieces than its byte length."""
    train = Table("train", spark=spark)
    train.insert_many(
        [{"doc_id": i, "text": "tokenizer " * 20} for i in range(5)]
    )
    merges = train_bpe(train, "text", num_merges=60, byte_level=True)
    docs = Table("docs", spark=spark)
    docs.insert_many([{"doc_id": 0, "text": "tokenizer tokenizer"}])
    r = list(apply_bpe(docs, "text", "doc_id", merges))[0]
    assert r.n_bpe_tokens <= 4  # ~1 piece per word after merges


def test_pack_token_ids_missing_columns(spark):
    from littletable_spark.operators.bpe import pack_token_ids

    t = Table("t", spark=spark)
    t.insert_many([{"doc_id": 0, "token_ids": [1, 2]}])
    with pytest.raises(ValueError, match="pack_sequences coordinates"):
        pack_token_ids(t, "doc_id")
