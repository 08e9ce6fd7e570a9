"""CJK-aware token proxies (round 14, operators/textops.py): Han/kana
chars count as their own tokens (whitespace tokenization lumps a whole
unsegmented-script paragraph into ~1 token), the BPE proxy counts
ceil(cjk_chars/2), chunking/packing budget at char granularity, and
the word-shaped Gopher rules (mean_token_len, English stopword_ratio)
are exempt for CJK-dominant docs. Hangul is deliberately NOT padded —
Korean is whitespace-segmented."""
from __future__ import annotations

import pytest

from littletable_spark import Table


def _tab(spark, rows, name="cjk"):
    t = Table(name, spark=spark)
    t.insert_many(rows)
    return t


def test_token_stats_cjk_char_tokens(spark):
    from littletable_spark.operators.textops import token_stats

    rows = [
        {"doc_id": 1, "text": "hello world"},  # ascii: unchanged
        {"doc_id": 2, "text": "中文很好"},  # 4 han chars = 4 tokens
        {"doc_id": 3, "text": "mixed 中文 and ひらがな text"},
        {"doc_id": 4, "text": "한국어 텍스트 공백"},  # hangul: words
    ]
    out = {r.doc_id: r for r in token_stats(_tab(spark, rows), "text", "doc_id")}
    assert out[1].n_tokens == 2 and out[1].n_cjk_chars == 0
    assert out[2].n_tokens == 4 and out[2].n_cjk_chars == 4
    assert out[2].n_bpe_tokens == 2  # ceil(4/2) + 0 ascii pieces
    # 3 ascii words + 2 han + 4 kana
    assert out[3].n_tokens == 9 and out[3].n_cjk_chars == 6
    assert out[4].n_tokens == 3 and out[4].n_cjk_chars == 0


def test_token_stats_ascii_bpe_unchanged(spark):
    from littletable_spark.operators.textops import token_stats

    rows = [{"doc_id": 1, "text": "it's a test 123"}]
    out = list(token_stats(_tab(spark, rows), "text", "doc_id"))[0]
    # it|'s| a| test| 123 = 5 pieces, no CJK adjustment
    assert out.n_bpe_tokens == 5


def test_chunk_documents_cjk_char_windows(spark):
    from littletable_spark.operators.textops import chunk_documents

    rows = [{"doc_id": 1, "text": "一二三四五六七八九十"}]  # 10 chars
    out = sorted(
        chunk_documents(_tab(spark, rows), "text", "doc_id", chunk_tokens=4),
        key=lambda r: r.chunk_id,
    )
    assert len(out) == 3  # 4 + 4 + 2, not one giant chunk
    assert out[0].chunk_text == "一 二 三 四"
    assert out[2].n_chunk_tokens == 2


def test_pack_sequences_cjk_budget(spark):
    from littletable_spark.operators.textops import pack_sequences

    rows = [{"doc_id": i, "text": "中" * 40} for i in range(8)]
    out = list(
        pack_sequences(
            _tab(spark, rows), "text", "doc_id", budget_tokens=100,
            n_shards=1,
        )
    )
    assert all(r.n_tokens == 40 for r in out)  # chars, not 1
    assert max(r.pack for r in out) >= 2  # 320 tokens / 100 budget


def test_filter_quality_cjk_exemption(spark):
    from littletable_spark.operators.textops import filter_quality

    cjk_doc = "中文字符的段落" * 10  # 70 han chars, no stopwords
    latin_gibberish = "zq " * 60  # mean len 2: fails mean_token_len
    rows = [
        {"doc_id": 1, "text": cjk_doc},
        {"doc_id": 2, "text": latin_gibberish},
    ]
    out = {
        r.doc_id: r
        for r in filter_quality(_tab(spark, rows), "text", "doc_id")
    }
    # CJK doc: mean_token_len ~1 and stopword_ratio 0, but both rules
    # are exempt for CJK-dominant text — no word-shaped failures
    assert "mean_token_len" not in out[1].failed_rules
    assert "stopword_ratio" not in out[1].failed_rules
    # the latin doc still fails the word-shaped rules
    assert "mean_token_len" in out[2].failed_rules
    assert out[2].keep is False


def test_quality_score_cjk_tokens(spark):
    from littletable_spark.operators.textops import quality_score

    rows = [{"doc_id": 1, "text": "中文很好"}]
    out = list(quality_score(_tab(spark, rows), "text", "doc_id"))[0]
    assert out.n_tokens == 4
    assert out.mean_token_len == 1.0
