"""Charset-tolerant plain-text decoding (functions/textenc.py): the
BOM → UTF-8 strict → detected 8-bit/shift-jis → latin-1 ladder, the
binary-junk guard, and the Spark extract_text routing with the new
``encoding`` column."""
from __future__ import annotations

import pytest

from littletable_spark.functions.textenc import decode_text_blob


# ---------------------------------------------------------------- BOMs
def test_utf8_bom():
    text, enc = decode_text_blob(b"\xef\xbb\xbf" + "héllo".encode("utf-8"))
    assert (text, enc) == ("héllo", "utf-8-sig")


def test_utf16_le_bom():
    t = "Доброе утро"
    assert decode_text_blob(b"\xff\xfe" + t.encode("utf-16-le")) == (
        t,
        "utf-16-le",
    )


def test_utf16_be_bom():
    assert decode_text_blob(b"\xfe\xff" + "héllo".encode("utf-16-be")) == (
        "héllo",
        "utf-16-be",
    )


def test_utf32_le_bom_beats_utf16_prefix():
    # UTF-32-LE's BOM starts with UTF-16-LE's — longest prefix wins
    t = "abc"
    blob = b"\xff\xfe\x00\x00" + t.encode("utf-32-le")
    assert decode_text_blob(blob) == (t, "utf-32-le")


def test_utf32_be_bom():
    t = "abc"
    blob = b"\x00\x00\xfe\xff" + t.encode("utf-32-be")
    assert decode_text_blob(blob) == (t, "utf-32-be")


def test_lying_bom_raises():
    with pytest.raises(UnicodeDecodeError):
        decode_text_blob(b"\xfe\xff" + b"\xd8\x00\x41")  # lone surrogate


# ------------------------------------------------------------- ladder
def test_plain_ascii_is_utf8():
    assert decode_text_blob(b"hello world") == ("hello world", "utf-8")


def test_utf8_strict_wins():
    t = "naïve — déjà vu ✓"
    assert decode_text_blob(t.encode("utf-8")) == (t, "utf-8")


def test_cp1251_cyrillic_runs():
    t = "Привет мир, как дела сегодня"
    assert decode_text_blob(t.encode("cp1251")) == (t, "cp1251")


def test_latin1_accents_decode_as_cp1252():
    # isolated accents inside ASCII words -> Western European; cp1252
    # is a latin-1 superset so the text round-trips identically
    t = "café au lait, déjà vu, señor"
    text, enc = decode_text_blob(t.encode("latin-1"))
    assert text == t
    assert enc == "cp1252"


def test_cp1252_smart_quotes():
    t = "the “best” café — really"
    assert decode_text_blob(t.encode("cp1252")) == (t, "cp1252")


def test_shift_jis():
    t = "こんにちは世界、元気ですか"
    assert decode_text_blob(t.encode("shift_jis")) == (t, "shift_jis")


def test_gbk_chinese():
    t = "这是一个简单的中文测试句子，包含标点符号。机器学习模型需要大量数据。"
    assert decode_text_blob(t.encode("gbk")) == (t, "gbk")
    # with an ASCII prefix, like real docs
    t2 = "Report 2024: " + t
    assert decode_text_blob(t2.encode("gbk")) == (t2, "gbk")


def test_euc_kr_korean():
    t = "이것은 간단한 한국어 테스트 문장입니다. 기계 학습 모델은 많은 데이터가 필요합니다."
    assert decode_text_blob(t.encode("euc_kr")) == (t, "euc_kr")


def test_euc_jp_japanese():
    t = "これは簡単な日本語のテスト文です。機械学習モデルには大量のデータが必要です。"
    assert decode_text_blob(t.encode("euc_jp")) == (t, "euc_jp")


def test_gbk_not_misread_as_cp1251():
    """Round-14 regression: GBK hanzi decoded as cp1251 scores ~0.8
    Cyrillic and used to clear the threshold; the even-run-parity
    prior now routes it to gbk (double-byte runs are even, Russian
    words are routinely odd)."""
    t = "数据处理管道需要正确的字符编码检测功能。"
    _, enc = decode_text_blob(t.encode("gbk"))
    assert enc == "gbk"


def test_korean_not_misread_as_gbk_or_cp1251():
    """EUC-KR decodes 'validly' under GBK into plausible ideographs —
    the Hangul gate must win first."""
    t = "한국어 문서가 중국어로 오인되면 안 됩니다."
    _, enc = decode_text_blob(t.encode("euc_kr"))
    assert enc == "euc_kr"


def test_russian_not_misread_as_gbk():
    """Cyrillic byte runs can form valid GBK pairs; the cp1251 check
    (odd-run-gated) must still come first and win."""
    t = "Это простое русское предложение для проверки декодирования текста."
    assert decode_text_blob(t.encode("cp1251")) == (t, "cp1251")


def test_detection_sweep_multi_sentence():
    """32-case robustness sweep: four varied sentences per multi-byte
    encoding (two for the short-fixture pairs), each with and without
    an ASCII prefix — every case must detect its true encoding."""
    cases = [
        ("gbk", [
            "北京今天的天气很好，适合出去散步。",
            "我们需要讨论下一季度的销售计划和预算分配。",
            "人工智能正在改变世界各地的工业生产方式。",
            "请在明天上午十点之前提交你的工作报告。",
        ]),
        ("euc_kr", [
            "서울의 날씨가 오늘 매우 좋습니다.",
            "다음 분기 판매 계획을 논의해야 합니다.",
            "인공지능이 전 세계 산업을 바꾸고 있습니다.",
            "내일 오전까지 보고서를 제출해 주세요.",
        ]),
        ("euc_jp", [
            "東京の天気はとても良いです。散歩に行きましょう。",
            "来四半期の販売計画について話し合う必要があります。",
            "人工知能は世界中の産業を変えています。",
            "明日の朝までにレポートを提出してください。",
        ]),
        ("shift_jis", [
            "大阪の天気は晴れです。",
            "プロジェクトの進捗を確認しましょう。",
        ]),
        ("cp1251", [
            "Погода в Москве сегодня замечательная.",
            "Нам нужно обсудить план продаж на следующий квартал.",
            "Искусственный интеллект меняет промышленность во всём мире.",
            "Пожалуйста, отправьте отчёт до завтрашнего утра.",
        ]),
        ("cp1252", [
            "Le café est déjà prêt, señor — à bientôt.",
            "Über allen Gipfeln ist Ruh, die Vögel schweigen.",
        ]),
    ]
    for enc, texts in cases:
        for t in texts:
            for prefix in ("", "Subject: report 42\n"):
                text, got = decode_text_blob((prefix + t).encode(enc))
                assert got == enc, (enc, got, t)
                assert text == prefix + t


def test_empty_blob():
    assert decode_text_blob(b"") == ("", "utf-8")


def test_undetectable_falls_to_latin1():
    # a lone 0x81 byte: invalid UTF-8, shift-jis lead byte without a
    # trail... exercise the final total fallback
    text, enc = decode_text_blob(b"x \x81y \xfe z")
    assert enc in ("latin-1", "cp1252")
    assert len(text) == len(b"x \x81y \xfe z")


# ------------------------------------------------------- binary guard
def test_nul_bytes_raise():
    with pytest.raises(ValueError):
        decode_text_blob(b"MZ\x90\x00\x03\x00\x00\x00text inside")


def test_control_heavy_raises():
    with pytest.raises(ValueError):
        decode_text_blob(bytes(range(1, 32)) * 8)


def test_text_control_chars_ok():
    t = "line1\nline2\ttab\fpage\r\n"
    assert decode_text_blob(t.encode("utf-8")) == (t, "utf-8")


# ----------------------------------------------------- Spark routing
def test_extract_text_encoding_column(spark):
    from littletable_spark import Table
    from littletable_spark.operators.multimodal import extract_text

    rows = [
        {"id": 1, "blob": "plain utf-8 text".encode("utf-8")},
        {"id": 2, "blob": "café déjà vu, señor".encode("latin-1")},
        {"id": 3, "blob": "Привет мир, как дела".encode("cp1251")},
        {"id": 4, "blob": b"\xff\xfe" + "wide text".encode("utf-16-le")},
        {"id": 5, "blob": b"\x00\x01\x02binary junk\x00\x00"},
        {"id": 6, "blob": b"%PDF-1.4\ngarbage"},  # pdf path: no encoding
    ]
    t = Table("txt", spark=spark)
    t.insert_many(rows)
    out = {r.id: r for r in extract_text(t, "blob", "id", on_error="null")}
    assert out[1].text == "plain utf-8 text"
    assert out[1].encoding == "utf-8"
    assert out[2].text == "café déjà vu, señor"
    assert out[2].encoding == "cp1252"
    assert out[3].text == "Привет мир, как дела"
    assert out[3].encoding == "cp1251"
    assert out[4].text == "wide text"
    assert out[4].encoding == "utf-16-le"
    assert out[5].text is None and out[5].encoding is None
    assert out[6].text is None
    for r in out.values():
        if r.doc_format not in (None, "text"):
            assert r.encoding is None
