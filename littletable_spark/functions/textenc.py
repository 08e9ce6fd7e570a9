"""Charset-tolerant plain-text decoding for ``extract_text``.

Legacy-encoded ``.txt`` blobs (latin-1 / cp1251 / shift-jis / UTF-16)
are a real slice of any web corpus; a bare ``blob.decode("utf-8")``
NULLs all of them through ``on_error``.  This module is the decode
ladder the HTML codec already applies for markup, generalized for
bare text:

1. **BOM sniff** — UTF-8 / UTF-16 LE/BE / UTF-32 LE/BE byte-order
   marks decode strictly with the declared codec (a blob that lies
   about its BOM is corrupt, not text);
2. **binary sniff** — NUL bytes or a high control-character ratio
   mean the blob is not text in ANY single-byte encoding; raise so
   the caller's ``on_error`` policy keeps its audit trail (latin-1
   alone never fails, so this check must come first);
3. **UTF-8 strict** — the overwhelmingly common case, and UTF-8 is
   self-validating enough that a strict success is trusted;
4. **statistical multi-byte / 8-bit detection** — candidate decodes
   are scored by how many of their non-ASCII characters land in the
   script the encoding exists to serve (kana+ideographs for
   shift-jis/euc-jp, Hangul for euc-kr, ideographs for gbk, Cyrillic
   for cp1251, Latin letters for cp1252), with two structural
   priors: the high-byte mean-run-length prior (Cyrillic/CJK words
   encode as unbroken runs, Western accents appear singly), and —
   round 14, the gbk-vs-cp1251 discriminator — the run PARITY
   prior: double-byte CJK text produces even-length high-byte runs,
   while single-byte Cyrillic words are as often odd as even, so a
   corpus-realistic Russian sentence always shows odd runs and GBK
   hanzi virtually never does (GBK trails 0x40-0x7E could break
   parity but are rare in running text). Order matters and is
   pinned by tests: euc-kr (Hangul is unambiguous) before gbk
   (GBK decodes ANY double-byte text to plausible ideographs),
   euc-jp (kana-gated) before gbk for the same reason, cp1251
   (odd-run-gated) before gbk so Chinese no longer reads as
   Cyrillic and Russian no longer reads as hanzi;
5. **latin-1 fallback** — total decode, every byte maps somewhere.

Known bound (documented, deliberate): kana-free kanji-only Japanese
in euc-jp falls through the kana gate and detects as gbk — the
ideograph repertoires overlap and a kana-less document carries no
deterministic signal either way.

Everything is deterministic (no chardet-style confidence sampling) so
the DuckDB oracle can predict the chosen encoding arithmetically.

No reference analog (littletable imports text via csv/json paths);
fulfils the brief's crawl-ingestion mandate like htmlcodec/pdfcodec.
"""

from __future__ import annotations

import re

__all__ = ["decode_text_blob"]

# checked longest-prefix-first: UTF-32-LE's BOM starts with UTF-16-LE's
_BOMS: list[tuple[bytes, str]] = [
    (b"\xef\xbb\xbf", "utf-8-sig"),
    (b"\xff\xfe\x00\x00", "utf-32-le"),
    (b"\x00\x00\xfe\xff", "utf-32-be"),
    (b"\xff\xfe", "utf-16-le"),
    (b"\xfe\xff", "utf-16-be"),
]

# control bytes that legitimately appear in text
_TEXT_CTRL = frozenset(b"\t\n\r\f\v\x1b")
_HI_RUN_RE = re.compile(rb"[\x80-\xff]+")


def _looks_binary(blob: bytes) -> bool:
    """NUL bytes or >10% non-whitespace control bytes in the first
    4 KiB — the classic grep/git binary heuristic."""
    sample = blob[:4096]
    if b"\x00" in sample:
        return True
    n_ctrl = sum(1 for b in sample if b < 0x20 and b not in _TEXT_CTRL)
    return n_ctrl > len(sample) * 0.10


# what cp1252 maps bytes 0x80-0x9F to: smart quotes, dashes, ellipsis,
# euro, dagger, trademark, OE/Š/Ž... — under latin-1 these bytes are C1
# control characters, so seeing them decode cleanly is cp1252 evidence
_CP1252_PUNCT = frozenset(
    "€‚ƒ„…†‡ˆ‰Š"
    "‹ŒŽ‘’“”•–—"
    "˜™š›œžŸ"
)


def _script_score(text: str, lo: int, hi: int) -> float:
    """Fraction of non-ASCII chars inside [lo, hi] (plus, for the
    Latin window, cp1252's C1-range punctuation) — how much of the
    decoded high-byte content lands in the encoding's home script."""
    non_ascii = [c for c in text if ord(c) > 0x7F]
    if not non_ascii:
        return 0.0
    hit = sum(
        1
        for c in non_ascii
        if lo <= ord(c) <= hi or (lo <= 0xA0 and c in _CP1252_PUNCT)
    )
    return hit / len(non_ascii)


def _cjk_score(text: str) -> float:
    non_ascii = [ord(c) for c in text if ord(c) > 0x7F]
    if not non_ascii:
        return 0.0
    hit = sum(
        1
        for o in non_ascii
        if 0x3000 <= o <= 0x30FF  # CJK punct + kana
        or 0x4E00 <= o <= 0x9FFF  # unified ideographs
        or 0xFF00 <= o <= 0xFFEF  # full/half-width forms
    )
    return hit / len(non_ascii)


def _hangul_score(text: str) -> float:
    non_ascii = [ord(c) for c in text if ord(c) > 0x7F]
    if not non_ascii:
        return 0.0
    hit = sum(
        1
        for o in non_ascii
        if 0xAC00 <= o <= 0xD7A3  # precomposed syllables
        or 0x1100 <= o <= 0x11FF  # jamo
        or 0x3130 <= o <= 0x318F  # compatibility jamo
    )
    return hit / len(non_ascii)


def _kana_score(text: str) -> float:
    non_ascii = [ord(c) for c in text if ord(c) > 0x7F]
    if not non_ascii:
        return 0.0
    hit = sum(1 for o in non_ascii if 0x3040 <= o <= 0x30FF)
    return hit / len(non_ascii)


def decode_text_blob(blob: bytes) -> tuple[str, str]:
    """``(text, encoding)`` for a plain-text blob.

    Raises ``ValueError`` for binary junk (NULs / control-heavy) and
    ``UnicodeDecodeError`` for a blob whose BOM-declared codec fails —
    both inside the caller's ``CORRUPT_ERRORS`` net.
    """
    if not blob:
        return "", "utf-8"
    for bom, codec in _BOMS:
        if blob.startswith(bom):
            if codec == "utf-8-sig":
                return blob.decode(codec), codec
            return blob[len(bom):].decode(codec), codec
    if _looks_binary(blob):
        raise ValueError("binary blob is not decodable text")
    try:
        return blob.decode("utf-8"), "utf-8"
    except UnicodeDecodeError:
        pass

    sample = blob[:8192]
    # mean high-byte run length: Cyrillic/CJK words are unbroken runs
    # of bytes >= 0x80; Latin accents are isolated bytes in ASCII
    # words. Run PARITY separates single-byte Cyrillic (odd runs
    # routinely occur) from double-byte CJK (runs are even).
    runs = _HI_RUN_RE.findall(sample)
    mean_run = (sum(len(r) for r in runs) / len(runs)) if runs else 0.0
    has_odd_run = any(len(r) % 2 for r in runs)

    def _try(codec: str) -> str | None:
        try:
            return sample.decode(codec)
        except (UnicodeDecodeError, LookupError):
            return None

    sj = _try("shift_jis")
    if sj is not None and mean_run >= 2.0 and _cjk_score(sj) >= 0.8:
        return blob.decode("shift_jis"), "shift_jis"

    # Hangul-gated euc-kr before gbk, which decodes ANY double-byte
    # text to plausible ideographs (round 14). The gate is 0.95, not
    # lower: GBK hanzi can strictly decode under euc-kr into a
    # hangul/hanja MIX via the overlapping KS X 1001 rows, but modern
    # Korean is near-pure hangul (hanja-heavy legacy Korean falls to
    # gbk — the documented bound, like kana-free euc-jp)
    kr = _try("euc_kr")
    if kr is not None and mean_run >= 2.0 and _hangul_score(kr) >= 0.95:
        return blob.decode("euc_kr"), "euc_kr"

    # euc-jp before gbk: GBK also maps the kana rows, so the kana
    # gate must see the euc-jp candidate first
    jp = _try("euc_jp")
    if (
        jp is not None
        and mean_run >= 2.0
        and _cjk_score(jp) >= 0.8
        and _kana_score(jp) >= 0.2
    ):
        return blob.decode("euc_jp"), "euc_jp"

    # cp1251 before gbk, odd-run-gated: GBK hanzi decoded as cp1251
    # scores ~0.8 Cyrillic but its high-byte runs are all even, while
    # real Russian text always carries odd-length words
    cyr = sample.decode("cp1251", "replace")
    if (
        mean_run >= 3.0
        and has_odd_run
        and _script_score(cyr, 0x0400, 0x04FF) >= 0.8
    ):
        return blob.decode("cp1251", "replace"), "cp1251"

    zh = _try("gbk")
    if zh is not None and mean_run >= 2.0 and _cjk_score(zh) >= 0.8:
        return blob.decode("gbk"), "gbk"

    w = sample.decode("cp1252", "replace")
    if "�" not in w and _script_score(w, 0x00A0, 0x024F) >= 0.5:
        return blob.decode("cp1252"), "cp1252"

    return blob.decode("latin-1"), "latin-1"
