"""SRT / WebVTT subtitle text extraction — pure stdlib.

Subtitle files are a meaningful slice of crawled text (every video
site serves them) and extracting them as bare text leaves timestamp
lines, cue indices, and markup in the training corpus. Public specs:
the W3C WebVTT recommendation (header line, NOTE/STYLE/REGION
blocks, optional cue identifiers, ``-->`` timing lines with cue
settings) and the de-facto SubRip format (numeric index line,
``HH:MM:SS,mmm --> HH:MM:SS,mmm`` timing, blank-line-separated cues).

Both extractors take DECODED text (the charset ladder in
``functions/textenc.py`` runs first, so legacy-encoded subtitle
files inherit the round-14 decode behavior) and return the cue
payload lines: one line per cue line, cues separated by single
newlines, voice/markup tags (``<i>``, ``<v Name>``, ``{\\an8}``
ASS-style overrides) stripped the way a text pipeline wants.
"""
from __future__ import annotations

import re

__all__ = [
    "looks_like_vtt",
    "looks_like_srt",
    "extract_vtt_text",
    "extract_srt_text",
]

_SRT_TIME = re.compile(
    r"^\d{1,2}:\d{2}:\d{2}[,.]\d{3}\s*-->\s*\d{1,2}:\d{2}:\d{2}[,.]\d{3}"
)
_VTT_TIME = re.compile(
    r"^(?:\d{1,2}:)?\d{2}:\d{2}\.\d{3}\s*-->\s*(?:\d{1,2}:)?\d{2}:\d{2}\.\d{3}"
)
_TAG = re.compile(r"<[^>\n]*>|\{\\[^}\n]*\}")


def looks_like_vtt(text: str) -> bool:
    return text.lstrip("﻿").startswith("WEBVTT")


def looks_like_srt(text: str) -> bool:
    """An index line (optional) followed by an SRT timing line within
    the first few lines."""
    for line in text.lstrip("﻿").splitlines()[:4]:
        if _SRT_TIME.match(line.strip()):
            return True
        if line.strip() and not line.strip().isdigit():
            return False
    return False


def _clean(line: str) -> str:
    return _TAG.sub("", line).strip()


def extract_srt_text(text: str) -> str:
    out: list[str] = []
    in_cue = False
    for raw in text.lstrip("﻿").splitlines():
        line = raw.strip()
        if not line:
            in_cue = False
            continue
        if _SRT_TIME.match(line):
            in_cue = True
            continue
        if not in_cue and line.isdigit():
            continue  # cue index
        if in_cue:
            got = _clean(line)
            if got:
                out.append(got)
    if not out:
        raise ValueError("srt: no cue text")
    return "\n".join(out)


def extract_vtt_text(text: str) -> str:
    lines = text.lstrip("﻿").splitlines()
    if not lines or not lines[0].startswith("WEBVTT"):
        raise ValueError("vtt: missing WEBVTT header")
    out: list[str] = []
    in_cue = False
    in_block = False  # NOTE / STYLE / REGION blocks end at a blank line
    for raw in lines[1:]:
        line = raw.strip()
        if not line:
            in_cue = False
            in_block = False
            continue
        if in_block:
            continue
        if _VTT_TIME.match(line):
            in_cue = True
            continue
        if not in_cue:
            if line.split(None, 1)[0] in ("NOTE", "STYLE", "REGION"):
                in_block = True
            # else: a cue identifier line — skipped either way
            continue
        got = _clean(line)
        if got:
            out.append(got)
    return "\n".join(out)
