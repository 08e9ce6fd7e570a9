"""HTML → text extraction, pure stdlib (html.parser).

The other half of crawl ingestion (``pdfcodec`` covers documents):
strip markup, drop non-content subtrees (script/style/svg/...), put
newlines at block-element boundaries, collapse intra-block whitespace
(except inside ``<pre>``), decode entities (the parser's
``convert_charrefs``), and optionally keep only MAIN-content blocks by
the classic link-density heuristic (Arc90-readability-style, public):
navigation/boilerplate blocks are mostly link text and short; content
blocks are long and mostly plain text.

Charset: bytes are decoded from the ``<meta charset>`` /
``http-equiv`` declaration when present in the head, else UTF-8 with
latin-1 fallback — the crawl-robust order.

No reference analog; fulfils the brief's pipeline mandate like
pdfcodec/imagecodec.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

__all__ = ["extract_html_text", "looks_like_html"]

_SKIP_TAGS = {
    "script", "style", "noscript", "template", "svg", "iframe",
    "head", "object", "embed",
}
_BLOCK_TAGS = {
    "p", "div", "br", "li", "ul", "ol", "dl", "dd", "dt", "h1", "h2",
    "h3", "h4", "h5", "h6", "tr", "table", "thead", "tbody", "section",
    "article", "header", "footer", "blockquote", "pre", "hr", "figure",
    "figcaption", "nav", "aside", "form", "fieldset", "main", "address",
}
_VOID_SKIP_END = {"br", "hr"}  # void tags: no end event guaranteed

_CHARSET_RE = re.compile(
    rb"""<meta[^>]+?(?:charset\s*=\s*["']?([A-Za-z0-9_-]+)"""
    rb"""|content\s*=\s*["'][^"']*charset=([A-Za-z0-9_-]+))""",
    re.I,
)
_HTML_SNIFF_RE = re.compile(
    rb"<!doctype\s+html|<html[\s>]|<head[\s>]|<body[\s>]", re.I
)


def looks_like_html(blob: bytes) -> bool:
    """Cheap sniff over the first 1 KiB (crawl payloads rarely bury the
    doctype deeper)."""
    return _HTML_SNIFF_RE.search(blob[:1024]) is not None


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        # blocks: [text_parts, n_chars, n_link_chars, is_pre]
        self.blocks: list[list] = [[[], 0, 0, False]]
        self.skip_depth = 0
        self.link_depth = 0
        self.pre_depth = 0
        self.in_title = False
        self.title_parts: list[str] = []

    def _new_block(self) -> None:
        if self.blocks[-1][0]:
            self.blocks.append([[], 0, 0, False])

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "title":  # before the skip check: <title> lives in <head>
            self.in_title = True
            return
        if tag in _SKIP_TAGS:
            self.skip_depth += 1
            return
        if tag == "a":
            self.link_depth += 1
        if tag == "pre":
            self.pre_depth += 1
        if tag in _BLOCK_TAGS:
            self._new_block()
            self.blocks[-1][3] = self.pre_depth > 0

    def handle_endtag(self, tag: str) -> None:
        if tag == "title":
            self.in_title = False
            return
        if tag in _SKIP_TAGS:
            self.skip_depth = max(0, self.skip_depth - 1)
            return
        if tag == "a":
            self.link_depth = max(0, self.link_depth - 1)
        if tag == "pre":
            self.pre_depth = max(0, self.pre_depth - 1)
        if tag in _BLOCK_TAGS and tag not in _VOID_SKIP_END:
            self._new_block()

    def handle_startendtag(self, tag: str, attrs) -> None:
        if tag in _BLOCK_TAGS:
            self._new_block()

    def handle_data(self, data: str) -> None:
        if self.in_title:
            self.title_parts.append(data)
            return
        if self.skip_depth:
            return
        block = self.blocks[-1]
        if not block[3]:  # collapse whitespace outside <pre>
            data = re.sub(r"\s+", " ", data)
            if not data.strip() and not block[0]:
                return
        block[0].append(data)
        n = len(data.strip())
        block[1] += n
        if self.link_depth:
            block[2] += n


def extract_html_text(
    source: bytes | str,
    main_content: bool = False,
    max_link_density: float = 0.5,
    min_block_chars: int = 20,
) -> dict:
    """``{"title": str, "text": str}`` for an HTML page.

    ``main_content=True`` drops boilerplate blocks: any block whose
    link density exceeds ``max_link_density`` or whose text is shorter
    than ``min_block_chars`` (nav bars, footers, tag clouds), the
    standard readability heuristic. With the default ``False``, every
    visible text block is kept."""
    if isinstance(source, bytes):
        enc = None
        m = _CHARSET_RE.search(source[:4096])
        if m:
            enc = (m.group(1) or m.group(2)).decode("ascii", "ignore")
        for attempt in ([enc] if enc else []) + ["utf-8", "latin-1"]:
            try:
                html = source.decode(attempt)
                break
            except (UnicodeDecodeError, LookupError):
                continue
        else:  # pragma: no cover - latin-1 never fails
            html = source.decode("latin-1")
    else:
        html = source
    p = _Extractor()
    p.feed(html)
    p.close()
    lines: list[str] = []
    for parts, n_chars, n_link, is_pre in p.blocks:
        text = "".join(parts)
        text = text if is_pre else text.strip()
        if not text:
            continue
        if main_content:
            if n_chars < min_block_chars:
                continue
            if n_chars and n_link / n_chars > max_link_density:
                continue
        lines.append(text)
    return {
        "title": re.sub(r"\s+", " ", "".join(p.title_parts)).strip(),
        "text": "\n".join(lines),
    }
