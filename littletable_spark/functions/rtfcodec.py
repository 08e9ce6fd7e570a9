"""RTF text extraction — pure stdlib, written from the public RTF 1.9
specification (control words, groups, destinations, escapes).

RTF is still a common export format in enterprise document dumps and
old mail archives; blobs start ``{\\rtf``. Extraction walks the token
stream once with a group stack:

- ``\\par`` / ``\\line`` / ``\\row`` emit newlines, ``\\tab`` /
  ``\\cell`` tabs;
- ``\\'hh`` hex escapes decode through the document's declared code
  page (``\\ansicpgN``, default cp1252);
- ``\\uN`` Unicode escapes emit the code point (negative values are
  16-bit two's complement) and then skip the group's ``\\ucN``
  fallback characters (a following ``\\'hh`` counts as ONE skipped
  character, per spec);
- non-content destinations (``fonttbl``, ``colortbl``, ``stylesheet``,
  ``info``, ``pict``, … and every ``{\\*`` optional destination) are
  skipped as whole groups; ``\\binN`` skips N raw bytes;
- ``\\{`` ``\\}`` ``\\\\`` unescape, and a handful of symbol words map
  to their characters (dashes, quotes, bullet, nbsp).

Not an RTF renderer: tables flatten to tab/newline text like the other
office codecs. Malformed input raises ValueError into the caller's
``on_error`` policy.
"""
from __future__ import annotations

import re

__all__ = ["sniff_rtf", "extract_rtf_text"]

# groups whose content is metadata/binary, never body text
_SKIP_DESTS = frozenset(
    {
        "fonttbl", "colortbl", "stylesheet", "info", "pict", "object",
        "themedata", "colorschememapping", "listtable",
        "listoverridetable", "generator", "filetbl", "datastore",
        "xmlnstbl", "header", "footer", "headerl", "headerr", "headerf",
        "footerl", "footerr", "footerf", "ftncn", "ftnsep", "ftnsepc",
        "aftncn", "aftnsep", "aftnsepc", "revtbl", "rsidtbl",
        "mmathPr", "wgrffmtfilter", "pntext", "pntxta", "pntxtb",
    }
)

_NEWLINE_WORDS = frozenset({"par", "line", "row", "sect", "page"})
_TAB_WORDS = frozenset({"tab", "cell"})
_SYMBOLS = {
    "emdash": "\u2014", "endash": "\u2013", "lquote": "\u2018",
    "rquote": "\u2019", "ldblquote": "\u201c", "rdblquote": "\u201d",
    "bullet": "\u2022", "~": "\u00a0", "_": "\u2011", "-": "",
}

_TOKEN_RE = re.compile(
    rb"\\([a-zA-Z]+)(-?\d+)? ?"   # control word + optional param
    rb"|\\'([0-9a-fA-F]{2})"      # hex escape
    rb"|\\([^a-zA-Z])"            # control symbol
    rb"|([{}])"                   # group delimiters
    rb"|([^\\{}]+)"               # plain text run
)


def sniff_rtf(blob: bytes) -> bool:
    return blob.startswith(b"{\\rtf")


def extract_rtf_text(blob: bytes) -> str:
    """Body text of an RTF blob (see module docstring for semantics)."""
    if not sniff_rtf(blob):
        raise ValueError("not an RTF document")
    codec = "cp1252"
    m = re.search(rb"\\ansicpg(\d+)", blob[:256])
    if m:
        try:
            cp = int(m.group(1))
            b"\x41".decode(f"cp{cp}")
            codec = f"cp{cp}"
        except (LookupError, ValueError):
            pass

    out: list[str] = []
    # group stack entries: [skip: bool, uc: int]
    stack: list[list] = []
    skip = False
    uc = 1
    uc_pending = 0  # fallback chars still to swallow after \uN
    i = 0
    n = len(blob)
    just_opened = False  # next control word may name a destination
    while i < n:
        m = _TOKEN_RE.match(blob, i)
        if m is None:
            raise ValueError(f"malformed RTF at byte {i}")
        i = m.end()
        word, param, hexb, sym, brace, text = m.groups()
        if brace == b"{":
            stack.append([skip, uc])
            just_opened = True
            continue
        if brace == b"}":
            if not stack:
                raise ValueError("unbalanced RTF group")
            skip, uc = stack.pop()
            # a \uN fallback's scope ends with its group (spec §"\uc"):
            # without this, \uN as a group's last token swallows the
            # first character(s) of the PARENT group's following text
            uc_pending = 0
            just_opened = False
            continue
        opened = just_opened
        just_opened = False
        if word is not None:
            w = word.decode("ascii")
            if w == "bin":
                i += max(int(param or 0), 0)  # raw bytes, not tokens
                continue
            if w == "uc":
                uc = max(int(param or 1), 0)
                continue
            if w == "u":
                if skip:
                    continue
                cp = int(param or 0)
                if cp < 0:
                    cp += 65536
                out.append(chr(cp))
                uc_pending = uc
                continue
            if opened and w in _SKIP_DESTS:
                skip = True
                continue
            if skip:
                continue
            if w in _NEWLINE_WORDS:
                out.append("\n")
            elif w in _TAB_WORDS:
                out.append("\t")
            elif w in _SYMBOLS:
                out.append(_SYMBOLS[w])
            # all other control words are formatting: ignored
            continue
        if hexb is not None:
            if uc_pending:  # \'hh counts as ONE \uc fallback char
                uc_pending -= 1
                continue
            if not skip:
                out.append(bytes([int(hexb, 16)]).decode(codec, "replace"))
            continue
        if sym is not None:
            s = sym.decode("latin-1")
            if s == "*" and opened:
                skip = True  # {\* ...}: optional destination, skip
                just_opened = True  # the destination word follows
            elif skip:
                pass
            elif s in ("{", "}", "\\"):
                out.append(s)
            elif s in _SYMBOLS:
                out.append(_SYMBOLS[s])
            elif s == "\n" or s == "\r":
                out.append("\n")  # escaped newline == \par
            continue
        if text is not None and not skip:
            t = text.replace(b"\r", b"").replace(b"\n", b"")
            if uc_pending:
                drop = min(uc_pending, len(t))
                uc_pending -= drop
                t = t[drop:]
            if t:
                out.append(t.decode(codec, "replace"))
    return "".join(out).strip()
