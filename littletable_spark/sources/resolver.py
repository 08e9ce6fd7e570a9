"""Source resolver: uniform access to heterogeneous inputs.

Capability parity with the reference's ``_MultiIterator``
(littletable.py:761-927): raw CSV/JSON text strings, local paths,
``http(s)://`` URLs (optional basic auth), and ``.gz`` / ``.zip`` (with
member selection) / ``.tar.gz`` / ``.xz`` archives.

Spark-first split of responsibilities:
- ``.gz`` on a local path is Spark-native (Hadoop codec) — passed through;
- everything else (raw strings, URLs, zip/tar members, xz) is
  materialized to a temp file driver-side, then handed to ``spark.read``
  — archives and URLs are driver-bound inputs in the reference too; at
  dataset scale users point ``spark.read`` at object storage directly.
"""

from __future__ import annotations

import gzip
import io
import lzma
import os
import tarfile
import tempfile
import urllib.request
import zipfile
from dataclasses import dataclass
from typing import Any


@dataclass
class ResolvedSource:
    path: str
    source_type: str  # "string" | "file" | "url" | "zip" | "tar" | "gz" | "xz"
    cleanup: bool = False


def _write_temp(data: bytes, suffix: str) -> str:
    fd, path = tempfile.mkstemp(suffix=suffix, prefix="lts_src_")
    with os.fdopen(fd, "wb") as f:
        f.write(data)
    return path


def resolve_source(
    source: Any,
    suffix: str = ".csv",
    zippath: str | None = None,
    url_timeout: float = 30.0,
    username: str | None = None,
    password: str | None = None,
    cafile: str | None = None,
) -> ResolvedSource:
    """Return a local filesystem path Spark can read."""
    if hasattr(source, "read"):  # file-like
        data = source.read()
        if isinstance(data, str):
            data = data.encode()
        return ResolvedSource(_write_temp(data, suffix), "file", cleanup=True)
    if not isinstance(source, (str, os.PathLike)):
        raise TypeError(f"unsupported source type {type(source).__name__}")

    text = str(source)
    if "\n" in text:  # raw data string (reference sniff rule)
        return ResolvedSource(_write_temp(text.encode(), suffix), "string", cleanup=True)

    if text.startswith(("http://", "https://")):
        req = urllib.request.Request(text)
        if username is not None:
            import base64

            cred = base64.b64encode(f"{username}:{password or ''}".encode()).decode()
            req.add_header("Authorization", f"Basic {cred}")
        context = None
        if cafile is not None:
            import ssl

            context = ssl.create_default_context(cafile=cafile)
        with urllib.request.urlopen(
            req, timeout=url_timeout, context=context
        ) as resp:
            data = resp.read()
        return _decompress_if_needed(data, text, suffix, zippath, "url")

    path = os.fspath(source)
    low = path.lower()
    if low.endswith(".zip"):
        with open(path, "rb") as f:
            return _from_zip(f.read(), suffix, zippath)
    if low.endswith((".tar.gz", ".tgz", ".tar")):
        with open(path, "rb") as f:
            return _from_tar(f.read(), suffix, zippath)
    if low.endswith((".xz", ".lzma")):
        with open(path, "rb") as f:
            data = lzma.decompress(f.read())
        return ResolvedSource(_write_temp(data, suffix), "xz", cleanup=True)
    # plain file or .gz: Spark reads both natively (Hadoop codec for .gz)
    return ResolvedSource(path, "gz" if low.endswith(".gz") else "file")


def _decompress_if_needed(
    data: bytes, name: str, suffix: str, zippath: str | None, source_type: str
) -> ResolvedSource:
    low = name.lower()
    if low.endswith(".zip"):
        return _from_zip(data, suffix, zippath)
    if low.endswith((".tar.gz", ".tgz", ".tar")):
        return _from_tar(data, suffix, zippath)
    if low.endswith(".gz"):
        data = gzip.decompress(data)
    elif low.endswith((".xz", ".lzma")):
        data = lzma.decompress(data)
    return ResolvedSource(_write_temp(data, suffix), source_type, cleanup=True)


def _from_zip(data: bytes, suffix: str, zippath: str | None) -> ResolvedSource:
    zf = zipfile.ZipFile(io.BytesIO(data))
    names = [n for n in zf.namelist() if not n.endswith("/")]
    member = zippath or (names[0] if len(names) == 1 else None)
    if member is None:
        raise ValueError(f"zip has multiple members; pass zippath= (found {names})")
    return ResolvedSource(_write_temp(zf.read(member), suffix), "zip", cleanup=True)


def _from_tar(data: bytes, suffix: str, zippath: str | None) -> ResolvedSource:
    tf = tarfile.open(fileobj=io.BytesIO(data))
    names = [m.name for m in tf.getmembers() if m.isfile()]
    member = zippath or (names[0] if len(names) == 1 else None)
    if member is None:
        raise ValueError(f"tar has multiple members; pass zippath= (found {names})")
    fobj = tf.extractfile(member)
    assert fobj is not None
    return ResolvedSource(_write_temp(fobj.read(), suffix), "tar", cleanup=True)
