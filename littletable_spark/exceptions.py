"""Exception types mirroring the reference's error surface.

Reference: littletable.py:160-185 (auth/timeout/search errors) and the
KeyError-based unique-index semantics (littletable.py:590-597, 1999-2009).
"""

from __future__ import annotations


class LittletableSparkError(Exception):
    """Base class for engine errors."""


class UniqueKeyViolation(KeyError, LittletableSparkError):
    """Raised when inserting a duplicate (or None) key into a unique index.

    Mirrors the reference's ``KeyError`` on duplicate insert
    (littletable.py:1999-2009).
    """


class SearchIndexInconsistentError(LittletableSparkError):
    """Raised when searching a stale full-text index after table mutation.

    Mirrors littletable.py:170-175, 1794-1799.
    """


class NoSuchIndexError(KeyError, LittletableSparkError):
    """Raised when a keyed accessor references a non-indexed attribute."""
