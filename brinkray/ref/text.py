"""Deterministic HTML -> text extraction.

The reference delivers raw bodies to handlers (brink.go:105-109) and
never extracts text itself; the engine's conformance obligation
(BASELINE.json input_hint) is *byte-identical extracted text per url*
against the pages table's ``text`` column. This module defines the one
extraction algorithm used everywhere: the fixture generator derives the
``text`` column with it at build time, and the engine's extract stage
recomputes it from ``html`` — the e2e test compares the two
byte-for-byte.

Algorithm (fixed): drop <script>/<style> blocks and comments, strip
tags, unescape HTML entities, collapse all whitespace runs to single
spaces, strip ends.
"""

from __future__ import annotations

import html as _htmlmod
import re

__all__ = ["extract_text", "extract_text_batch"]

_DROP_RE = re.compile(
    rb"(?:<script\b.*?(?:</script\s*>|$))|(?:<style\b.*?(?:</style\s*>|$))|(?:<!--.*?(?:-->|$))",
    re.IGNORECASE | re.DOTALL,
)
_TAG_RE = re.compile(rb"<[^>]*>")
_WS_RE = re.compile(r"\s+")


def extract_text(html: bytes) -> str:
    stripped = _TAG_RE.sub(b" ", _DROP_RE.sub(b" ", html))
    s = stripped.decode("utf-8", "surrogateescape")
    s = _htmlmod.unescape(s)
    return _WS_RE.sub(" ", s).strip()


def extract_text_batch(htmls) -> list[str]:
    """List-in/list-out batch helper (regexes compiled once at import)."""
    return [extract_text(h) for h in htmls]
