"""HTML -> text extraction (new-engine-only stage; SURVEY.md §2.2 note).

The reference has no HTML stage (tweets arrive pre-extracted); the F1
fixture synthesizes ``html`` by deterministically wrapping ``text``
(FIXTURES.md §F1) and the extractor must invert that wrap **byte-identically
per url** (BASELINE.json input_hint).  For arbitrary HTML a best-effort
tag-stripping fallback is provided; the invariant-gated path is the wrap
inverse.
"""

from __future__ import annotations

import re

_WRAP = re.compile(rb"<body><p>(.*)</p></body></html>\s*$", re.DOTALL)
_TAGS = re.compile(rb"<[^>]+>")
_WS = re.compile(rb"\s+")


def extract_text(html: bytes) -> str:
    """Extract the body text from an html byte payload."""
    m = _WRAP.search(html)
    if m is not None:
        return m.group(1).decode("utf-8")
    # best-effort fallback: strip tags, collapse whitespace
    stripped = _TAGS.sub(b" ", html)
    return _WS.sub(b" ", stripped).strip().decode("utf-8", errors="replace")


def wrap_html(text: str, title: str) -> bytes:
    """The F1 fixture wrap rule (also used by the documents-table adapter)."""
    return (
        b"<html><head><title>" + title.encode("utf-8")
        + b"</title></head><body><p>" + text.encode("utf-8")
        + b"</p></body></html>"
    )
