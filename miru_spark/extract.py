"""HTML -> text extraction.

The reference fetches document text through FullTextTermProvider.gatherText
(miru-stream-plugins/.../FullTextTermProvider.java:13-28) and the wiki
ingest renders wiki markup to plain text before tokenizing
(wiki-miru-deployable/.../WikiMiruIndexService.java:401-425). Our input
table carries raw `html` alongside the reference-extracted `text`; the
per-row invariant (BASELINE.json input_hint) is that this extractor's output
is byte-identical to `text` for every url.

Extraction rule: take the <body> inner HTML (whole document if no body tag),
strip all tags, HTML-unescape, and normalize runs of whitespace to single
spaces (strip ends). Pure function, safe inside Arrow-batched pandas UDFs.
"""

from __future__ import annotations

import html as _htmlmod
import re

_BODY_RE = re.compile(rb"<body[^>]*>(.*?)</body>", re.DOTALL | re.IGNORECASE)
_SCRIPT_RE = re.compile(
    rb"<(script|style)[^>]*>.*?</\1>", re.DOTALL | re.IGNORECASE
)
_TAG_RE = re.compile(rb"<[^>]*>")


def extract_text(html_bytes: bytes | bytearray | memoryview | None) -> str:
    """Extract plain text from HTML bytes (UTF-8), whitespace-normalized."""
    if not html_bytes:
        return ""
    raw = bytes(html_bytes)
    m = _BODY_RE.search(raw)
    if m:
        raw = m.group(1)
    raw = _SCRIPT_RE.sub(b" ", raw)
    raw = _TAG_RE.sub(b" ", raw)
    text = raw.decode("utf-8", errors="replace")
    text = _htmlmod.unescape(text)
    return " ".join(text.split())
