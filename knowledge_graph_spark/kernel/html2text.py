# -*- coding: utf-8 -*-
"""Boilerplate-stripping HTML -> text extraction (trafilatura-style).

The reference repo has no HTML handling (its input is already-clean
text, /root/reference/backend/kgapi/extractor.py:79); the north-star
pipeline adds this stage for Common-Crawl-shaped pages. No HTML libs
ship in the sandbox, so this is a pure-regex implementation with a
pinned, deterministic contract:

1. drop <script>/<style>/<template>/<noscript> elements and comments
2. drop structural boilerplate containers: <nav> <header> <footer>
   <aside> and elements whose class/id contains nav/menu/footer/banner/
   sidebar/advert
3. block-level tags become newlines, all remaining tags are stripped
4. the five standard entities plus numeric charrefs are unescaped
5. whitespace canonicalisation: strip each line, drop empties, join
   with a single \\n

The contract is exact (not best-effort): the synthetic pages generator
(sources/pages.py) wraps clean text in boilerplate such that this
stripper recovers it byte-identically — the per-url invariant required
by BASELINE.json ("byte-identical extracted text per url"), enforced by
golden fixtures and run-twice tests.

Determinism: pure function of the input bytes; no models, no state.
"""

from __future__ import annotations

import re

_RE_DROP_ELEMENTS = re.compile(
    r"<(script|style|template|noscript|head)\b[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_RE_COMMENTS = re.compile(r"<!--.*?-->", re.DOTALL)
_RE_BOILERPLATE_TAGS = re.compile(
    r"<(nav|header|footer|aside)\b[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
# div/section/ul with boilerplate-ish class or id (non-nested contract)
_RE_BOILERPLATE_CLASS = re.compile(
    r"<(div|section|ul|span)\b[^>]*(?:class|id)\s*=\s*\"[^\"]*"
    r"(?:nav|menu|footer|banner|sidebar|advert|cookie|breadcrumb)[^\"]*\"[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_RE_BLOCK_TAGS = re.compile(
    r"</?(?:p|div|br|h[1-6]|li|ul|ol|table|tr|td|th|section|article|"
    r"blockquote|pre|main|body|html|head|title|meta|link|figure|figcaption)\b[^>]*/?>",
    re.IGNORECASE,
)
_RE_ANY_TAG = re.compile(r"<[^>]+>")
_RE_CHARREF = re.compile(r"&#(\d+);|&#x([0-9a-fA-F]+);")

_ENTITIES = [
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
    ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&"),  # &amp; last
]


def _unescape(text: str) -> str:
    def charref(m: re.Match) -> str:
        code = int(m.group(1)) if m.group(1) else int(m.group(2), 16)
        try:
            return chr(code)
        except (ValueError, OverflowError):
            return ""
    text = _RE_CHARREF.sub(charref, text)
    for ent, ch in _ENTITIES:
        text = text.replace(ent, ch)
    return text


def html_to_text(html: str | bytes | None) -> str:
    """Strip boilerplate and markup; deterministic and total."""
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    s = _RE_COMMENTS.sub("", html)
    s = _RE_DROP_ELEMENTS.sub("", s)
    s = _RE_BOILERPLATE_TAGS.sub("", s)
    s = _RE_BOILERPLATE_CLASS.sub("", s)
    s = _RE_BLOCK_TAGS.sub("\n", s)
    s = _RE_ANY_TAG.sub("", s)
    s = _unescape(s)
    lines = [ln.strip() for ln in s.split("\n")]
    return "\n".join(ln for ln in lines if ln)
