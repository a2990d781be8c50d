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
# div/section/ul with boilerplate-ish class or id (non-nested
# contract). The attribute NAME is anchored on whitespace — without
# it, 'id' matched as a substring of data-testid/aria-describedby and
# whole CONTENT divs were silently deleted. Values match in double
# quotes, single quotes, or unquoted (all legal HTML).
_BP_WORDS = r"(?:nav|menu|footer|banner|sidebar|advert|cookie|breadcrumb)"
_RE_BOILERPLATE_CLASS = re.compile(
    r"<(div|section|ul|span)\b[^>]*\s(?:class|id)\s*=\s*"
    r"(?:\"[^\"]*" + _BP_WORDS + r"[^\"]*\""
    r"|'[^']*" + _BP_WORDS + r"[^']*'"
    r"|[^\s>\"']*" + _BP_WORDS + r"[^\s>]*)"
    r"[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_RE_BLOCK_TAGS = re.compile(
    r"</?(?:p|div|br|h[1-6]|li|ul|ol|table|tr|td|th|section|article|"
    r"blockquote|pre|main|body|html|head|title|meta|link|figure|figcaption)\b[^>]*/?>",
    re.IGNORECASE,
)
_RE_ANY_TAG = re.compile(r"<[^>]+>")
# ONE left-to-right pass over numeric charrefs (decimal + hex, either
# X case — HTML permits '&#X41;') AND the five named entities: the old
# two-pass form decoded '&#38;' -> '&' FIRST, and the synthesized
# '&amp;'/'&lt;' then got re-interpreted by the named-entity pass —
# double-unescaping that broke the byte-identical contract. re.sub
# never rescans its own replacements, so the single pass is exact.
_RE_ENTITY = re.compile(
    r"&#(\d+);|&#[xX]([0-9a-fA-F]+);|&(lt|gt|quot|amp|nbsp);")

_NAMED = {"lt": "<", "gt": ">", "quot": '"', "amp": "&", "nbsp": " "}


def _unescape(text: str) -> str:
    def rep(m: re.Match) -> str:
        if m.group(3):
            return _NAMED[m.group(3)]
        code = int(m.group(1)) if m.group(1) else int(m.group(2), 16)
        try:
            return chr(code)
        except (ValueError, OverflowError):
            return ""
    return _RE_ENTITY.sub(rep, text)


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
