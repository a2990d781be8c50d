# -*- coding: utf-8 -*-
"""Text normalization: the canonical spelling step for TEXT, the way
:mod:`..operators.urls` is for urls.

Every content-keyed stage downstream — exact dedup hashes, MinHash
shingles, fingerprints, decontamination grams — is only as stable as
the text it hashes: a trailing space, a Windows newline, a zero-width
joiner, or a fancy quote makes two identical documents hash apart.
Production pipelines (C4, CCNet, RefinedWeb) all normalize before
hashing; this is that step, expressed as pure codegen column
expressions so it is free at any scale and exactly replayable by a
SQL oracle.

Rules (each independent and declared):

- strip C0/C1 control characters except ``\\t`` and ``\\n`` (they
  carry no text and break downstream regex tokenizers);
- normalize line endings (``\\r\\n`` / ``\\r`` → ``\\n``);
- map the common unicode punctuation look-alikes to ASCII: curly
  single/double quotes → ``'``/``"``, en/em dash and minus sign →
  ``-``, NBSP and the unicode space family → plain space, zero-width
  (ZWSP/ZWNJ/ZWJ/BOM) removed;
- collapse runs of spaces/tabs to one space, collapse ≥3 newlines to
  two (paragraph break), trim each line's trailing spaces, trim the
  ends.

Full NFKC is deliberately NOT applied: it also folds width, case,
and compatibility forms (²→2, ﬁ→fi) that change TOKENS, which a
fingerprint pipeline may legitimately want preserved — callers wanting
NFKC apply it upstream where its lossiness is a choice, not a default.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# unicode space family (Zs members commonly seen in crawls) -> ' ':
# NBSP, ogham space mark, en-quad..hair-space range, narrow NBSP,
# medium mathematical space, ideographic space
_UNI_SPACES = "\u00A0\u1680\u2000-\u200A\u202F\u205F\u3000"
# zero-width characters -> removed: ZWSP, ZWNJ, ZWJ, BOM
_ZERO_WIDTH = "\u200B\u200C\u200D\uFEFF"


def normalize_text(col) -> Column:
    """The normalized text (see module rules). Pure codegen; NULL in,
    NULL out."""
    c = F.col(col) if isinstance(col, str) else col
    # line endings first so the control strip can keep \n only
    c = F.regexp_replace(c, r"\r\n?", "\n")
    c = F.regexp_replace(c, r"[\x00-\x08\x0B-\x1F\x7F-\x9F]", "")
    c = F.regexp_replace(c, f"[{_ZERO_WIDTH}]", "")
    c = F.regexp_replace(c, "[\u2018\u2019\u201A\u201B]", "'")
    c = F.regexp_replace(c, '[\u201C\u201D\u201E\u201F]', '"')
    c = F.regexp_replace(c, "[\u2012\u2013\u2014\u2015\u2212]", "-")
    c = F.regexp_replace(c, f"[{_UNI_SPACES}]", " ")
    c = F.regexp_replace(c, r"[ \t]+", " ")
    c = F.regexp_replace(c, r" ?\n ?", "\n")
    c = F.regexp_replace(c, r"\n{3,}", "\n\n")
    return F.trim(c)
