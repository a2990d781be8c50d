# -*- coding: utf-8 -*-
"""Deterministic text-similarity kernel.

Replaces the reference's spaCy doc-vector cosine
(``calculate_similarity``, /root/reference/backend/kgapi/extractor.py:161-164)
with seed-free hashed character n-gram vectors: every string maps to a
64-dim count vector via crc32 bucketing of its unigrams + bigrams, and
similarity is the cosine of those vectors. Properties:

- deterministic across processes/machines (crc32, not Python ``hash``)
- no model files, no network
- strings sharing characters / bigrams (e.g. two org names both ending
  公司) score high; disjoint strings score 0

The reference's gating semantics are preserved downstream: emit a
co-occurrence edge iff similarity > 0.15, payload rounded to 2 dp
(extractor.py:147,153).
"""

from __future__ import annotations

import math
import zlib

DIM = 64
SIM_THRESHOLD = 0.15  # extractor.py:147


def _ngrams(text: str):
    for ch in text:
        yield ch
    for i in range(len(text) - 1):
        yield text[i : i + 2]


def text_vector(text: str) -> list[float]:
    """64-dim hashed unigram+bigram count vector (unnormalised)."""
    v = [0.0] * DIM
    for g in _ngrams(text):
        v[zlib.crc32(g.encode("utf-8")) % DIM] += 1.0
    return v


def cosine(v1: list[float], v2: list[float]) -> float:
    dot = sum(a * b for a, b in zip(v1, v2))
    n1 = math.sqrt(sum(a * a for a in v1))
    n2 = math.sqrt(sum(b * b for b in v2))
    if n1 == 0.0 or n2 == 0.0:
        return 0.0
    return dot / (n1 * n2)


def calculate_similarity(text1: str, text2: str) -> float:
    """Drop-in for the reference's spaCy-based similarity."""
    return cosine(text_vector(text1), text_vector(text2))
