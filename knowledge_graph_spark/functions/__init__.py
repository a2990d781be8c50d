# -*- coding: utf-8 -*-
from .vectors import char_ngrams, cosine, dot, l2_sq, norm, word_ngrams, word_tokens  # noqa: F401
