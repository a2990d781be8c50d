# -*- coding: utf-8 -*-
"""Pure-Python extraction kernel (no Spark dependency).

Deterministic, row-local, model-free reimplementation of the reference
extraction contract (/root/reference/backend/kgapi/extractor.py). Unit-
testable in plain Python/pandas; wrapped for Spark by
``knowledge_graph_spark.operators.extraction``.
"""

from .extractor import extract_entities_relations, triples  # noqa: F401
from .similarity import calculate_similarity  # noqa: F401
from .tokenizer import tokenize  # noqa: F401
