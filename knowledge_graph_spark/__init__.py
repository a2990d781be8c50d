# -*- coding: utf-8 -*-
"""knowledge_graph_spark — a from-scratch, PySpark-native knowledge-graph
construction and update engine with the query/data-processing
capabilities of the reference repo ``TananRR/Knowledge_Graph``.

Layout:
- ``kernel/``     pure-Python extraction kernel (tokenize/NER/SVO/co-occ)
- ``operators/``  Spark operators: extraction, graph build, queries,
                  dedup, similarity search, text analysis, linking,
                  connected components, multimodal plumbing
- ``sources/``    synthetic pages generator + LakeTable snapshot/merge layer
- ``functions/``  reusable column expressions (cosine, minhash, ...)
- ``streaming/``  incremental/streaming pipeline pieces
"""

__version__ = "0.1.0"
