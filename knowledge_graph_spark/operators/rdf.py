# -*- coding: utf-8 -*-
"""RDF N-Triples serialization — the KG interchange sink.

A knowledge-graph construction pipeline's materialized edges need a
lingua-franca export: N-Triples (W3C RDF 1.1, the line-oriented
format every triple store and RDF toolchain bulk-loads) is the
canonical choice at crawl scale because it is splittable — one triple
per line, no document state — so a 100 TB edge set serializes and
re-parses embarrassingly parallel.

Not in the reference (its sink is a Neo4j-style property graph +
JSON documents); the format and escaping rules are the public W3C
N-Triples 1.1 grammar. IRI minting follows the DBpedia resource-
naming convention (Lehmann et al. 2015): label → slug under a base
namespace, whitespace runs to ``_``.

Scale shape: pure row-local codegen — a chain of ``regexp_replace``
and ``concat`` expressions, zero exchanges, zero UDFs. The emitted
``line`` column is the file payload; writers partition however the
caller likes because lines are self-contained.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: characters N-Triples forbids inside an IRI (RDF 1.1 grammar
#: IRIREF: no control chars, space, <>"{}|^` or backslash). The slug
#: rule first folds whitespace runs to '_', then DROPS remaining
#: forbidden chars (declared lossy minting, DBpedia-style — the
#: original label stays available on the row).
_IRI_FORBIDDEN = r'[\x00-\x20<>"{}|^`\\]'


def _iri_slug(col):
    return F.regexp_replace(
        F.regexp_replace(F.trim(col), r"\s+", "_"),
        _IRI_FORBIDDEN, "")


def _literal_escape(col):
    # ORDER MATTERS: backslash first, then quote, then the control
    # trio — each as a literal (non-regex) replace so no engine's
    # regex dialect can diverge on it.
    c = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    c = F.replace(c, F.lit('"'), F.lit('\\"'))
    c = F.replace(c, F.lit("\n"), F.lit("\\n"))
    c = F.replace(c, F.lit("\r"), F.lit("\\r"))
    return F.replace(c, F.lit("\t"), F.lit("\\t"))


def to_ntriples(triples: DataFrame, subj_col: str = "subj",
                pred_col: str = "pred", obj_col: str = "obj",
                base: str = "http://kg.example/resource/",
                pred_base: str = "http://kg.example/prop/") -> DataFrame:
    """Serialize ``(subj, pred, obj)`` rows to N-Triples lines.

    Subjects and predicates mint IRIs (``<base><slug>``); objects are
    emitted as plain string literals with the full RDF 1.1 ECHAR
    escape set (``\\`` ``"`` newline CR tab). Rows whose subject or
    predicate slugs to the empty string, or whose object is NULL, are
    dropped (unserializable). Returns the input key columns plus
    ``line``; byte-exact output is the contract — the SQL oracle
    reproduces every line verbatim.
    """
    s = _iri_slug(F.col(subj_col))
    p = _iri_slug(F.col(pred_col))
    line = F.concat(
        F.lit("<" + base), s, F.lit("> <" + pred_base), p,
        F.lit('> "'), _literal_escape(F.col(obj_col)), F.lit('" .'))
    return (triples
            .filter((s != "") & (p != "") & F.col(obj_col).isNotNull())
            .select(F.col(subj_col).alias("subj"),
                    F.col(pred_col).alias("pred"),
                    F.col(obj_col).alias("obj"),
                    line.alias("line")))
