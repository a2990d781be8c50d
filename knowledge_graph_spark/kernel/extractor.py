# -*- coding: utf-8 -*-
"""Triple-extraction kernel: text -> {entities, relations}.

A from-scratch, deterministic reimplementation of the reference
extraction contract (/root/reference/backend/kgapi/extractor.py:79-156),
designed to run vectorised inside Spark pandas UDFs (see
``operators/extraction.py``). Per-operator parity map (SURVEY.md §2.2):

- E1  tokenize/tag/sents   -> kernel/tokenizer.py (rule cascade)
- E2  rule entity matcher  -> :func:`_matcher_entities` (ORG/PRODUCT/TITLE
      patterns, vocab verbatim from extractor.py:44-60)
- E3  overlap suppression  -> :func:`_add_span` (token-level overlap check;
      model entities registered first, mirrors extractor.py:62-75)
- E4  id assignment        -> enumerate spans sorted by start; id = "e{i+1}"
      (extractor.py:88-99)
- E5  label canonicalization -> ENTITY_MAPPING.get(label, label)
      (extractor.py:89)
- E6  SVO relations        -> per VERB not in STOP_VERBS, first subj /
      first obj (extractor.py:102-120); "first child" realised as the
      nearest eligible noun by the shallow-dependency heuristic below
- E7  prep->pobj relation  -> pre-verbal PP object, emitted when
      (no obj or prep_obj != obj) (extractor.py:107,122-131)
- E8  token->entity resolution -> entity_map lookup (extractor.py:112-113)
- E9  sentence co-occurrence   -> unordered different-type pairs not
      already related (extractor.py:133-145)
- E10 similarity gate      -> hashed-ngram cosine > 0.15, round 2
      (extractor.py:146-154; spaCy vectors replaced, see similarity.py)
- E11 assembly             -> {"entities": [...], "relations": [...]}

Dead ``iobj`` extraction (extractor.py:106) intentionally not
implemented — it has no observable effect in the reference
(SURVEY.md §7.4). Shallow-dependency heuristic (stand-in for the spaCy
parser, no model in sandbox): for a verb v within its sentence,

- noun phrases are walked as CHAINS: adjacent nouns, attributive
  的-links (北京的人工智能公司) and quote-wrapped appositive names
  (科技巨头“未来科技”) form one NP whose head is the rightmost
  entity-mapped noun — the stand-in for the dep-tree head,
- subj  = head of the nearest left NP chain not governed by a
  preposition (chain start not ADP-preceded); a non-entity head is
  kept as fallback while the scan continues looking for an
  entity-headed NP; if the clause (bounded by 、，：) yields no entity
  subject, the scan crosses the clause boundary accepting only
  Person/Organization entities (long-distance nsubj recovery),
- obj   = nearest right noun outside any PP, before the next verb or
  clause punct; when the post-verbal region is one ADP-opened chain
  running to the clause edge (开发基于X的Y), the chain's FINAL noun is
  the object and earlier nouns stay prepositional,
- prep_obj = head of the nearest pre-verbal ADP-governed NP chain
  ("A 与 B 达成 X" -> B); if none, the post-verbal PP's
  entity-preferred noun (宣布与...“未来科技”达成 -> 未来科技).

All state is row-local: the output is a pure function of the input
string, hence byte-stable under any Spark repartitioning.
"""

from __future__ import annotations

from .similarity import SIM_THRESHOLD, calculate_similarity
from .tokenizer import Doc, Token, tokenize
from . import vocab as V

_NOUNish = ("NOUN", "PROPN")
_CLAUSE_PUNCT = set("，、：,;")
_QUOTE_PUNCT = set("“”「」『』\"'‘’")
# quantity/time entity types: valid objects, but deferred as subjects —
# an agent NP further left wins (dep parsers attach nsubj to the agent)
_QUANT_TYPES = {"DATE", "MONEY", "TIME", "PERCENT", "Number"}


def _np_chain(toks, sent_start: int, k: int, entity_map: dict):
    """Walk left from the noun at ``k`` through one NP chain: adjacent
    nouns, attributive 的-links, quote-wrapped appositive names.
    Returns (chain_start, head): head = rightmost entity-mapped noun in
    the chain (the dep head this shallow heuristic stands in for),
    falling back to ``k`` itself."""
    nouns = [k]
    j = k - 1
    while j >= sent_start:
        t = toks[j]
        prev_nounish = j - 1 >= sent_start and (
            toks[j - 1].pos in _NOUNish
            or (toks[j - 1].pos == "PUNCT" and toks[j - 1].text in _QUOTE_PUNCT)
        )
        if t.pos in _NOUNish:
            nouns.append(j)
            j -= 1
        elif t.pos == "PART" and t.text == "的" and j - 1 >= sent_start \
                and toks[j - 1].pos in _NOUNish:
            j -= 1
        elif t.pos == "PUNCT" and t.text in _QUOTE_PUNCT and prev_nounish:
            j -= 1
        else:
            break
    head = next((i for i in nouns if i in entity_map), k)
    return j + 1, head


def _model_entities(doc: Doc) -> list[tuple[int, int, str]]:
    """Model-NER stand-in: spans (start_tok, end_tok_exclusive, label)
    from tokenizer hints (dates/money/percent/numbers, gazetteer GPEs,
    rule PERSONs, quoted + repeat-mention ORGs)."""
    spans = [(t.i, t.i + 1, t.ner) for t in doc.tokens if t.ner]
    spans.sort(key=lambda s: (s[0], s[1]))
    return spans


def _matcher_entities(doc: Doc) -> list[tuple[int, int, str]]:
    """Rule matcher pass (reference extractor.py:44-60): ORG suffix
    single-token; PRODUCT two-token (智能+X系统… / 新型+X技术…);
    TITLE two-token pairs. Emitted in document order per pattern scan."""
    from .tokenizer import _ORG_SUF2, _ORG_SUF3

    out: list[tuple[int, int, str]] = []
    toks = doc.tokens
    for t in toks:
        # suffix-set probes replace per-token endswith scans; semantics
        # identical: stem must be non-empty for the matched suffix
        L = len(t.text)
        if (L > 2 and t.text[-2:] in _ORG_SUF2) or \
                (L > 3 and t.text[-3:] in _ORG_SUF3):
            out.append((t.i, t.i + 1, "ORG"))
    for t in toks[:-1]:
        nxt = toks[t.i + 1]
        if t.text == "智能" and nxt.text.endswith(V.PRODUCT_SUFFIXES_SMART) and len(nxt.text) > 2:
            out.append((t.i, t.i + 2, "PRODUCT"))
        if t.text == "新型" and nxt.text.endswith(V.PRODUCT_SUFFIXES_NEW) and len(nxt.text) > 2:
            out.append((t.i, t.i + 2, "PRODUCT"))
        if t.text in V.TITLE_FIRST and nxt.text in V.TITLE_SECOND:
            out.append((t.i, t.i + 2, "TITLE"))
    out.sort(key=lambda s: (s[0], s[1]))
    return out


def _add_span(spans: list[tuple[int, int, str]], covered: set[int],
              cand: tuple[int, int, str]) -> None:
    """Overlap suppression (reference add_ent, extractor.py:62-75): a
    candidate is added only if none of its tokens overlaps an existing
    entity; earlier-registered entities take precedence."""
    s, e, label = cand
    if any(i in covered for i in range(s, e)):
        return
    spans.append(cand)
    covered.update(range(s, e))


def _span_text(doc: Doc, s: int, e: int) -> str:
    """Surface text of a token span, reconstructed from char offsets."""
    first, last = doc.tokens[s], doc.tokens[e - 1]
    return doc.text[first.idx : last.idx + len(last.text)]


def extract_entities_relations(text: str) -> dict:
    """text -> {"entities": [...], "relations": [...]}; reference
    signature extractor.py:79. Pure and deterministic."""
    if not text:
        return {"entities": [], "relations": []}
    doc = tokenize(text)
    toks = doc.tokens

    # entity registration: model entities first, then matcher patterns,
    # both with token-overlap suppression (precedence per extractor.py:62-75)
    spans: list[tuple[int, int, str]] = []
    covered: set[int] = set()
    for cand in _model_entities(doc):
        _add_span(spans, covered, cand)
    for cand in _matcher_entities(doc):
        _add_span(spans, covered, cand)
    spans.sort(key=lambda s: (s[0], s[1]))  # doc.ents order = by start

    entities: list[dict] = []
    entity_map: dict[int, str] = {}
    for i, (s, e, label) in enumerate(spans):
        ent_type = V.ENTITY_MAPPING.get(label, label)  # E5
        entity_id = f"e{i + 1}"
        entities.append({
            "id": entity_id,
            "name": _span_text(doc, s, e),
            "type": ent_type,
            "start": s,
            "end": e,
        })
        for token_idx in range(s, e):
            entity_map[token_idx] = entity_id

    # token -> canonical entity type (for the Person/Org-only
    # long-distance subject recovery below)
    ent_type_at: dict[int, str] = {}
    for ent in entities:
        for token_idx in range(ent["start"], ent["end"]):
            ent_type_at[token_idx] = ent["type"]

    # E6/E7: verb-anchored relations via the shallow-dependency heuristic
    relations: list[dict] = []
    for sent in doc.sents:
        for v in range(sent.start, sent.end):
            tok = toks[v]
            if tok.pos != "VERB" or tok.text in V.STOP_VERBS:
                continue
            subj_i = obj_i = prep_i = None
            clause_stop = None
            # left scan: nearest non-PP NP head = subj (entity-preferred),
            # nearest ADP-governed NP head = prep_obj; NP chains walk
            # 的-links and quoted appositives (科技巨头“未来科技”)
            k = v - 1
            while k >= sent.start:
                t = toks[k]
                if t.pos == "PUNCT" and t.text in _CLAUSE_PUNCT:
                    clause_stop = k
                    break
                if t.pos in _NOUNish:
                    start, head = _np_chain(toks, sent.start, k, entity_map)
                    before = toks[start - 1] if start - 1 >= sent.start else None
                    if before is not None and before.pos == "ADP":
                        if prep_i is None:
                            prep_i = head
                        k = start - 2  # skip past the ADP
                        continue
                    if head in entity_map and ent_type_at.get(head) not in _QUANT_TYPES:
                        subj_i = head
                        break
                    if subj_i is None or (
                        subj_i not in entity_map and head in entity_map
                    ):
                        # quantity entities (投资3亿元用于建设…) and
                        # non-entity nouns are subject FALLBACKS only —
                        # keep scanning for an agent NP
                        subj_i = head
                    k = start - 1
                    continue
                k -= 1
            # long-distance nsubj recovery: the clause had no entity
            # subject (双方将共同投资…) — cross the clause boundary for
            # the nearest Person/Organization entity (agents only;
            # DATE/MONEY/GPE make no sense as recovered subjects)
            if clause_stop is not None and (
                subj_i is None or subj_i not in entity_map
                or ent_type_at.get(subj_i) in _QUANT_TYPES
            ):
                j = clause_stop - 1
                while j >= sent.start:
                    if toks[j].pos in _NOUNish and ent_type_at.get(j) in (
                        "Person", "Organization"
                    ):
                        subj_i = j
                        break
                    j -= 1
            # right scan: nearest noun OUTSIDE any PP = obj; an
            # ADP-opened chain that runs to the clause edge yields its
            # final noun as obj (开发基于X的Y); a chain cut off by the
            # next verb stays fully prepositional (宣布与…“未来科技”达成)
            pp_nouns: list[int] = []
            pp_active = False
            hit_verb = False
            k = v + 1
            while k < sent.end:
                t = toks[k]
                if t.pos == "VERB":
                    hit_verb = True
                    break
                if t.pos == "PUNCT" and t.text in _CLAUSE_PUNCT:
                    break
                if t.pos == "ADP":
                    pp_active = True
                elif t.pos in _NOUNish:
                    if pp_active:
                        pp_nouns.append(k)
                    else:
                        obj_i = k
                        break
                k += 1
            if obj_i is None and pp_nouns and not hit_verb:
                obj_i = pp_nouns.pop()
            if prep_i is None and pp_nouns:
                prep_i = next(
                    (i for i in reversed(pp_nouns) if i in entity_map),
                    pp_nouns[-1],
                )

            rel_type = V.VERB_RELATION_MAP.get(tok.text, tok.text)
            if subj_i is not None and obj_i is not None:
                subj_ent = entity_map.get(subj_i)   # E8
                obj_ent = entity_map.get(obj_i)
                if subj_ent and obj_ent:
                    relations.append({
                        "source": subj_ent,
                        "target": obj_ent,
                        "type": rel_type,
                        "verb": tok.text,
                    })
            if subj_i is not None and prep_i is not None and (
                obj_i is None or prep_i != obj_i
            ):
                subj_ent = entity_map.get(subj_i)
                prep_ent = entity_map.get(prep_i)
                if subj_ent and prep_ent:
                    relations.append({
                        "source": subj_ent,
                        "target": prep_ent,
                        "type": rel_type,
                        "verb": tok.text,
                    })

    # E9/E10: sentence-scoped co-occurrence with similarity gate
    for si, sent in enumerate(doc.sents):
        sent_entities = [
            ent for ent in entities
            if ent["start"] < len(doc) and sent.start <= ent["start"] < sent.end
        ]
        if len(sent_entities) >= 2:
            for i in range(len(sent_entities)):
                for j in range(i + 1, len(sent_entities)):
                    if sent_entities[i]["type"] == sent_entities[j]["type"]:
                        continue
                    has_relation = any(
                        (r["source"] == sent_entities[i]["id"] and r["target"] == sent_entities[j]["id"])
                        or (r["source"] == sent_entities[j]["id"] and r["target"] == sent_entities[i]["id"])
                        for r in relations
                    )
                    if not has_relation:
                        similarity = calculate_similarity(
                            sent_entities[i]["name"], sent_entities[j]["name"]
                        )
                        if similarity > SIM_THRESHOLD:
                            relations.append({
                                "source": sent_entities[i]["id"],
                                "target": sent_entities[j]["id"],
                                "type": "co-occurrence",
                                "verb": "同现",
                                "similarity": round(similarity, 2),
                            })

    return {"entities": entities, "relations": relations}


def triples(result: dict, keep_co_occurrence: bool = True) -> list[dict]:
    """Resolve relation endpoints to entity names — the (subj, pred, obj)
    verification unit, rendering per reference extractor.py:178-185."""
    by_id = {e["id"]: e for e in result["entities"]}
    out = []
    for rel in result["relations"]:
        if not keep_co_occurrence and rel["type"] == "co-occurrence":
            continue
        s, t = by_id.get(rel["source"]), by_id.get(rel["target"])
        if s and t:
            out.append({"subj": s["name"], "pred": rel["type"], "obj": t["name"]})
    return out
