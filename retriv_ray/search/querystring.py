"""Lucene-style query-string retrieval.

The reference engine exposes plain-text queries only
(retriv/sparse_retriever/sparse_retriever.py:274-307); this module adds
the search-server surface every Lucene/Elasticsearch user expects — a
single string combining boolean structure with every term type the
engine already serves:

    table AND (scan OR join) AND NOT spark
    "big data" AND window
    qu* AND tabel~1
    n_chars:[200 TO 600] AND merge

Grammar (a deliberate Lucene ``query_string`` subset, documented
precedence NOT > AND > OR, adjacency = AND):

    expr     := and_expr (OR and_expr)*
    and_expr := unary (AND? unary)*
    unary    := (NOT | '-') unary | primary
    primary  := ('(' expr ')' | leaf) ('^' number)?   (query-time boost)
    leaf     := "quoted phrase"            (positional-index phrase)
              | field:value                (metadata keyword/bool/number)
              | field:[lo TO hi]           (metadata numeric range, incl.)
              | word*                      (prefix / wildcard expansion)
              | word~d                     (fuzzy, Levenshtein <= d)
              | word                       (vocabulary term)

Semantics (SQL-oracle-checked by the ``query_string`` driver query):

- The boolean structure selects the CANDIDATE doc set: term leaves match
  their postings, phrase leaves the positional index, prefix/fuzzy
  leaves the union of their expansion postings, field leaves the
  metadata filter ids. AND intersects, OR unions, NOT complements
  (inside an AND it is a sorted difference; a negation with no positive
  sibling falls back to a complement over the shard's doc range —
  O(local docs), the Lucene MatchAll-rewrite, documented cost).
- SCORING is BM25 (the engine's exact kernel) over every *positive*
  scoring leaf — term tokens, phrase component tokens, prefix/fuzzy
  expansion terms with their own collection statistics — restricted to
  the candidate set via the kernel subset path (J4). Negated and
  field-filter leaves never score (Lucene filter-context). The
  strict-positive top-k contract (K1) applies: a candidate containing
  none of the scoring terms scores 0 and is not returned.
- Bare terms run through the retriever's preprocessing pipeline (a
  multi-token split scores every token; a term the pipeline drops, e.g.
  a stopword, is neutral — it constrains nothing, exactly Lucene's
  analyzer-dropped-clause behavior). Wildcard/fuzzy patterns are NOT
  analyzed (Lucene multi-term query behavior).
- BOOSTS (``term^2``, ``"phrase"^0.5``, ``(a OR b)^3``) multiply the
  enclosed scoring terms' BM25 contributions; nested boosts multiply.
  Candidates are unaffected (a boost never changes what matches). The
  scoring-term set is deduplicated, so when the same term appears in
  several positive contexts the LARGEST effective boost wins
  (documented divergence from Lucene's duplicate-scorer addition — an
  edge nobody writes on purpose). Boosting a field filter is a no-op
  (filter context never scores).
- SYNONYMS (``synonyms={"big": ["large", "huge"]}``) expand an
  analyzed term leaf into the union of the group's postings, each
  matched term scored with its OWN collection statistics — the
  Elasticsearch ``synonym`` filter model. Synonym strings are used
  verbatim (not re-analyzed).

Scale notes: every leaf resolves through part-routed structures already
sized for sharded serving — postings via ``LoadedIndex.get_postings``
(segment reads + LRU), expansions via the resident sorted term
dictionary (``prefix_terms``/``fuzzy_terms``), phrases via the
positional index's per-part segments, metadata via the doc-range-sliced
``MetadataIndex``. Set algebra is numpy over ascending id arrays. For
query batches, wrap :func:`query_string_search` in the
``msearch_ds`` worker-cached actor pattern (see
``search/fuzzy.py:fuzzy_msearch_ds``); per-query cost is identical.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa

from retriv_ray.search.kernel import (
    diff_sorted,
    intersect_sorted_multi,
    union_sorted_multi,
)

# --------------------------------------------------------------------------
# parsing
# --------------------------------------------------------------------------

# order matters: quoted phrase, field:[lo TO hi] (value may hold spaces),
# parens, bare token
_TOKEN_RE = re.compile(
    r'"[^"]*"'
    r"|[^\s()\"]+:\[[^\]]*\]"
    r"|\("
    r"|\)"
    r'|[^\s()"]+'
)
_FIELD_RE = re.compile(r"^([A-Za-z_][A-Za-z0-9_]*):(.+)$", re.S)
_RANGE_RE = re.compile(r"^\[\s*(\S+)\s+TO\s+(\S+)\s*\]$")
_FUZZY_RE = re.compile(r"^(.+?)~(\d+)$")
_BOOST_RE = re.compile(r"^(.+?)\^(\d+(?:\.\d+)?)$")
_BOOST_TOK_RE = re.compile(r"^\^(\d+(?:\.\d+)?)$")  # postfix after ")" / '"..."'


class QueryStringError(ValueError):
    pass


def _classify(tok: str):
    """One bare token -> leaf node."""
    if tok.startswith('"') and tok.endswith('"') and len(tok) >= 2:
        inner = tok[1:-1].strip()
        if not inner:
            raise QueryStringError("empty phrase")
        return ("phrase", inner)
    if tok.startswith("-") and len(tok) > 1:
        return ("not", _classify(tok[1:]))
    m = _BOOST_RE.match(tok)
    if m:
        return ("boost", float(m.group(2)), _classify(m.group(1)))
    m = _FIELD_RE.match(tok)
    if m:
        field, value = m.group(1), m.group(2)
        rng = _RANGE_RE.match(value)
        if rng:
            return ("field_range", field, _num(rng.group(1)), _num(rng.group(2)))
        return ("field_eq", field, value)
    m = _FUZZY_RE.match(tok)
    if m:
        return ("fuzzy", m.group(1), int(m.group(2)))
    if tok.endswith("*") and len(tok) > 1 and "*" not in tok[:-1]:
        return ("prefix", tok[:-1])
    if "*" in tok:
        raise QueryStringError(f"only trailing-* wildcards are supported: {tok!r}")
    return ("term", tok)


def _num(s: str):
    try:
        return int(s)
    except ValueError:
        return float(s)


def parse_query_string(qs: str):
    """Parse to an AST of nested tuples; raises QueryStringError on
    malformed input (unbalanced parens, dangling operators)."""
    toks = _TOKEN_RE.findall(qs)
    if not toks:
        raise QueryStringError("empty query string")
    pos = [0]

    def peek():
        return toks[pos[0]] if pos[0] < len(toks) else None

    def advance():
        pos[0] += 1

    def parse_or():
        children = [parse_and()]
        while peek() in ("OR", "||"):
            advance()
            children.append(parse_and())
        return children[0] if len(children) == 1 else ("or", children)

    def parse_and():
        children = [parse_unary()]
        while True:
            nxt = peek()
            if nxt in ("AND", "&&"):
                advance()
                children.append(parse_unary())
            elif nxt is not None and nxt not in ("OR", "||", ")"):
                children.append(parse_unary())  # adjacency = AND
            else:
                break
        return children[0] if len(children) == 1 else ("and", children)

    def parse_unary():
        nxt = peek()
        if nxt is None:
            raise QueryStringError("dangling operator")
        if nxt in ("NOT", "!"):
            advance()
            return ("not", parse_unary())
        return parse_primary()

    def parse_primary():
        nxt = peek()
        if nxt is None:
            raise QueryStringError("unexpected end of query")
        if nxt == "(":
            advance()
            node = parse_or()
            if peek() != ")":
                raise QueryStringError("unbalanced parentheses")
            advance()
        elif nxt == ")":
            raise QueryStringError("unbalanced parentheses")
        elif nxt in ("AND", "OR", "&&", "||"):
            raise QueryStringError(f"dangling operator {nxt}")
        else:
            advance()
            node = _classify(nxt)
        # postfix boost lexed as its own token: ("..." or parens group)^n
        nxt = peek()
        if nxt is not None:
            m = _BOOST_TOK_RE.match(nxt)
            if m:
                advance()
                node = ("boost", float(m.group(1)), node)
        return node

    node = parse_or()
    if pos[0] != len(toks):
        raise QueryStringError("unbalanced parentheses")
    return node


# --------------------------------------------------------------------------
# lowering: preprocess terms, expand multi-term leaves
# --------------------------------------------------------------------------

_NEUTRAL = ("neutral",)


def _lower(node, retriever, synonyms=None):
    """Resolve analyzer-dependent leaves: term -> pipeline tokens
    (('terms', [tok, ...]) or neutral; synonym-mapped tokens become
    per-token expansion groups), prefix/fuzzy -> concrete vocabulary
    expansions (('expansion', [term, ...]))."""
    kind = node[0]
    if kind == "term":
        toks = retriever.pre.tokens(node[1])
        if not toks:
            return _NEUTRAL
        if synonyms:
            groups = [
                ("expansion", sorted({t, *synonyms[t]}))
                if t in synonyms
                else ("terms", [t])
                for t in toks
            ]
            return groups[0] if len(groups) == 1 else ("and", groups)
        return ("terms", toks)
    if kind == "phrase":
        toks = retriever.pre.tokens(node[1])
        if not toks:
            return _NEUTRAL
        return ("phrase_toks", toks)
    if kind == "prefix":
        from retriv_ray.search.prefix import prefix_terms

        return ("expansion", prefix_terms(retriever.index.term_df, node[1]))
    if kind == "fuzzy":
        from retriv_ray.search.fuzzy import fuzzy_terms

        return (
            "expansion",
            fuzzy_terms(retriever.index.term_df, node[1], node[2]),
        )
    if kind == "not":
        child = _lower(node[1], retriever, synonyms)
        return _NEUTRAL if child is _NEUTRAL else ("not", child)
    if kind == "boost":
        child = _lower(node[2], retriever, synonyms)
        return _NEUTRAL if child is _NEUTRAL else ("boost", node[1], child)
    if kind in ("and", "or"):
        kids = [_lower(c, retriever, synonyms) for c in node[1]]
        kids = [k for k in kids if k is not _NEUTRAL]
        if not kids:
            return _NEUTRAL
        return kids[0] if len(kids) == 1 else (kind, kids)
    return node  # field_eq / field_range


def _scoring_terms(node, vocab, out: Dict[str, float], mult: float = 1.0) -> None:
    """Positive-context scoring terms -> effective boost (max wins on
    duplicates), in first-appearance order (dict preserves insertion)."""
    kind = node[0]
    if kind == "terms" or kind == "phrase_toks" or kind == "expansion":
        for t in node[1]:
            if t in vocab:
                out[t] = max(out.get(t, 0.0), mult)
    elif kind == "boost":
        _scoring_terms(node[2], vocab, out, mult * node[1])
    elif kind in ("and", "or"):
        for c in node[1]:
            _scoring_terms(c, vocab, out, mult)
    # 'not' subtree and field filters never score


# --------------------------------------------------------------------------
# candidate evaluation
# --------------------------------------------------------------------------


def _field_ids(retriever, node) -> np.ndarray:
    try:
        meta = retriever.metadata
    except FileNotFoundError as e:
        raise QueryStringError(
            "field filter used but the index has no metadata sidecar"
        ) from e
    if node[0] == "field_range":
        ids = meta.filter_doc_ids(
            field=node[1],
            clause="must",
            value=[node[2], node[3]],
            operator="between",
        )
    else:
        field, value = node[1], node[2]
        kind = meta.schema.get(field)
        if kind is None:
            raise QueryStringError(f"unknown metadata field {field!r}")
        if kind == "number":
            ids = meta.filter_doc_ids(
                field=field, clause="must", value=_num(value), operator="eq"
            )
        elif kind == "bool":
            ids = meta.filter_doc_ids(
                field=field, clause="must", value=value.lower() == "true"
            )
        else:
            ids = meta.filter_doc_ids(
                field=field, clause="must", value=value, raise_error=False
            )
    return np.asarray(ids, dtype=np.int64)


def _eval(node, retriever, positional) -> np.ndarray:
    """Sorted unique int64 candidate doc ids for one AST node."""
    kind = node[0]
    idx = retriever.index
    if kind == "terms":
        posts = [idx.get_postings(t)[0] for t in node[1]]
        posts.sort(key=len)
        return intersect_sorted_multi(posts)
    if kind == "expansion":
        if not node[1]:
            return np.empty(0, dtype=np.int64)
        return union_sorted_multi([idx.get_postings(t)[0] for t in node[1]])
    if kind == "phrase_toks":
        if positional is None:
            raise QueryStringError(
                "phrase query requires a positional index (pass positional=)"
            )
        ids, _n_occ = positional.phrase(node[1])
        return np.asarray(ids, dtype=np.int64)
    if kind in ("field_eq", "field_range"):
        return _field_ids(retriever, node)
    if kind == "and":
        pos_sets: List[np.ndarray] = []
        neg_sets: List[np.ndarray] = []
        for c in node[1]:
            if c[0] == "not":
                neg_sets.append(_eval(c[1], retriever, positional))
            else:
                pos_sets.append(_eval(c, retriever, positional))
        if pos_sets:
            pos_sets.sort(key=len)
            cand = intersect_sorted_multi(pos_sets)
        else:  # pure-negative conjunction: MatchAll rewrite, O(local docs)
            cand = np.arange(idx.local_count, dtype=np.int64)
        if len(cand) and neg_sets:
            cand = diff_sorted(cand, union_sorted_multi(neg_sets))
        return cand
    if kind == "or":
        return union_sorted_multi(
            [_eval(c, retriever, positional) for c in node[1]]
        )
    if kind == "not":  # top-level / OR-context negation: complement
        inner = _eval(node[1], retriever, positional)
        return diff_sorted(np.arange(idx.local_count, dtype=np.int64), inner)
    if kind == "boost":  # boosts never change the candidate set
        return _eval(node[2], retriever, positional)
    raise QueryStringError(f"unhandled node {kind}")


# --------------------------------------------------------------------------
# public API
# --------------------------------------------------------------------------


def query_string_search(
    retriever,
    qs: str,
    cutoff: int = 100,
    positional=None,
    synonyms: Optional[Dict[str, Sequence[str]]] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """(internal doc_ids ranked by (-score, doc_id), scores) for one
    query string against a RaySparseRetriever (+ optional
    PositionalIndex for phrase leaves; optional query-time synonym
    map for analyzed term leaves)."""
    ast = _lower(parse_query_string(qs), retriever, synonyms)
    if ast is _NEUTRAL:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    cand = _eval(ast, retriever, positional)
    term_boosts: Dict[str, float] = {}
    _scoring_terms(ast, retriever.index.term_df, term_boosts)
    if not len(cand) or not term_boosts:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    terms = list(term_boosts)
    boosts = list(term_boosts.values())
    return retriever._score(
        terms,
        cutoff,
        operator="OR",
        subset=cand,
        boosts=None if all(b == 1.0 for b in boosts) else boosts,
    )


def query_string_table(
    retriever,
    queries: Dict[str, str],
    cutoff: int = 100,
    positional=None,
    synonyms: Optional[Dict[str, Sequence[str]]] = None,
) -> pa.Table:
    """Batch form: ``{q_id: query_string}`` -> Arrow table
    (q_id, rank, conv_id, turn_idx) ordered by (q_id, rank)."""
    q_col: List[str] = []
    r_col: List[int] = []
    c_parts: List[np.ndarray] = []
    t_parts: List[np.ndarray] = []
    for q_id in sorted(queries):
        ids, _scores = query_string_search(
            retriever, queries[q_id], cutoff, positional, synonyms
        )
        convs, turns = retriever.index.to_original_ids(ids)
        q_col.extend([q_id] * len(ids))
        r_col.extend(range(1, len(ids) + 1))
        c_parts.append(np.asarray(convs, dtype=object))
        t_parts.append(turns)
    convs = np.concatenate(c_parts) if c_parts else np.empty(0, dtype=object)
    turns = np.concatenate(t_parts) if t_parts else np.empty(0, dtype=np.int32)
    return pa.Table.from_arrays(
        [
            pa.array(q_col, type=pa.string()),
            pa.array(np.asarray(r_col, dtype=np.int64)),
            pa.array(convs, type=pa.string()),
            pa.array(turns, type=pa.int32()),
        ],
        names=["q_id", "rank", "conv_id", "turn_idx"],
    )
