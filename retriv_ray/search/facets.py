"""Faceted search: per-field value counts over a query's matching set
(the Elasticsearch ``terms`` aggregation shape).

The base set is every doc matching the query disjunctively (any query
term present — the same candidate semantics the BM25 kernel admits),
optionally restricted by the reference metadata-filter DSL
(``where`` / ``where_not`` via ``MetadataIndex.subset_for_query``)
and by tombstones. Counts come from sorted-set intersections between
the base set and each facet value's metadata posting list — one
``searchsorted`` membership probe per (field, value), never a pass
over the corpus rows.

Scale notes: facet postings live in the doc-id-aligned metadata parts
(search/metadata.py) which shard by doc range exactly like doc_lens,
so in sharded serving each shard actor counts its slice and the
per-value counts SUM across shards (counts are additive over disjoint
doc ranges) — the merge is |values| integers per field. High-
cardinality fields should be counted top-N per shard only after a
global sketch; this module counts exactly and is bounded by the
field's value count.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Union

import numpy as np
import pyarrow as pa


def _matching_docs(retriever, query: Union[str, Dict]) -> np.ndarray:
    """Sorted unique internal doc ids matching the query: union of the
    query terms' postings, intersected with metadata filters (dict
    queries) and with tombstone survivors."""
    subset: Optional[np.ndarray] = None
    if isinstance(query, dict):
        subset = retriever.metadata.subset_for_query(query)
        text = query.get("text", "")
    else:
        text = query
    terms = retriever.query_terms(text)
    if terms:
        docs = np.unique(
            np.concatenate(
                [retriever.index.get_postings(t)[0] for t in terms]
            )
        ).astype(np.int64)
    elif subset is not None:
        docs = np.sort(np.asarray(subset, dtype=np.int64))
        subset = None
    else:
        docs = np.array([], dtype=np.int64)
    if subset is not None:
        docs = np.intersect1d(docs, subset, assume_unique=True)
    excl = retriever.index.exclude_ranges
    if excl is not None and len(docs):
        lo, hi = excl
        keep = np.ones(len(docs), dtype=bool)
        for a, b in zip(lo, hi):
            keep &= ~((docs >= a) & (docs < b))
        docs = docs[keep]
    return docs


def _count_in(base: np.ndarray, ids: np.ndarray) -> int:
    """|base ∩ ids| for two sorted int arrays via searchsorted."""
    if not len(base) or not len(ids):
        return 0
    idx = np.searchsorted(base, ids)
    idx[idx == len(base)] = len(base) - 1
    return int((base[idx] == ids).sum())


def facet_counts(
    retriever,
    query: Union[str, Dict],
    fields: List[str],
    metadata=None,
) -> pa.Table:
    """(field, value, n_docs) counts over the query's matching docs
    for each keyword/id/bool/keywords facet field, values sorted;
    zero-count values are omitted. ``metadata`` defaults to the
    retriever's own MetadataIndex."""
    md = metadata if metadata is not None else retriever.metadata
    docs = _matching_docs(retriever, query)
    f_col: List[str] = []
    v_col: List[str] = []
    n_col: List[int] = []
    for f in fields:
        kind = md.schema.get(f)
        if kind is None:
            raise ValueError(f"Field `{f}` not in schema")
        if kind == "number":
            raise ValueError(
                f"Field `{f}` is numeric — facet over ranges instead"
            )
        post = md.postings[f]
        for value in sorted(post, key=str):
            n = _count_in(docs, post[value])
            if n:
                f_col.append(f)
                v_col.append(
                    str(value).lower() if isinstance(value, bool) else str(value)
                )
                n_col.append(n)
    return pa.Table.from_arrays(
        [
            pa.array(f_col, type=pa.string()),
            pa.array(v_col, type=pa.string()),
            pa.array(np.asarray(n_col, dtype=np.int64)),
        ],
        names=["field", "value", "n_docs"],
    )


def facet_stats(
    retriever,
    query: Union[str, Dict],
    facet_field: str,
    value_field: str,
    metadata=None,
) -> pa.Table:
    """Elasticsearch ``stats`` sub-aggregation: per ``facet_field``
    bucket over the query's matching set, integer stats of the NUMBER
    field ``value_field`` — (value, n_docs, sum_v, min_v, max_v),
    values sorted, empty buckets omitted. ``avg`` is left to the
    caller (sum/n) so every emitted column stays integer-exact.

    Scale notes: one sorted-set membership probe per facet value (as
    :func:`facet_counts`) plus a gather from the doc-id-aligned value
    array. Across doc-range shards n_docs and sum_v ADD and min_v /
    max_v combine by min/max — the merge is |values| rows of 4 ints."""
    md = metadata if metadata is not None else retriever.metadata
    kind = md.schema.get(facet_field)
    if kind is None or kind == "number":
        raise ValueError(
            f"facet_field `{facet_field}` must be a keyword/id/bool/keywords field"
        )
    if md.schema.get(value_field) != "number":
        raise ValueError(f"value_field `{value_field}` must be a number field")
    docs = _matching_docs(retriever, query)
    vals_all = md.values[value_field]
    v_col: List[str] = []
    n_col: List[int] = []
    s_col: List[int] = []
    lo_col: List[int] = []
    hi_col: List[int] = []
    for value in sorted(md.postings[facet_field], key=str):
        ids = md.postings[facet_field][value]
        if not len(docs) or not len(ids):
            continue
        pos = np.searchsorted(docs, ids)
        pos[pos == len(docs)] = len(docs) - 1
        members = ids[docs[pos] == ids]
        if not len(members):
            continue
        v = vals_all[members].astype(np.int64)
        v_col.append(
            str(value).lower() if isinstance(value, bool) else str(value)
        )
        n_col.append(len(v))
        s_col.append(int(v.sum()))
        lo_col.append(int(v.min()))
        hi_col.append(int(v.max()))
    return pa.Table.from_arrays(
        [
            pa.array(v_col, type=pa.string()),
            pa.array(np.asarray(n_col, dtype=np.int64)),
            pa.array(np.asarray(s_col, dtype=np.int64)),
            pa.array(np.asarray(lo_col, dtype=np.int64)),
            pa.array(np.asarray(hi_col, dtype=np.int64)),
        ],
        names=["value", "n_docs", "sum_v", "min_v", "max_v"],
    )


def range_facets(
    retriever,
    query: Union[str, Dict],
    field: str,
    edges: List[float],
) -> pa.Table:
    """Histogram facet over a NUMBER field: matching-doc counts per
    half-open bucket [edges[i], edges[i+1]); zero buckets omitted.
    Returns (lo, hi, n_docs) ordered by lo."""
    md = retriever.metadata
    if md.schema.get(field) != "number":
        raise ValueError(f"range_facets needs a number field, got `{field}`")
    if len(edges) < 2 or any(
        edges[i] >= edges[i + 1] for i in range(len(edges) - 1)
    ):
        raise ValueError("edges must be strictly increasing, >= 2 values")
    docs = _matching_docs(retriever, query)
    vals = md.values[field][docs] if len(docs) else np.empty(0)
    e = np.asarray(edges, dtype=np.float64)
    bucket = np.searchsorted(e, vals, side="right") - 1
    ok = (bucket >= 0) & (bucket < len(e) - 1) & (vals < e[-1])
    counts = np.bincount(bucket[ok], minlength=len(e) - 1)
    keep = np.flatnonzero(counts)
    return pa.Table.from_arrays(
        [
            pa.array(e[keep]),
            pa.array(e[keep + 1]),
            pa.array(counts[keep].astype(np.int64)),
        ],
        names=["lo", "hi", "n_docs"],
    )


def significant_terms(
    retriever,
    query: Union[str, Dict],
    top_k: int = 10,
    min_df_fg: int = 2,
) -> pa.Table:
    """Elasticsearch ``significant_terms``: vocabulary terms
    overrepresented in the query's matching set vs the corpus, scored
    by integer-exact quantized lift
    ``lift_e4 = (10^4 * df_fg * N) // (df * n_fg)`` (foreground doc
    frequency over expected), ranked (lift desc, df_fg desc, term
    asc). Exact rational arithmetic — no float divergence between
    engine and oracle.

    Scale notes: cost is one sorted-set membership probe per
    vocabulary term against the matching set — vocabulary-bounded,
    the same budget ES spends shard-locally; at web scale run it on
    the sampled top docs like ES does, or pre-prune terms whose
    global df already caps their lift below the current top-k floor
    (df >= df_fg_max * N / (lift_floor * n_fg))."""
    docs = _matching_docs(retriever, query)
    n_fg = len(docs)
    if n_fg == 0:
        return pa.Table.from_arrays(
            [
                pa.array([], type=pa.string()),
                pa.array([], type=pa.int64()),
                pa.array([], type=pa.int64()),
                pa.array([], type=pa.int64()),
            ],
            names=["term", "df_fg", "df", "lift_e4"],
        )
    n = int(retriever.index.doc_count)
    stats = retriever.index.term_df
    rows = []
    for term in stats:  # vocabulary-bounded scan
        ids, _tfs = retriever.index.get_postings(term)
        df_fg = _count_in(docs, ids)
        if df_fg < min_df_fg:
            continue
        df = int(stats[term])
        lift_e4 = (10_000 * df_fg * n) // (df * n_fg)
        rows.append((-lift_e4, -df_fg, term, df))
    rows.sort()
    rows = rows[:top_k]
    return pa.Table.from_arrays(
        [
            pa.array([r[2] for r in rows], type=pa.string()),
            pa.array(np.asarray([-r[1] for r in rows], dtype=np.int64)),
            pa.array(np.asarray([r[3] for r in rows], dtype=np.int64)),
            pa.array(np.asarray([-r[0] for r in rows], dtype=np.int64)),
        ],
        names=["term", "df_fg", "df", "lift_e4"],
    )


def top_hits(
    retriever,
    query: Union[str, Dict],
    facet_field: str,
    n: int = 3,
    metadata=None,
) -> pa.Table:
    """Elasticsearch ``top_hits`` sub-aggregation: for EVERY value of
    a keyword/id/bool/keywords facet field, the query's top-``n``
    BM25 hits restricted to that bucket — (value, rank, conv_id,
    turn_idx, doc_id), values sorted, empty buckets omitted. Unlike
    field collapsing (which dedups the GLOBAL top-k), every bucket
    gets its own full ranking even when none of its docs reach the
    global top.

    Scale notes: one scoring-kernel run per facet value through the
    subset path (the J4 restriction) — per-bucket cost is bounded by
    the query terms' postings, never a corpus pass; buckets are
    independent, so serving fleets parallelize by value, and in
    doc-range-sharded serving each shard ranks its slice with the
    per-bucket merge identical to the global top-k merge. For
    high-cardinality fields, restrict to the top buckets of
    :func:`facet_counts` first."""
    md = metadata if metadata is not None else retriever.metadata
    kind = md.schema.get(facet_field)
    if kind is None:
        raise ValueError(f"Field `{facet_field}` not in schema")
    if kind == "number":
        raise ValueError(
            f"Field `{facet_field}` is numeric — bucket over ranges instead"
        )
    text = query["text"] if isinstance(query, dict) else query
    terms = retriever.query_terms(text)
    post = md.postings[facet_field]
    v_col: List[str] = []
    r_col: List[int] = []
    d_parts: List[np.ndarray] = []
    for value in sorted(post, key=str):
        if not terms:
            break
        subset = np.asarray(post[value], dtype=np.int64)
        ids, _scores = retriever._score(terms, n, subset=subset)
        if not len(ids):
            continue
        v = str(value).lower() if isinstance(value, bool) else str(value)
        v_col.extend([v] * len(ids))
        r_col.extend(range(1, len(ids) + 1))
        d_parts.append(ids.astype(np.int64))
    docs = np.concatenate(d_parts) if d_parts else np.empty(0, dtype=np.int64)
    convs, turns = retriever.index.to_original_ids(docs)
    return pa.Table.from_arrays(
        [
            pa.array(v_col, type=pa.string()),
            pa.array(np.asarray(r_col, dtype=np.int64)),
            pa.array(np.asarray(convs, dtype=object), type=pa.string()),
            pa.array(turns.astype(np.int32), type=pa.int32()),
            pa.array(docs),
        ],
        names=["value", "rank", "conv_id", "turn_idx", "doc_id"],
    )
