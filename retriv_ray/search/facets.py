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
