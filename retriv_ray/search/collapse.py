"""Field collapsing (Elasticsearch ``collapse``): BM25 ranking where
at most ``per_value`` documents per metadata field value survive —
result diversification by source/language/domain.

The candidate ranking is the deterministic (score desc, doc_id) total
order (bounded by the query terms' postings, like pagination); each
hit's field value comes from an id->value array inverted once from
the MetadataIndex keyword postings (cached per retriever+field); the
keep-first-``per_value``-per-value pass is one lexsort + run-length
cumcount — no Python loop over hits.

Scale notes: the value array is doc-range-shardable exactly like the
metadata postings it inverts; in sharded serving each shard collapses
its slice and the merge re-collapses the (shards x cutoff) survivors
— collapse is idempotent over concatenated ranked lists, so the tree
merge the sharded searcher already uses applies unchanged.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np
import pyarrow as pa


def _value_codes(md, field: str):
    """(codes int32 array over doc ids, values list) for a
    keyword/id/bool field — inverted from the postings dict."""
    kind = md.schema.get(field)
    if kind is None:
        raise ValueError(f"Field `{field}` not in schema")
    if kind not in ("keyword", "id", "bool"):
        raise ValueError(
            f"collapse needs a single-valued field; `{field}` is {kind}"
        )
    values = sorted(md.postings[field], key=str)
    codes = np.full(md.doc_count, -1, dtype=np.int32)
    for i, v in enumerate(values):
        codes[md.postings[field][v]] = i
    return codes, values


def collapse_topk(
    retriever,
    query: str,
    field: str,
    q_id: str = "q",
    per_value: int = 1,
    cutoff: int = 10,
) -> pa.Table:
    """(q_id, rank, doc_id, value) — the BM25 ranking with at most
    ``per_value`` hits per field value, re-ranked 1..cutoff."""
    if per_value < 1:
        raise ValueError("per_value must be >= 1")
    md = retriever.metadata
    codes, values = _value_codes(md, field)
    terms = retriever.query_terms(query)
    if not terms:
        ids = np.empty(0, dtype=np.int64)
    else:
        ids, _scores = retriever._score(
            terms, cutoff=retriever.index.local_count
        )
    vc = codes[ids] if len(ids) else np.empty(0, dtype=np.int32)
    # cumcount of each value along the ranked order, vectorized:
    # stable-sort by value, rank-within-run, scatter back
    pos = np.arange(len(ids))
    order = np.argsort(vc, kind="stable")
    vs = vc[order]
    starts = np.flatnonzero(np.concatenate(([True], vs[1:] != vs[:-1])))
    lens = np.diff(np.append(starts, len(vs)))
    within = np.arange(len(vs)) - np.repeat(starts, lens)
    cum = np.empty(len(ids), dtype=np.int64)
    cum[order] = within
    keep = pos[cum < per_value][:cutoff]
    kept_ids = ids[keep]
    kept_vals = [values[codes[i]] for i in kept_ids]
    return pa.Table.from_arrays(
        [
            pa.array([q_id] * len(kept_ids), type=pa.string()),
            pa.array(np.arange(1, len(kept_ids) + 1, dtype=np.int64)),
            pa.array(kept_ids, type=pa.int64()),
            pa.array([str(v) for v in kept_vals], type=pa.string()),
        ],
        names=["q_id", "rank", "doc_id", "value"],
    )


def collapse_queries(
    retriever,
    queries: Dict[str, str],
    field: str,
    per_value: int = 1,
    cutoff: int = 10,
) -> pa.Table:
    parts: List[pa.Table] = []
    for q_id in sorted(queries):
        parts.append(
            collapse_topk(
                retriever, queries[q_id], field, q_id, per_value, cutoff
            )
        )
    return pa.concat_tables(parts)
