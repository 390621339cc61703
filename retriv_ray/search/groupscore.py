"""Bucket ranking by aggregated relevance (Elasticsearch ``terms``
aggregation ordered by ``max_score`` / parent-child ``score_mode``):
group every matching document by a single-valued metadata field and
rank the GROUPS by the max (or sum) of their documents' BM25 scores.
"Which sources answer this query best" — the group-level complement
of field collapsing (which ranks documents under a per-group cap).

Determinism: groups order by (-aggregated score, value); the reported
best document for a group is its (score desc, doc_id asc) winner,
matching the kernels' tie-break. ``mode="max"`` is exactly
order-free; ``mode="sum"`` sums per-group in doc_id order (shard
merges must re-sum, noted below).

Scale notes: per-shard partial aggregates are one (value, agg_score,
best_doc) row per group per shard — the classic combiner shape; the
merge re-maxes/re-sums over shards x groups rows. The value-code
array is the same doc-range-shardable inversion collapse uses.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np
import pyarrow as pa

from retriv_ray.search.collapse import _value_codes


def grouped_topk(
    retriever,
    query: str,
    field: str,
    mode: str = "max",
    q_id: str = "q",
    cutoff: int = 10,
) -> pa.Table:
    """(q_id, rank, value, doc_id) — top groups by aggregated BM25;
    ``doc_id`` is the group's best-scoring document (max mode) or its
    lowest-id member (sum mode)."""
    if mode not in ("max", "sum"):
        raise ValueError("mode must be 'max' or 'sum'")
    md = retriever.metadata
    codes, values = _value_codes(md, field)
    terms = retriever.query_terms(query)
    if not terms:
        ids = np.empty(0, dtype=np.int64)
        scores = np.empty(0, dtype=np.float64)
    else:
        ids, scores = retriever._score(
            terms, cutoff=retriever.index.local_count
        )
    vc = codes[ids] if len(ids) else np.empty(0, dtype=np.int32)
    keep = vc >= 0  # docs without a value for the field don't bucket
    ids, scores, vc = ids[keep], scores[keep], vc[keep]
    if not len(ids):
        return pa.Table.from_arrays(
            [
                pa.array([], type=pa.string()),
                pa.array([], type=pa.int64()),
                pa.array([], type=pa.string()),
                pa.array([], type=pa.int64()),
            ],
            names=["q_id", "rank", "value", "doc_id"],
        )
    # contiguous groups: one lexsort by (code, -score, doc_id); the
    # head of each run is the group's max-mode winner
    order = np.lexsort((ids, -scores, vc))
    svc, sids, ssc = vc[order], ids[order], scores[order].astype(np.float64)
    starts = np.flatnonzero(np.concatenate(([True], svc[1:] != svc[:-1])))
    gcodes = svc[starts]
    if mode == "max":
        gscore = ssc[starts]
        gdoc = sids[starts]
    else:
        gscore = np.add.reduceat(ssc, starts)
        # lowest doc_id member as the representative
        lens = np.diff(np.append(starts, len(sids)))
        gdoc = np.fromiter(
            (sids[s : s + l].min() for s, l in zip(starts, lens)),
            dtype=np.int64,
            count=len(starts),
        )
    # rank groups by (-score, value); gcodes are value-sorted codes so
    # the code itself is the ascending-value tie-break
    gorder = np.lexsort((gcodes, -gscore))[:cutoff]
    kept_vals = [str(values[c]) for c in gcodes[gorder]]
    return pa.Table.from_arrays(
        [
            pa.array([q_id] * len(gorder), type=pa.string()),
            pa.array(np.arange(1, len(gorder) + 1, dtype=np.int64)),
            pa.array(kept_vals, type=pa.string()),
            pa.array(gdoc[gorder], type=pa.int64()),
        ],
        names=["q_id", "rank", "value", "doc_id"],
    )


def grouped_queries(
    retriever,
    queries: Mapping[str, str],
    field: str,
    mode: str = "max",
    cutoff: int = 10,
) -> pa.Table:
    parts = [
        grouped_topk(retriever, queries[q], field, mode, q, cutoff)
        for q in sorted(queries)
    ]
    return pa.concat_tables(parts)
