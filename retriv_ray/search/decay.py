"""Function-score decay ranking (Elasticsearch ``function_score`` with
an ``exp`` decay function over a numeric metadata field): each BM25
score is multiplied by ``decay ** (|value - origin| / scale)`` —
exactly ES's exponential curve with ``offset=0`` (the multiplier is
``exp(lambda * dist)`` with ``lambda = ln(decay)/scale``), the
standard recency/size boost in search ranking.

The decay applies to EVERY matching document before the top-k cut
(ES semantics: function_score rescales the whole query score, it is
not a rescorer over a window), so the candidate scoring runs at full
cutoff like collapse/pagination do. Determinism: final scores order
by (-score, doc_id), matching the BM25 kernels' tie-break.

Scale notes: the numeric value array is the MetadataIndex dense
number column, doc-range-shardable exactly like doc_lens; in sharded
serving each shard decays its own slice and the existing tree merge
re-ranks (score transforms commute with per-shard top-k because the
multiplier is per-document). Nothing here is driver-bound beyond the
final queries x cutoff rows.
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import numpy as np
import pyarrow as pa


def _number_values(md, field: str) -> np.ndarray:
    kind = md.schema.get(field)
    if kind is None:
        raise ValueError(f"Field `{field}` not in schema")
    if kind != "number":
        raise ValueError(f"decay needs a number field; `{field}` is {kind}")
    return md.values[field]


def decay_topk(
    retriever,
    query: str,
    field: str,
    origin: float,
    scale: float,
    decay: float = 0.5,
    q_id: str = "q",
    cutoff: int = 10,
) -> pa.Table:
    """(q_id, rank, doc_id) — BM25 * exponential decay on ``field``.

    ``origin``/``scale``/``decay`` follow the ES definition: a doc
    whose field value sits ``scale`` away from ``origin`` is scored
    at ``decay`` of its undecayed BM25 score.
    """
    if scale <= 0:
        raise ValueError("scale must be positive")
    if not (0.0 < decay < 1.0):
        raise ValueError("decay must be in (0, 1)")
    vals = _number_values(retriever.metadata, field)
    terms = retriever.query_terms(query)
    if not terms:
        ids = np.empty(0, dtype=np.int64)
        final = np.empty(0, dtype=np.float64)
    else:
        ids, scores = retriever._score(
            terms, cutoff=retriever.index.local_count
        )
        dist = np.abs(vals[ids].astype(np.float64) - float(origin))
        mult = np.power(float(decay), dist / float(scale))
        final = scores.astype(np.float64) * mult
    order = np.lexsort((ids, -final))[:cutoff]
    kept = ids[order]
    return pa.Table.from_arrays(
        [
            pa.array([q_id] * len(kept), type=pa.string()),
            pa.array(np.arange(1, len(kept) + 1, dtype=np.int64)),
            pa.array(kept, type=pa.int64()),
        ],
        names=["q_id", "rank", "doc_id"],
    )


def decay_queries(
    retriever,
    queries: Mapping[str, str],
    field: str,
    origin: float,
    scale: float,
    decay: float = 0.5,
    cutoff: int = 10,
) -> pa.Table:
    parts = [
        decay_topk(
            retriever, queries[q], field, origin, scale, decay, q, cutoff
        )
        for q in sorted(queries)
    ]
    return pa.concat_tables(parts)
