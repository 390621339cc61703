"""Sort-by-field retrieval (Elasticsearch ``sort``): the query picks
the candidate set (documents containing at least one query term — OR
semantics, identical to the BM25 candidate set), but the ordering is
a numeric metadata field instead of relevance, with doc_id as the
deterministic tie-break. This is the "newest matching documents" /
"longest matching documents" query every search UI exposes.

Scale notes: candidates come from the same postings gather as BM25
scoring; the field values are the MetadataIndex dense number column
(doc-range-shardable). Per-shard top-k by (field, doc_id) merges by
re-sorting the shards x cutoff survivors — the same idempotent merge
shape the sharded searcher's tree already applies to scores.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np
import pyarrow as pa

from retriv_ray.search.decay import _number_values


def sort_topk(
    retriever,
    query: str,
    field: str,
    q_id: str = "q",
    descending: bool = True,
    cutoff: int = 10,
) -> pa.Table:
    """(q_id, rank, doc_id, value) — query-matching docs ordered by
    ``field`` (desc by default), ties by ascending doc_id."""
    vals = _number_values(retriever.metadata, field)
    terms = retriever.query_terms(query)
    if not terms:
        ids = np.empty(0, dtype=np.int64)
    else:
        ids, _scores = retriever._score(
            terms, cutoff=retriever.index.local_count
        )
    v = vals[ids].astype(np.float64)
    order = np.lexsort((ids, -v if descending else v))[:cutoff]
    kept, kv = ids[order], vals[ids][order]
    return pa.Table.from_arrays(
        [
            pa.array([q_id] * len(kept), type=pa.string()),
            pa.array(np.arange(1, len(kept) + 1, dtype=np.int64)),
            pa.array(kept, type=pa.int64()),
            pa.array(kv),
        ],
        names=["q_id", "rank", "doc_id", "value"],
    )


def sort_queries(
    retriever,
    queries: Mapping[str, str],
    field: str,
    descending: bool = True,
    cutoff: int = 10,
) -> pa.Table:
    parts = [
        sort_topk(retriever, queries[q], field, q, descending, cutoff)
        for q in sorted(queries)
    ]
    return pa.concat_tables(parts)
