"""Cursor pagination (``search_after``) over BM25 rankings.

A page is the next ``page_size`` hits strictly after a cursor
``(score, doc_id)`` in the engine's total order (score desc, doc_id
asc — the deterministic K2/K3 tie-break, so cursors are stable and
stateless like Elasticsearch ``search_after``, no scroll context to
keep server-side).

Implementation: the candidate set (union of the query terms' posting
lists) is ranked fully — pagination cost is bounded by the candidate
postings, never the corpus — and the cursor position is found with a
vectorized mask over the (score, id) keys. Deep pagination is
inherently linear in candidates; engines cap it (ES: 10k) and so
should callers here. The cursor score must be the engine's own
(float-exact round-trip), which is how search_after contracts work
everywhere.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pyarrow as pa


def search_after_table(
    retriever,
    query: str,
    q_id: str = "q",
    page_size: int = 10,
    cursor: Optional[Tuple[float, int]] = None,
    rank_base: Optional[int] = None,
) -> pa.Table:
    """One page of (q_id, rank, conv_id, turn_idx, score, doc_id),
    ranks absolute when ``rank_base`` is given (else computed from the
    cursor position)."""
    terms = retriever.query_terms(query)
    if not terms:
        ids = np.empty(0, dtype=np.int64)
        scores = np.empty(0, dtype=np.float64)
    else:
        ids, scores = retriever._score(
            terms, cutoff=retriever.index.local_count
        )
    start = 0
    if cursor is not None:
        c_score, c_id = cursor
        after = (scores < c_score) | ((scores == c_score) & (ids > c_id))
        nz = np.flatnonzero(after)
        start = int(nz[0]) if len(nz) else len(ids)
    page_ids = ids[start : start + page_size]
    page_scores = scores[start : start + page_size]
    base = start if rank_base is None else rank_base
    convs, turns = retriever.index.to_original_ids(page_ids)
    return pa.Table.from_arrays(
        [
            pa.array([q_id] * len(page_ids), type=pa.string()),
            pa.array(
                np.arange(base + 1, base + 1 + len(page_ids), dtype=np.int64)
            ),
            pa.array(convs, type=pa.string()),
            pa.array(turns.astype(np.int32), type=pa.int32()),
            pa.array(page_scores.astype(np.float64)),
            pa.array(page_ids, type=pa.int64()),
        ],
        names=["q_id", "rank", "conv_id", "turn_idx", "score", "doc_id"],
    )
