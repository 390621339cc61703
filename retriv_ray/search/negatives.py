"""Hard-negative mining for retrieval / reranker training (the
DPR / sentence-transformers recipe): for each (query, known-positive)
pair, the top BM25 hits EXCLUDING the positive are the hard
negatives — lexically close enough to fool a sparse scorer, which is
exactly what the dense model must learn to separate.

One ordinary top-(n+1) kernel call per query (the positive can occupy
at most one slot), then a vectorized drop + renumber — no corpus
pass beyond the normal posting reads. Batch mining at scale rides the
same worker-cached actor fleet as ``msearch_ds``; mining against a
FILTERED pool (e.g. same-language negatives) composes through the
metadata subset path like any other query."""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
import pyarrow as pa


def mine_hard_negatives(
    retriever,
    pairs: Dict[str, Tuple[str, Tuple[str, int]]],
    n_negatives: int = 10,
) -> pa.Table:
    """``{q_id: (query_text, (positive_conv_id, positive_turn_idx))}``
    -> (q_id, rank, conv_id, turn_idx) with ``rank`` renumbered
    1..n over the negatives only. A positive outside the top
    n_negatives+1 simply leaves the full top-n as negatives (the
    standard recipe)."""
    q_col: List[str] = []
    r_col: List[int] = []
    c_col: List[str] = []
    t_col: List[int] = []
    for q_id in sorted(pairs):
        text, (pos_conv, pos_turn) = pairs[q_id]
        terms = retriever.query_terms(text)
        if not terms:
            continue
        ids, _scores = retriever._score(terms, n_negatives + 1)
        convs, turns = retriever.index.to_original_ids(ids)
        kept = [
            (c, int(t))
            for c, t in zip(convs, turns)
            if not (c == pos_conv and int(t) == int(pos_turn))
        ][:n_negatives]
        q_col.extend([q_id] * len(kept))
        r_col.extend(range(1, len(kept) + 1))
        c_col.extend(c for c, _ in kept)
        t_col.extend(t for _, t in kept)
    return pa.Table.from_arrays(
        [
            pa.array(q_col, type=pa.string()),
            pa.array(np.asarray(r_col, dtype=np.int64)),
            pa.array(c_col, type=pa.string()),
            pa.array(np.asarray(t_col, dtype=np.int32)),
        ],
        names=["q_id", "rank", "conv_id", "turn_idx"],
    )
