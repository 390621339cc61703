"""Two-phase ranking: BM25 candidates, then proximity-boosted rescore.

The Lucene/Elasticsearch "rescorer" pattern (the reference engine has
no second phase — its search is single-pass BM25,
reference retriv/sparse_retriever/sparse_retriever.py:262-307): a
cheap first pass over the inverted index collects a candidate window
of ``first_n`` docs, then an expensive positional feature reranks
ONLY that window —

    final(q, d) = bm25(q, d) + boost * ln(1 + n_pairs(a, b, w; d))

where ``n_pairs`` is the within-window co-occurrence count of a term
pair from the positional index (the standard proximity boost). The
candidate window makes the expensive feature's cost O(first_n) per
query instead of O(matching docs).

Determinism: the first pass uses the float64 scoring kernel, ranks
break ties by ascending doc_id in BOTH phases (the engine-wide K2/K3
rule), and the boost feature is ln1p of an integer — so the final
ranking is reproducible in SQL for the driver oracle.

Scale notes: serving-time only — two index probes per query (the
second restricted to candidates), no corpus pass; fleets run it
per-actor like any other query shape.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
import pyarrow as pa


def rescore_topk(
    retriever,
    pos_index,
    queries: Dict[str, Tuple[str, str, str, int]],
    first_n: int = 50,
    boost: float = 0.5,
    cutoff: int = 10,
) -> pa.Table:
    """``{q_id: (query_text, term_a, term_b, window)}`` ->
    (q_id, rank, conv_id, turn_idx, doc_id) ordered by (q_id, rank):
    BM25 top-``first_n`` candidates, proximity-boosted, cut to
    ``cutoff``."""
    if first_n < cutoff:
        raise ValueError(f"first_n={first_n} must be >= cutoff={cutoff}")
    q_col, r_col, c_parts, t_parts, d_parts = [], [], [], [], []
    for q_id in sorted(queries):
        qtext, term_a, term_b, window = queries[q_id]
        terms = retriever.pre.tokens(qtext)
        if not terms:
            continue
        ids, scores = retriever._score(terms, first_n)
        if len(ids) == 0:
            continue
        docs_p, n_pairs = pos_index.proximity(term_a, term_b, window)
        feat = np.zeros(len(ids), dtype=np.int64)
        if len(docs_p):
            at = np.searchsorted(docs_p, ids)
            ok = (at < len(docs_p)) & (docs_p[np.minimum(at, len(docs_p) - 1)] == ids)
            feat[ok] = n_pairs[at[ok]]
        final = scores.astype(np.float64) + boost * np.log1p(feat)
        order = np.lexsort((ids, -final))[:cutoff]
        sel = ids[order]
        convs, turns = retriever.index.to_original_ids(sel)
        q_col.extend([q_id] * len(sel))
        r_col.extend(range(1, len(sel) + 1))
        c_parts.append(np.asarray(convs, dtype=object))
        t_parts.append(turns)
        d_parts.append(sel)
    convs = (
        np.concatenate(c_parts) if c_parts else np.empty(0, dtype=object)
    )
    turns = (
        np.concatenate(t_parts) if t_parts else np.empty(0, dtype=np.int32)
    )
    docs = np.concatenate(d_parts) if d_parts else np.empty(0, dtype=np.int64)
    return pa.Table.from_arrays(
        [
            pa.array(q_col, type=pa.string()),
            pa.array(np.asarray(r_col, dtype=np.int64), type=pa.int64()),
            pa.array(convs, type=pa.string()),
            pa.array(turns.astype(np.int32), type=pa.int32()),
            pa.array(docs, type=pa.int64()),
        ],
        names=["q_id", "rank", "conv_id", "turn_idx", "doc_id"],
    )
