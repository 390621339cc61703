"""Boolean retrieval over the real posting lists.

The reference exposes sorted-set primitives (union / intersect / diff,
reference retriv/utils/numba_utils.py:6-118) but no user-facing boolean
query API; this module composes those primitives (our vectorized
equivalents in :mod:`retriv_ray.search.kernel`) into the standard
must / should / must_not query shape over the same segment files the
BM25 scorer reads.

Semantics (SQL-oracle-checked in ``__ray_entry__``):

- ``must``      — document contains EVERY listed term (intersection).
- ``should``    — if ``must`` is empty, the candidate set is the union
  of the should-terms' postings; otherwise should-terms only annotate.
  Every result row carries ``n_should`` = number of distinct
  should-terms present in the doc (a coordination count — the classic
  boolean-ranking signal).
- ``must_not``  — documents containing ANY listed term are removed
  (sorted difference).

Scale notes: each term's postings are fetched through
``LoadedIndex.get_postings`` — part-routed segment reads, block
varint decode, LRU-cached — identical to the scoring path, so a
boolean query touches exactly the parts its terms hash to; nothing is
scanned. Set ops are numpy merges over ascending id arrays. For query
*batches*, route through the same actor-pool pattern as
``RaySparseRetriever.msearch_ds`` (each actor holds a LoadedIndex and
answers its query slice); the per-query cost profile is identical.
Terms absent from the vocabulary resolve to empty postings: an absent
must-term yields no hits, an absent should/must_not term is a no-op.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np
import pyarrow as pa

from retriv_ray.search.kernel import (
    diff_sorted,
    intersect_sorted_multi,
    union_sorted_multi,
)


def boolean_candidates(
    index,
    must: Sequence[str] = (),
    should: Sequence[str] = (),
    must_not: Sequence[str] = (),
    minimum_should_match: int = 0,
) -> tuple:
    """(doc_ids ascending, n_should per doc) for one boolean query
    against a :class:`retriv_ray.search.searcher.LoadedIndex`.

    ``minimum_should_match`` (Lucene msm): with should-terms present,
    keep only docs matching at least that many DISTINCT should-terms —
    on top of the must intersection when there is one, as the
    candidate-set cut when there is not (msm=0 keeps the default
    behavior: should only annotates/unions)."""
    must = list(dict.fromkeys(must))
    should = list(dict.fromkeys(should))
    must_not = list(dict.fromkeys(must_not))
    if must:
        posts = [index.get_postings(t)[0] for t in must]
        # smallest list first: every later intersect is bounded by it
        posts.sort(key=len)
        cand = intersect_sorted_multi(posts)
    elif should:
        cand = union_sorted_multi([index.get_postings(t)[0] for t in should])
    else:
        cand = np.empty(0, dtype=np.int64)
    if len(cand) and must_not:
        cand = diff_sorted(
            cand, union_sorted_multi([index.get_postings(t)[0] for t in must_not])
        )
    n_should = np.zeros(len(cand), dtype=np.int64)
    if len(cand) and should:
        for t in should:
            ids = index.get_postings(t)[0]
            pos = np.searchsorted(ids, cand)
            pos[pos >= len(ids)] = max(len(ids) - 1, 0)
            if len(ids):
                n_should += (ids[pos] == cand).astype(np.int64)
    if should and minimum_should_match > 0:
        keep = n_should >= minimum_should_match
        cand, n_should = cand[keep], n_should[keep]
    return cand, n_should


def boolean_search_table(
    retriever, queries: Dict[str, dict]
) -> pa.Table:
    """Run a dict of boolean queries ``{q_id: {"must": [...],
    "should": [...], "must_not": [...]}}`` and return one Arrow table
    ``(q_id, conv_id, turn_idx, n_should)`` ordered by (q_id, internal
    doc_id). Query terms run through the retriever's preprocessing
    pipeline so the boolean vocabulary matches the indexed one
    exactly."""
    q_col: List[str] = []
    c_parts: List[np.ndarray] = []
    t_parts: List[np.ndarray] = []
    s_parts: List[np.ndarray] = []
    for q_id in sorted(queries):
        spec = queries[q_id]
        pre = retriever.pre.tokens
        cand, n_should = boolean_candidates(
            retriever.index,
            must=[t for phrase in spec.get("must", []) for t in pre(phrase)],
            should=[t for phrase in spec.get("should", []) for t in pre(phrase)],
            must_not=[
                t for phrase in spec.get("must_not", []) for t in pre(phrase)
            ],
            minimum_should_match=int(spec.get("minimum_should_match", 0)),
        )
        convs, turns = retriever.index.to_original_ids(cand)
        q_col.extend([q_id] * len(cand))
        c_parts.append(np.asarray(convs, dtype=object))
        t_parts.append(turns)
        s_parts.append(n_should)
    convs = (
        np.concatenate(c_parts) if c_parts else np.empty(0, dtype=object)
    )
    turns = (
        np.concatenate(t_parts) if t_parts else np.empty(0, dtype=np.int32)
    )
    ns = np.concatenate(s_parts) if s_parts else np.empty(0, dtype=np.int64)
    return pa.Table.from_arrays(
        [
            pa.array(q_col, type=pa.string()),
            pa.array(convs, type=pa.string()),
            pa.array(turns, type=pa.int32()),
            pa.array(ns, type=pa.int64()),
        ],
        names=["q_id", "conv_id", "turn_idx", "n_should"],
    )
