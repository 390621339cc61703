"""Federated (multi-index) BM25 search — the ES multi-index /
cross-cluster surface: one query fans out over SEVERAL independently
built indexes and the per-index top-k merge into one ranking.

Two stat modes, exactly ES's two search types:

- ``mode="local"`` (ES ``query_then_fetch``, the default): every
  index scores with its OWN df / doc_count / avgdl. Cheap (no
  cross-index round-trip) but scores are corpus-relative — the mode's
  documented bias on skewed splits.
- ``mode="global"`` (ES ``dfs_query_then_fetch``): one stats
  round-trip first — per-term df summed across indexes, doc counts
  and token totals merged — then every index scores with the GLOBAL
  stats. The merged ranking is then *identical to a single monolithic
  index over the union corpus* (pinned by test and by the driver
  oracle, which is the unchanged single-corpus SQL).

Scoring here is a small explicit float64 BM25 (the SQL oracle's
literal expression) over gathered postings, not the serving kernel's
cached-contribution path: stats overrides make contribution caches
per-(term, stats) and federation would thrash them; the per-query
cost is the same postings gather either way.

Scale notes: the stats round-trip ships |query terms| (df) numbers
per index — O(terms x indexes), never postings; each index then
scores only its own candidates (exactly its share of the one-index
work) and the merge sees indexes x cutoff rows. Ties across indexes
break on the original (conv_id, turn_idx) key, which is
total-ordered and index-independent, so the merged ranking is
deterministic regardless of fan-out order or index count.
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence, Tuple

import numpy as np
import pyarrow as pa


def _query_terms_any(retrievers: Sequence, query: str) -> List[str]:
    """Preprocess once (identical configs are required), then the
    vocabulary filter is the UNION vocabulary — a term kept if any
    index knows it (a monolithic index over the union corpus would
    keep exactly these)."""
    terms = retrievers[0].pre.tokens(query)
    return [
        t
        for t in terms
        if any(t in r.index.term_df for r in retrievers)
    ]


def _stats(retrievers: Sequence, terms: List[str], mode: str):
    """Per-index (N, avgdl, {term: df}) under the given mode."""
    uniq = sorted(set(terms))
    per_df = []
    for r in retrievers:
        per_df.append(
            {t: float(len(r.index.get_postings(t)[0])) for t in uniq}
        )
    ns = [float(r.index.doc_count) for r in retrievers]
    totals = [
        float(np.asarray(r.index.doc_lens, dtype=np.float64).sum())
        for r in retrievers
    ]
    if mode == "global":
        n_g = sum(ns)
        avgdl_g = sum(totals) / n_g
        df_g = {t: sum(d[t] for d in per_df) for t in uniq}
        return [(n_g, avgdl_g, df_g)] * len(retrievers)
    return [
        (n, tot / n if n else 1.0, d)
        for n, tot, d in zip(ns, totals, per_df)
    ]


def _score_one(
    retriever, terms: List[str], stats, k1: float, b: float
) -> Tuple[np.ndarray, np.ndarray]:
    """(local doc_ids, float64 scores) over this index's candidates,
    the SQL oracle's literal BM25 expression."""
    n, avgdl, df_map = stats
    idx = retriever.index
    dl_all = np.asarray(idx.doc_lens, dtype=np.float64)
    doc_parts, sc_parts = [], []
    for t in terms:
        docs, tfs = idx.get_postings(t)
        if len(docs) == 0:
            continue
        df = df_map[t]
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        tf = tfs.astype(np.float64)
        dl = dl_all[docs]
        w = idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
        doc_parts.append(np.asarray(docs, dtype=np.int64))
        sc_parts.append(w)
    if not doc_parts:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    all_docs = np.concatenate(doc_parts)
    all_w = np.concatenate(sc_parts)
    cand, inv = np.unique(all_docs, return_inverse=True)
    out = np.zeros(len(cand), dtype=np.float64)
    np.add.at(out, inv, all_w)
    return cand, out


def federated_search(
    retrievers: Sequence,
    query: str,
    cutoff: int = 100,
    mode: str = "local",
    k1: float = 1.2,
    b: float = 0.75,
) -> pa.Table:
    """One query over all ``retrievers`` -> (rank, conv_id, turn_idx,
    score) merged ranking, ties on (-score, conv_id, turn_idx)."""
    if mode not in ("local", "global"):
        raise ValueError(f"unknown mode {mode!r}")
    terms = _query_terms_any(retrievers, query)
    if not terms:
        return pa.Table.from_arrays(
            [
                pa.array([], type=pa.int64()),
                pa.array([], type=pa.string()),
                pa.array([], type=pa.int32()),
                pa.array([], type=pa.float64()),
            ],
            names=["rank", "conv_id", "turn_idx", "score"],
        )
    stats = _stats(retrievers, terms, mode)
    convs_all, turns_all, scores_all = [], [], []
    for r, st in zip(retrievers, stats):
        docs, scores = _score_one(r, terms, st, k1, b)
        if len(docs) == 0:
            continue
        # per-index cut before the merge (what each ES shard ships)
        order = np.lexsort((docs, -scores))[:cutoff]
        convs, turns = r.index.to_original_ids(docs[order])
        convs_all.append(np.asarray(convs, dtype=object))
        turns_all.append(np.asarray(turns, dtype=np.int64))
        scores_all.append(scores[order])
    if not convs_all:
        return federated_search(retrievers, "", cutoff, mode, k1, b)
    convs = np.concatenate(convs_all)
    turns = np.concatenate(turns_all)
    scores = np.concatenate(scores_all)
    order = np.lexsort((turns, convs, -scores))[:cutoff]
    return pa.Table.from_arrays(
        [
            pa.array(np.arange(1, len(order) + 1), type=pa.int64()),
            pa.array(convs[order], type=pa.string()),
            pa.array(turns[order].astype(np.int32), type=pa.int32()),
            pa.array(scores[order], type=pa.float64()),
        ],
        names=["rank", "conv_id", "turn_idx", "score"],
    )


def federated_msearch(
    retrievers: Sequence,
    queries: Dict[str, str],
    cutoff: int = 100,
    mode: str = "local",
    k1: float = 1.2,
    b: float = 0.75,
) -> pa.Table:
    """{q_id: text} -> (q_id, rank, conv_id, turn_idx, score)."""
    parts = []
    for q_id in sorted(queries):
        t = federated_search(retrievers, queries[q_id], cutoff, mode, k1, b)
        parts.append(
            t.add_column(
                0, "q_id", pa.array([q_id] * t.num_rows, type=pa.string())
            )
        )
    return pa.concat_tables(parts)
