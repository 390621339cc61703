"""Language-model (query-likelihood) retrieval with Dirichlet
smoothing (Zhai & Lafferty 2001; Lucene ``LMDirichletSimilarity``) —
a second similarity family over the unchanged BM25 index. The
reference ships only BM25/TF-IDF (`sparse_retriever.py`); LM
Dirichlet is the standard alternative every Lucene/ES deployment can
switch to, and it needs nothing the index doesn't already store:
postings tf, doc lengths, and the collection totals.

    score(q, d) = sum_{t in q} ln( (tf + mu*p(t|C)) / ((dl + mu) * p(t|C)) )
                = sum_{t in q, tf>0} ln(1 + tf / (mu * p(t|C)))
                  + |q| * ln(mu / (dl + mu))
    p(t|C) = cf_t / total_tokens

Query-term multiplicity counts (each occurrence contributes), OOV
terms drop (the reference's M13 vocabulary filter); only documents
containing at least one query term are ranked (the second addend
alone never creates a candidate, matching Lucene's conjunctive
candidate enumeration over postings).

EXACTNESS CONTRACT: every ln() term is floor-quantized to 1e-6
(int64) BEFORE summation, so the total is order-free and the DuckDB
oracle reproduces it with the literally-identical expression —
the same trick rank_eval_ds uses for DCG sums. cf/total come from
the gathered postings / resident doc_lens (exact on a monolithic
index; a sharded fleet would read the global df/cf from the terms
table and total tokens from the manifest instead — same numbers, the
terms table is globally merged at build).

Scale notes: per query this touches exactly the postings of its
terms (the same gather BM25 does) plus O(candidates) vector math —
no corpus pass, no new index structure; serving fleets run it inside
the existing scorer actors against resident state.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
import pyarrow as pa


def lm_dirichlet_scores(
    index, terms: List[str], mu: float = 2000.0
) -> Tuple[np.ndarray, np.ndarray]:
    """(candidate doc_ids asc, score_e6 int64) for the (possibly
    repeated, vocabulary-filtered) query ``terms``."""
    total = float(np.asarray(index.doc_lens, dtype=np.float64).sum())
    doc_parts, contrib_parts = [], []
    for t in terms:
        docs, tfs = index.get_postings(t)
        if len(docs) == 0:
            continue
        cf = float(np.asarray(tfs, dtype=np.float64).sum())
        # literal oracle expression: ln(1 + tf / (mu * (cf / total)))
        c = np.floor(
            1e6
            * np.log(
                1.0 + tfs.astype(np.float64) / (mu * (cf / total))
            )
        ).astype(np.int64)
        doc_parts.append(np.asarray(docs, dtype=np.int64))
        contrib_parts.append(c)
    if not doc_parts:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    all_docs = np.concatenate(doc_parts)
    all_c = np.concatenate(contrib_parts)
    cand, inv = np.unique(all_docs, return_inverse=True)
    sums = np.zeros(len(cand), dtype=np.int64)
    np.add.at(sums, inv, all_c)
    dl = np.asarray(index.doc_lens, dtype=np.float64)[cand]
    norm = np.floor(1e6 * np.log(mu / (dl + mu))).astype(np.int64)
    score = sums + np.int64(len(terms)) * norm
    return cand, score


def lm_dirichlet_topk(
    retriever, query: str, cutoff: int = 100, mu: float = 2000.0
) -> Tuple[np.ndarray, np.ndarray]:
    """Top-``cutoff`` (doc_ids, score_e6), ordered by
    (-score_e6, doc_id) — K2/K3 deterministic tie-break."""
    terms = retriever.query_terms(query)
    cand, score = lm_dirichlet_scores(retriever.index, terms, mu)
    if len(cand) == 0:
        return cand, score
    order = np.lexsort((cand, -score))[:cutoff]
    return cand[order], score[order]


def lm_dirichlet_table(
    retriever, queries: Dict[str, str], cutoff: int = 100,
    mu: float = 2000.0,
) -> pa.Table:
    """{q_id: text} -> (q_id, rank, conv_id, turn_idx, score_e6)."""
    q_col, r_parts, c_parts, t_parts, s_parts = [], [], [], [], []
    for q_id in sorted(queries):
        docs, score = lm_dirichlet_topk(
            retriever, queries[q_id], cutoff, mu
        )
        convs, turns = retriever.index.to_original_ids(docs)
        q_col.extend([q_id] * len(docs))
        r_parts.append(np.arange(1, len(docs) + 1, dtype=np.int64))
        c_parts.append(np.asarray(convs, dtype=object))
        t_parts.append(turns)
        s_parts.append(score)
    cat = lambda ps, dt: (  # noqa: E731
        np.concatenate(ps) if ps else np.empty(0, dtype=dt)
    )
    return pa.Table.from_arrays(
        [
            pa.array(q_col, type=pa.string()),
            pa.array(cat(r_parts, np.int64), type=pa.int64()),
            pa.array(cat(c_parts, object), type=pa.string()),
            pa.array(
                cat(t_parts, np.int32).astype(np.int32), type=pa.int32()
            ),
            pa.array(cat(s_parts, np.int64), type=pa.int64()),
        ],
        names=["q_id", "rank", "conv_id", "turn_idx", "score_e6"],
    )
