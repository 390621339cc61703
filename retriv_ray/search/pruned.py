"""Score-safe block-max pruned BM25 (batched WAND/MaxScore variant).

The north-star requirement: query execution uses the per-block
metadata (max_tf + skip pointers + per-block byte lengths, written by
the build at retriv_ray/index/codec.py) to SKIP decoding posting
blocks that cannot contribute a top-k document — without ever
changing the exact top-k set or scores (classic WAND guarantee with
exact upper bounds; reference ranking semantics bm25.py:16-59 are
preserved bit-for-bit because surviving postings go through the very
same float op sequence).

Algorithm (two-phase, fully vectorized — a doc-at-a-time WAND loop
would be Python-slow; this is the batch formulation):

1. Per term, per block, an upper bound on any contained doc's
   contribution: ``bound = idf * max_tf*(k1+1) / (max_tf +
   k1*(1-b+b*rel_min))`` with the corpus-global min relative doc
   length (monotone in tf up, rel down -> valid bound). float64 with
   a multiplicative slack covers float32 truncation effects.
2. θ = k-th largest float32 contribution of the ANCHOR term (largest
   block bound; decoded fully — it must be scored anyway). Scores
   only grow when adding positive float32 terms, so the final k-th
   best score θ* >= θ.
3. A non-anchor block survives iff its bound + Σ other terms' max
   bounds > θ·(1-slack). Docs confined to pruned blocks have total
   upper bound <= that threshold < θ* — they cannot enter the top-k.
4. Repair decode: a pruned block still gets decoded if its doc-id
   range contains a CANDIDATE (doc seen in some surviving block), so
   every candidate is scored on ALL terms — the WAND exactness
   condition batch-style.
5. Exact scatter-scoring of candidates (same kernel op order),
   reference top-k semantics.

Returns None when the safety gate fails (cutoff >= max df — the
reference returns sub-cutoff tails that pruning could drop) so the
caller falls back to the exhaustive kernel.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from retriv_ray.index import codec
from retriv_ray.search import kernel

SLACK = 1e-6


def bm25_pruned(
    index,
    terms: List[str],
    b: float,
    k1: float,
    cutoff: int,
    dtype=np.float32,
    scratch: Optional[dict] = None,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Exact top-k BM25 with block skipping; None -> caller falls back."""
    encs = []
    for t in terms:
        e = index._encoded(t)
        if e is None:
            return None  # vocabulary filter should prevent this
        encs.append(e)
    dfs = [int(e[2].sum()) for e in encs]
    if cutoff >= max(dfs):
        return None  # tail semantics require the full union
    doc_count = index.doc_count
    rel = index.relative_doc_lens
    rel_min = float(index.rel_min)

    # per-term idf exactly as the kernel computes it
    idfs, bounds = [], []
    for e, df in zip(encs, dfs):
        idf = dtype(np.log(1.0 + (((doc_count - dtype(df)) + 0.5) / (dtype(df) + 0.5))))
        mt = e[4].astype(np.float64)
        denom = mt + k1 * (1.0 - b + b * rel_min)
        bounds.append(np.float64(idf) * (mt * (k1 + 1.0)) / denom * (1.0 + SLACK))
        idfs.append(idf)
    term_max = np.array([bb.max() for bb in bounds])
    anchor = int(np.argmax(term_max))

    # θ from the anchor's full float32 contribution (cached)
    model_dtype = dtype
    contrib_anchor = index.term_contrib(terms[anchor], "bm25", b, k1, model_dtype)
    c32 = contrib_anchor.astype(model_dtype) if contrib_anchor.dtype != model_dtype else contrib_anchor
    if len(c32) >= cutoff:
        theta = float(np.partition(c32, len(c32) - cutoff)[len(c32) - cutoff])
    else:
        theta = 0.0
    threshold = theta * (1.0 - SLACK)

    # MaxScore term partition: sort terms by bound ascending; the
    # largest prefix whose bound-sum <= θ is NON-ESSENTIAL — a doc
    # appearing only in those terms cannot reach θ (so it cannot
    # enter the top-k, whose k-th score θ* >= θ). Candidates come
    # from ESSENTIAL postings only; non-essential postings are then
    # decoded just for the blocks that contain a candidate.
    order_terms = np.argsort(term_max, kind="stable")
    prefix = np.cumsum(term_max[order_terms])
    non_essential = {
        int(t) for j, t in enumerate(order_terms) if prefix[j] <= threshold
    }
    residual = term_max.sum() - term_max  # Σ other terms' max bounds

    # phase 1: decode surviving blocks of essential terms
    decoded: List[Tuple[np.ndarray, np.ndarray]] = [None] * len(terms)
    sel_masks: List[np.ndarray] = [None] * len(terms)
    pruned_any = bool(non_essential)
    for i, e in enumerate(encs):
        if i in non_essential:
            sel_masks[i] = np.zeros(len(e[2]), dtype=bool)
            decoded[i] = (
                np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.int32),
            )
            continue
        if i == anchor:
            sel_masks[i] = np.ones(len(e[2]), dtype=bool)
            decoded[i] = index.get_postings(terms[i])
            continue
        # block-level refinement for essential terms (loose residual)
        keep = (bounds[i] + residual[i]) > threshold
        sel_masks[i] = keep
        if keep.all():
            decoded[i] = index.get_postings(terms[i])
        else:
            pruned_any = True
            sel = np.flatnonzero(keep)
            decoded[i] = codec.decode_blocks(e[0], e[1], e[2], e[5], e[6], sel)
    if not pruned_any:
        return None  # nothing saved — use the plain kernel path

    # phase 2: repair — decode pruned/non-essential blocks that may
    # contain a candidate, so every candidate is scored on ALL terms
    cand = np.unique(np.concatenate([d[0] for d in decoded]))
    if len(cand) == 0:
        return None
    for i, e in enumerate(encs):
        keep = sel_masks[i]
        if keep.all():
            continue
        last = e[3]
        blk = np.searchsorted(last, cand)  # candidate -> covering block
        blk = blk[blk < len(last)]
        need = np.unique(blk)
        need = need[~keep[need]]
        if len(need):
            extra = codec.decode_blocks(e[0], e[1], e[2], e[5], e[6], need)
            d0, f0 = decoded[i]
            order = np.argsort(np.concatenate([d0, extra[0]]), kind="stable")
            dd = np.concatenate([d0, extra[0]])[order]
            ff = np.concatenate([f0, extra[1]])[order]
            decoded[i] = (dd, ff)

    # exact scoring over candidates (same op sequence as kernel.bm25)
    scores = kernel._scratch_get(
        scratch, "scores_" + np.dtype(model_dtype).name, doc_count, model_dtype
    )
    for i in range(len(terms)):
        d, f = decoded[i]
        contrib = kernel.bm25_term_contrib(
            b, k1, f, d, rel, doc_count, model_dtype, df=dfs[i]
        )
        scores[d] += contrib
    gathered = scores[cand]
    if cutoff < len(gathered):
        vals, idx = kernel.unsorted_top_k(gathered, cutoff)
        ids = cand[idx]
    else:
        vals, ids = gathered, cand
    order = np.lexsort((ids, -vals))
    out = (ids[order], vals[order])
    if scratch is not None:
        for d, _f in decoded:
            scores[d] = 0
    return out
