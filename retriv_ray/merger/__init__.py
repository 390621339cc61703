"""Run fusion (the reference Merger) — dict API + a Ray-Data operator.

Reference semantics (retriv/merger/merger.py:18-49,
retriv/merger/normalization.py:20-90):

- per-run, PER-QUERY score normalization:
    min-max: (s - min) / max(max - min, 1e-9)
    max:      s / max(max, 1e-9)
    sum:     (s - min) / max(sum - min*n, 1e-9)
- fusion = weighted SUM of normalized scores per (q_id, doc_id);
  weights default to 1.0 per run (merger.py:36)
- final order (-score, doc_id asc), then cutoff (merger.py:42-48)
- autotune = best (norm, weights) by a rank metric (the reference
  optimizes via ranx/optuna, merger_autotune.py:4-33; here a
  deterministic dirichlet-grid weight search over retriv_ray.eval
  metrics — same search space, library-free)

The Ray-Data form (:func:`fuse_runs_ds`) takes a runs Dataset
(run_idx:int, q_id:str, doc_id:str, score:float) and fuses with two
shuffles: a groupby((run_idx, q_id)) whose groups compute their own
normalization stats locally (no driver gather or broadcast at any
query count), and one groupby((q_id, doc_id)).sum over the weighted
normalized scores, followed by a per-query grouped top-k.
"""

from __future__ import annotations

import math
from collections import defaultdict
from typing import Dict, List, Optional

import numpy as np

from retriv_ray.eval import evaluate

Run = Dict[str, Dict[str, float]]


# ---------------------------------------------------------------------------
# normalizations (dict form, reference normalization.py)
# ---------------------------------------------------------------------------


def _norm_one(results: Dict[str, float], norm: str) -> Dict[str, float]:
    if not results:
        return {}
    vals = np.fromiter(results.values(), dtype=np.float64, count=len(results))
    lo, hi, total = vals.min(), vals.max(), vals.sum()
    if norm == "min-max":
        den = max(hi - lo, 1e-9)
        out = (vals - lo) / den
    elif norm == "max":
        out = vals / max(hi, 1e-9)
    elif norm == "sum":
        den = max(total - lo * len(vals), 1e-9)
        out = (vals - lo) / den
    else:
        raise NotImplementedError(f"unknown norm {norm!r}")
    return dict(zip(results.keys(), out.tolist()))


def min_max_norm(run: Run) -> Run:
    return {q: _norm_one(r, "min-max") for q, r in run.items()}


def max_norm(run: Run) -> Run:
    return {q: _norm_one(r, "max") for q, r in run.items()}


def sum_norm(run: Run) -> Run:
    return {q: _norm_one(r, "sum") for q, r in run.items()}


def min_max_norm_multi(runs: List[Run]) -> List[Run]:
    return [min_max_norm(r) for r in runs]


def max_norm_multi(runs: List[Run]) -> List[Run]:
    return [max_norm(r) for r in runs]


def sum_norm_multi(runs: List[Run]) -> List[Run]:
    return [sum_norm(r) for r in runs]


_NORMS = {"min-max": min_max_norm, "max": max_norm, "sum": sum_norm}


# ---------------------------------------------------------------------------
# Merger (dict API)
# ---------------------------------------------------------------------------


class Merger:
    """Weighted-sum fusion of N runs (reference merger/merger.py)."""

    def __init__(self, norm: str = "min-max", weights: Optional[List[float]] = None):
        self.norm = norm
        self.params = {"weights": weights} if weights is not None else None

    def fuse(self, results: List[Dict[str, float]], cutoff: int = 100):
        return self.mfuse([{"q_0": res} for res in results], cutoff)["q_0"]

    def mfuse(self, runs: List[Run], cutoff: int = 100) -> Run:
        norm_fn = _NORMS[self.norm]
        normalized = [norm_fn(run) for run in runs]
        weights = (
            [1.0] * len(runs) if self.params is None else self.params["weights"]
        )
        fused: Dict[str, Dict[str, float]] = defaultdict(lambda: defaultdict(float))
        for w, run in zip(weights, normalized):
            for q_id, results in run.items():
                for doc_id, s in results.items():
                    fused[q_id][doc_id] += w * s
        out: Run = {}
        for q_id, results in fused.items():
            ranked = sorted(results.items(), key=lambda kv: (-kv[1], kv[0]))
            out[q_id] = dict(ranked[:cutoff])
        return out

    def autotune(
        self,
        qrels: Run,
        runs: List[Run],
        metric: str = "ndcg",
        step: float = 0.1,
    ) -> dict:
        """Deterministic grid over (norm x weight simplex) maximizing
        ``metric`` (reference merger_autotune.py:4-33 semantics,
        library-free). Weights are searched on the step-grid simplex
        (sum == 1), which is what ranx `optimize_fusion` does."""
        best = (-1.0, None, None)
        for norm in ("min-max", "max", "sum"):
            for weights in _simplex_grid(len(runs), step):
                m = Merger(norm=norm, weights=list(weights))
                score = evaluate(qrels, m.mfuse(runs, cutoff=100), metric)
                if score > best[0]:
                    best = (score, norm, list(weights))
        self.norm = best[1]
        self.params = {"weights": best[2]}
        return {"norm": best[1], "params": self.params, "score": best[0]}


def _simplex_grid(n: int, step: float):
    """All weight vectors of length n on the step-grid simplex."""
    ticks = int(round(1.0 / step))

    def rec(left: int, slots: int):
        if slots == 1:
            yield (left,)
            return
        for i in range(left + 1):
            for rest in rec(left - i, slots - 1):
                yield (i,) + rest

    for combo in rec(ticks, n):
        yield tuple(i / ticks for i in combo)


# ---------------------------------------------------------------------------
# Ray-Data operator
# ---------------------------------------------------------------------------


def fuse_runs_ds(
    runs_ds,
    norm: str = "min-max",
    weights: Optional[List[float]] = None,
    cutoff: int = 100,
):
    """Fuse a runs Dataset (run_idx:int64, q_id:str, doc_id:str,
    score:float64) -> fused Dataset (q_id, rank, doc_id, score).

    Shuffle plan: (1) groupby(run_idx, q_id).map_groups — each group IS
    one run's results for one query, so its min/max/sum normalization
    stats are computed locally, vectorized, and never leave the group
    (the round-3 take_all + dict-broadcast is gone: at millions of
    queries no whole-stats Python dict ever exists on the driver or in
    the object store); (2) groupby(q_id, doc_id).sum; (3) per-query
    grouped top-k with the (-score, doc_id) tie rule.
    """
    import pyarrow as pa

    w = weights
    if norm not in ("min-max", "max", "sum"):
        raise NotImplementedError(norm)

    def normalize_group(group: pa.Table) -> pa.Table:
        s = group.column("score").to_numpy().astype(np.float64)
        lo, hi, total = s.min(), s.max(), s.sum()
        if norm == "min-max":
            v = (s - lo) / max(hi - lo, 1e-9)
        elif norm == "max":
            v = s / max(hi, 1e-9)
        else:  # sum
            v = (s - lo) / max(total - lo * len(s), 1e-9)
        weight = 1.0 if w is None else w[int(group.column("run_idx")[0].as_py())]
        return pa.Table.from_arrays(
            [
                group.column("q_id"),
                group.column("doc_id"),
                pa.array(weight * v),
            ],
            names=["q_id", "doc_id", "wscore"],
        )

    def topk(group: pa.Table) -> pa.Table:
        q = group.column("q_id")[0].as_py()
        docs = np.asarray(group.column("sum(wscore)").to_pylist())
        ids = np.asarray(group.column("doc_id").to_pylist(), dtype=object)
        order = np.lexsort((ids, -docs))[:cutoff]
        return pa.Table.from_arrays(
            [
                pa.array([q] * len(order), type=pa.string()),
                pa.array(np.arange(1, len(order) + 1, dtype=np.int32)),
                pa.array(ids[order], type=pa.string()),
                pa.array(docs[order]),
            ],
            names=["q_id", "rank", "doc_id", "score"],
        )

    return (
        runs_ds.groupby(["run_idx", "q_id"])
        .map_groups(normalize_group, batch_format="pyarrow")
        .groupby(["q_id", "doc_id"])
        .sum("wscore")
        .groupby("q_id")
        .map_groups(topk, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# Reciprocal-rank fusion (RRF, Cormack et al. 2009)
# ---------------------------------------------------------------------------

RRF_SCALE = 1_000_000


def rrf_fuse(
    results: List[Dict[str, float]], k: int = 60, cutoff: int = 100
) -> Dict[str, int]:
    """Score-free rank fusion: each run contributes
    ``floor(1e6 / (k + rank))`` per doc (rank 1-based by (-score,
    doc_id)); docs sum across runs, ties break by doc_id ascending.
    The 1e6 quantization makes every score an exact integer —
    partition-order-independent and reproducible in SQL — while
    preserving the classic 1/(k+r) ordering for any plausible run
    depth. Returns {doc_id: score_e6} in fused rank order."""
    fused: Dict[str, int] = {}
    for run in results:
        ranked = sorted(run.items(), key=lambda kv: (-kv[1], kv[0]))
        for r_, (doc, _s) in enumerate(ranked, 1):
            fused[doc] = fused.get(doc, 0) + RRF_SCALE // (k + r_)
    out = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:cutoff]
    return dict(out)


def rrf_fuse_ds(runs_ds, k: int = 60, cutoff: int = 100):
    """Dataset form of :func:`rrf_fuse` over (run_idx:int64, q_id:str,
    doc_id:str, score:float64) rows -> (q_id, rank, doc_id, score_e6).

    Shuffle plan mirrors :func:`fuse_runs_ds`: (1) groupby(run_idx,
    q_id).map_groups ranks each run's results for one query locally
    ((-score, doc_id) lexsort — doc_id tie order is the STRING order,
    so callers comparing against numeric oracles should zero-pad) and
    converts ranks to integer RRF contributions; (2) one
    groupby(q_id, doc_id).sum of int64 addends — exact under any
    partitioning; (3) per-query grouped top-k. No stats ever gather on
    the driver at any query count."""
    import pyarrow as pa

    def contribs(group: "pa.Table") -> "pa.Table":
        s = group.column("score").to_numpy().astype(np.float64)
        ids = np.asarray(group.column("doc_id").to_pylist(), dtype=object)
        order = np.lexsort((ids, -s))
        ranks = np.empty(len(order), dtype=np.int64)
        ranks[order] = np.arange(1, len(order) + 1)
        return pa.Table.from_arrays(
            [
                group.column("q_id"),
                group.column("doc_id"),
                pa.array(RRF_SCALE // (k + ranks)),
            ],
            names=["q_id", "doc_id", "rrf_e6"],
        )

    def topk(group: pa.Table) -> pa.Table:
        q = group.column("q_id")[0].as_py()
        scores = np.asarray(
            group.column("sum(rrf_e6)").to_pylist(), dtype=np.int64
        )
        ids = np.asarray(group.column("doc_id").to_pylist(), dtype=object)
        order = np.lexsort((ids, -scores))[:cutoff]
        return pa.Table.from_arrays(
            [
                pa.array([q] * len(order), type=pa.string()),
                pa.array(np.arange(1, len(order) + 1, dtype=np.int32)),
                pa.array(ids[order], type=pa.string()),
                pa.array(scores[order]),
            ],
            names=["q_id", "rank", "doc_id", "score_e6"],
        )

    return (
        runs_ds.groupby(["run_idx", "q_id"])
        .map_groups(contribs, batch_format="pyarrow")
        .groupby(["q_id", "doc_id"])
        .sum("rrf_e6")
        .groupby("q_id")
        .map_groups(topk, batch_format="pyarrow")
    )
