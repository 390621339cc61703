"""Rank-evaluation metrics (ndcg / map / mrr / recall / precision / hits).

The reference delegates evaluation to the `ranx` library inside its
autotune loops (retriv/autotune/bm25_autotune.py:5,15 and
merger_autotune.py:1); ranx is not available here, so the metrics the
retriv docs actually exercise are re-implemented from their standard
definitions (vectorized numpy, ranx-compatible semantics):

- run:   {q_id: {doc_id: score}}  (scores float, higher = better)
- qrels: {q_id: {doc_id: relevance}} (int/float gains)
- metric strings accept a "@k" suffix ("ndcg@100", "mrr", "map@10").

Ranking order for evaluation is (-score, doc_id) — deterministic and
identical to the engine's own tie rule.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

Run = Dict[str, Dict[str, float]]
Qrels = Dict[str, Dict[str, float]]


def _parse_metric(metric: str) -> Tuple[str, int]:
    if "@" in metric:
        name, k = metric.split("@", 1)
        return name.strip().lower(), int(k)
    return metric.strip().lower(), 0


def _ranked_ids(results: Dict[str, float], k: int):
    ids = sorted(results, key=lambda d: (-results[d], d))
    return ids[:k] if k else ids


def _dcg(gains: np.ndarray) -> float:
    if gains.size == 0:
        return 0.0
    discounts = 1.0 / np.log2(np.arange(2, gains.size + 2))
    return float(np.sum((np.power(2.0, gains) - 1.0) * discounts))


def evaluate(qrels: Qrels, run: Run, metric: str = "ndcg") -> float:
    """Mean metric over the queries present in ``qrels`` (queries
    missing from the run score 0 — ranx behavior)."""
    name, k = _parse_metric(metric)
    scores = []
    for q_id, rels in qrels.items():
        rels = {d: g for d, g in rels.items() if g > 0}
        res = run.get(q_id, {})
        ranked = _ranked_ids(res, k)
        if name == "ndcg":
            gains = np.asarray([rels.get(d, 0.0) for d in ranked], dtype=np.float64)
            ideal = np.asarray(
                sorted(rels.values(), reverse=True)[: (k or len(rels))],
                dtype=np.float64,
            )
            idcg = _dcg(ideal)
            scores.append(_dcg(gains) / idcg if idcg > 0 else 0.0)
        elif name in ("mrr", "rr"):
            rr = 0.0
            for rank, d in enumerate(ranked, start=1):
                if d in rels:
                    rr = 1.0 / rank
                    break
            scores.append(rr)
        elif name in ("map", "ap"):
            hits, ap = 0, 0.0
            for rank, d in enumerate(ranked, start=1):
                if d in rels:
                    hits += 1
                    ap += hits / rank
            scores.append(ap / len(rels) if rels else 0.0)
        elif name == "recall":
            hits = sum(1 for d in ranked if d in rels)
            scores.append(hits / len(rels) if rels else 0.0)
        elif name == "precision":
            denom = k or len(ranked)
            hits = sum(1 for d in ranked if d in rels)
            scores.append(hits / denom if denom else 0.0)
        elif name in ("hits", "hit_rate"):
            scores.append(1.0 if any(d in rels for d in ranked) else 0.0)
        else:
            raise ValueError(f"unknown metric {metric!r}")
    return float(np.mean(scores)) if scores else 0.0
