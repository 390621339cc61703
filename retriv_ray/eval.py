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


def rank_eval_ds(
    run,
    qrels,
    k: int = 10,
    q_col: str = "q_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
):
    """Distributed rank evaluation: per-query MRR / nDCG@k / recall@k
    over a run Dataset (q_id, rank, doc_id) and a qrels Dataset
    (q_id, doc_id, rel int>0). Returns one row per qrels query —
    (q_id, rr_e6, ndcg_e6, recall_e6, n_rel) — every column an exact
    integer, so the result is bit-identical under any partitioning
    and SQL-checkable at millions of queries.

    Exactness contract (what makes order-free aggregation exact):
    each ranked hit contributes the INTEGER
    ``floor(1e9 * (2^rel - 1) / log2(rank + 1))`` to DCG (one float
    expression -> floor, identical in SQL); the ideal DCG sums the
    same terms over the relevance-sorted prefix. Integer sums are
    order-independent; ``ndcg_e6 = (dcg * 1e6) // idcg``.
    ``rr_e6 = 1e6 // first_relevant_rank`` (0 when no hit in top-k),
    ``recall_e6 = (hits@k * 1e6) // n_rel``.

    Shuffle shape: ONE q_id-keyed co-group of the side-tagged union
    (run rows filtered to rank <= k BEFORE the exchange, qrels rows
    as-is) — per-group size is k + |qrels_q|; the driver holds
    nothing. Queries absent from the run score 0 (ranx behavior);
    run-only queries (no qrels) are omitted like ranx skips them.
    """
    import pyarrow as pa

    def _dcg_term_e9(rel: np.ndarray, pos: np.ndarray) -> np.ndarray:
        # floor(1e9 * (2^rel - 1) / log2(pos + 1)) as int64, elementwise
        val = (np.power(2.0, rel.astype(np.float64)) - 1.0) / np.log2(
            pos.astype(np.float64) + 1.0
        )
        return np.floor(1e9 * val).astype(np.int64)

    union_schema = pa.schema(
        [
            (q_col, pa.string()),
            (doc_col, pa.int64()),
            ("x", pa.int64()),  # side 0: rank; side 1: rel
            ("side", pa.int8()),
        ]
    )

    def tag_run(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        batch = batch.filter(pc.less_equal(batch.column(rank_col), k))
        return pa.Table.from_arrays(
            [
                pc.cast(batch.column(q_col), pa.string()),
                pc.cast(batch.column(doc_col), pa.int64()),
                pc.cast(batch.column(rank_col), pa.int64()),
                pa.array(np.zeros(batch.num_rows, dtype=np.int8)),
            ],
            names=union_schema.names,
        )

    def tag_qrels(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.Table.from_arrays(
            [
                pc.cast(batch.column(q_col), pa.string()),
                pc.cast(batch.column(doc_col), pa.int64()),
                pc.cast(batch.column(rel_col), pa.int64()),
                pa.array(np.ones(batch.num_rows, dtype=np.int8)),
            ],
            names=union_schema.names,
        )

    def per_query(group: pa.Table) -> pa.Table:
        q = group.column(q_col)[0].as_py()
        side = group.column("side").to_numpy()
        docs = group.column(doc_col).to_numpy()
        x = group.column("x").to_numpy()
        rel_map_docs = docs[side == 1]
        rel_map_gain = x[side == 1]
        pos_mask = rel_map_gain > 0
        rel_map_docs, rel_map_gain = (
            rel_map_docs[pos_mask],
            rel_map_gain[pos_mask],
        )
        n_rel = len(rel_map_docs)
        if n_rel == 0:
            # run-only query: no qrels -> omitted (ranx skips it)
            return pa.Table.from_arrays(
                [pa.array([], type=t) for t in
                 (pa.string(), pa.int64(), pa.int64(), pa.int64(), pa.int64())],
                names=[q_col, "rr_e6", "ndcg_e6", "recall_e6", "n_rel"],
            )
        ranks = x[side == 0]
        rdocs = docs[side == 0]
        order = np.argsort(ranks, kind="stable")
        ranks, rdocs = ranks[order], rdocs[order]
        so = np.argsort(rel_map_docs, kind="stable")
        smap_d, smap_g = rel_map_docs[so], rel_map_gain[so]
        at = np.searchsorted(smap_d, rdocs)
        ok = (at < n_rel) & (smap_d[np.minimum(at, n_rel - 1)] == rdocs)
        gains = np.where(ok, smap_g[np.minimum(at, n_rel - 1)], 0)
        hit = gains > 0
        rr_e6 = int(10**6 // ranks[hit][0]) if hit.any() else 0
        dcg = int(_dcg_term_e9(gains[hit], ranks[hit]).sum()) if hit.any() else 0
        ideal = np.sort(smap_g)[::-1][: min(k, n_rel)]
        idcg = int(
            _dcg_term_e9(ideal, np.arange(1, len(ideal) + 1)).sum()
        )
        ndcg_e6 = (dcg * 10**6) // idcg if idcg > 0 else 0
        recall_e6 = (int(hit.sum()) * 10**6) // n_rel
        return pa.Table.from_arrays(
            [
                pa.array([q], type=pa.string()),
                pa.array([rr_e6], type=pa.int64()),
                pa.array([ndcg_e6], type=pa.int64()),
                pa.array([recall_e6], type=pa.int64()),
                pa.array([n_rel], type=pa.int64()),
            ],
            names=[q_col, "rr_e6", "ndcg_e6", "recall_e6", "n_rel"],
        )

    tagged = run.map_batches(tag_run, batch_format="pyarrow").union(
        qrels.map_batches(tag_qrels, batch_format="pyarrow")
    )
    return tagged.groupby(q_col).map_groups(per_query, batch_format="pyarrow")


def rank_eval_bootstrap_ds(
    per_query,
    n_boot: int = 20,
    q_col: str = "q_id",
):
    """Bootstrap confidence evidence for rank metrics: ``n_boot``
    deterministic resamples of the per-query metric rows (the output
    of :func:`rank_eval_ds`), each query drawn with weight
    ``md5_low64(q_id || '|' || b) % 3`` (mean 1 — the multinomial
    bootstrap's integer surrogate; deterministic, so op and oracle
    agree bit for bit). Returns one row per resample:
    (b, w_n, w_rr_e6, w_ndcg_e6, w_recall_e6) — all exact int64 sums;
    the resample means (and their spread = the confidence interval)
    are ratios of these integers, computed client-side.

    Shuffle shape: each block emits ``n_boot`` partial rows (a
    [rows x n_boot] weight matrix contracted against the metric
    columns); ONE groupby(b).sum finishes. The per-query table never
    concentrates anywhere.
    """
    import hashlib as _hl

    import pyarrow as pa

    from ray.data.aggregate import Sum

    cols = ["rr_e6", "ndcg_e6", "recall_e6"]
    names = ["b", "w_n"] + [f"w_{c}" for c in cols]

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or q_col not in batch.schema.names:
            return pa.Table.from_arrays(
                [pa.array([], type=pa.int64())] * len(names), names=names
            )
        qids = batch.column(q_col).to_pylist()
        w = np.empty((len(qids), n_boot), dtype=np.int64)
        for i, q in enumerate(qids):
            for b in range(n_boot):
                h = int.from_bytes(
                    _hl.md5(f"{q}|{b}".encode()).digest()[8:16], "little"
                )
                w[i, b] = h % 3
        mats = [
            batch.column(c).to_numpy(zero_copy_only=False) for c in cols
        ]
        out = [
            pa.array(np.arange(n_boot, dtype=np.int64)),
            pa.array(w.sum(axis=0)),
        ]
        for m in mats:
            out.append(pa.array(m @ w))
        return pa.Table.from_arrays(out, names=names)

    agg = (
        per_query.map_batches(partial, batch_format="pyarrow")
        .groupby("b")
        .aggregate(*[Sum(c, alias_name=c) for c in names[1:]])
    )
    return agg.sort("b")
