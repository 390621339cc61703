"""Distributed Lloyd k-means over an embedding column, integer-exact.

Float k-means is irreproducible across partitionings (accumulation
order changes both the centroid sums and near-tie assignments), so —
like ``ops.ann.group_centroids`` — every vector component is
quantized to ``floor(scale * x)`` BEFORE any arithmetic and the whole
algorithm runs in int64: squared distances, argmin assignment
(ties -> lowest centroid id), centroid updates by exact floor
division of the int sums. The result is bit-identical under ANY
partitioning / summation order and reproducible in SQL, which is what
makes the driver oracle possible. ``scale`` should be a power of two
so the quantizing multiply is itself exact in IEEE double.

Shuffle shape (the 100 TB plan): the input is quantized once and
cached in the object store (iterative algorithms re-read their input
every Lloyd round; one materialize here replaces ``iters`` full
re-reads — blocks spill if oversized). Each round is ONE streaming
``map_batches`` pass computing per-batch per-cluster partial sums
(k x d rows per batch — the combiner) followed by a tiny
``groupby(cluster, dim)`` whose input is bounded by blocks x k x d,
never by the corpus. Centroids (k x d int64) travel by ``ray.put``
broadcast. The driver holds only k x d integers per round.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pyarrow as pa

from retriv_ray.ops.ann import _batch_matrix


def _quantize_ds(ds, vec_col: str, id_col: str, scale: int):
    def q(batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, vec_col).astype(np.float64)
        qm = np.floor(np.float64(scale) * m).astype(np.int64)
        return pa.Table.from_arrays(
            [
                batch.column(id_col),
                pa.FixedSizeListArray.from_arrays(
                    pa.array(qm.reshape(-1)), qm.shape[1]
                ),
            ],
            names=[id_col, "q"],
        )

    return ds.map_batches(q, batch_format="pyarrow")


def _q_matrix(batch: pa.Table, id_col: str) -> Tuple[np.ndarray, np.ndarray]:
    ids = batch.column(id_col).to_numpy()
    col = batch.column("q").combine_chunks()
    d = col.type.list_size
    m = col.flatten().to_numpy().reshape(len(col), d)
    return ids, m


def _assign(qm: np.ndarray, cent: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(cluster_ordinal, d2) per row; int64-exact, ties -> lowest
    ordinal (np.argmin picks the first minimum)."""
    # d2 = |q|^2 - 2 q.c + |c|^2, all int64 (magnitudes bounded by
    # dim * (2*scale*|x|max)^2 — callers pick scale accordingly)
    cross = qm @ cent.T
    d2 = (
        (qm * qm).sum(axis=1, dtype=np.int64)[:, None]
        - 2 * cross
        + (cent * cent).sum(axis=1, dtype=np.int64)[None, :]
    )
    a = np.argmin(d2, axis=1)
    return a.astype(np.int64), d2[np.arange(len(a)), a]


def _init_centroids(qds, id_col: str, k: int) -> Tuple[np.ndarray, np.ndarray]:
    """Quantized vectors of the k smallest ids: per-batch partial
    k-smallest, then a distributed sort over the k-per-block survivors
    (k x num_blocks rows — the only data that ever moves) and a k-row
    limit, so the driver receives exactly k rows regardless of input
    size."""

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        keep = np.argsort(ids, kind="stable")[:k]
        return batch.take(pa.array(np.sort(keep)))

    rows = (
        qds.map_batches(partial, batch_format="pyarrow")
        .sort(id_col)
        .limit(k)
        .take_all()
    )
    if len(rows) < k:
        raise ValueError(f"k={k} exceeds dataset size {len(rows)}")
    ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    cent = np.array([r["q"] for r in rows], dtype=np.int64)
    return ids, cent


def kmeans_assign(
    ds,
    k: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 1024,
    concurrency: Optional[int] = None,
):
    """Run ``iters`` integer-exact Lloyd rounds (centroids seeded from
    the k smallest ids) and return a Dataset of
    (id_col, cluster, d2): the final assignment, where ``cluster`` is
    the seed vector's id and ``d2`` the quantized squared distance."""
    import ray
    from ray.data.aggregate import Sum

    if iters < 1:
        raise ValueError("iters must be >= 1")
    qds = _quantize_ds(ds, vec_col, id_col, scale).materialize()
    init_ids, cent = _init_centroids(qds, id_col, k)
    d = cent.shape[1]

    for _ in range(iters - 1):
        cref = ray.put(cent)

        def partial_sums(batch: pa.Table) -> pa.Table:
            c = ray.get(cref)
            _ids, qm = _q_matrix(batch, id_col)
            a, _d2 = _assign(qm, c)
            order = np.argsort(a, kind="stable")
            asg = a[order]
            starts = np.flatnonzero(
                np.concatenate(([True], asg[1:] != asg[:-1]))
            )
            bounds = np.append(starts, len(asg))
            out_c, out_dim, out_n, out_s = [], [], [], []
            for lo, hi in zip(bounds[:-1], bounds[1:]):
                rows = qm[order[lo:hi]]
                out_c.append(np.full(d, asg[lo], dtype=np.int64))
                out_dim.append(np.arange(d, dtype=np.int64))
                out_n.append(np.full(d, hi - lo, dtype=np.int64))
                out_s.append(rows.sum(axis=0, dtype=np.int64))
            if not out_c:
                return pa.Table.from_arrays(
                    [pa.array([], type=pa.int64())] * 4,
                    names=["cluster", "dim", "n", "s"],
                )
            return pa.Table.from_arrays(
                [
                    pa.array(np.concatenate(out_c)),
                    pa.array(np.concatenate(out_dim)),
                    pa.array(np.concatenate(out_n)),
                    pa.array(np.concatenate(out_s)),
                ],
                names=["cluster", "dim", "n", "s"],
            )

        agg = (
            qds.map_batches(
                partial_sums, batch_format="pyarrow", concurrency=concurrency
            )
            .groupby(["cluster", "dim"])
            .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"))
        )
        new = cent.copy()  # empty clusters keep their previous centroid
        for row in agg.take_all():  # bounded: k x d rows
            c_i, dim_i = int(row["cluster"]), int(row["dim"])
            new[c_i, dim_i] = np.int64(row["s"]) // np.int64(row["n"])
        cent = new

    cref = ray.put((init_ids, cent))

    def final(batch: pa.Table) -> pa.Table:
        ids_map, c = ray.get(cref)
        ids, qm = _q_matrix(batch, id_col)
        a, d2 = _assign(qm, c)
        return pa.Table.from_arrays(
            [
                pa.array(ids.astype(np.int64)),
                pa.array(ids_map[a]),
                pa.array(d2),
            ],
            names=[id_col, "cluster", "d2"],
        )

    return qds.map_batches(
        final, batch_format="pyarrow", concurrency=concurrency
    )
