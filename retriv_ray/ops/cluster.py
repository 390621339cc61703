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


def _lloyd_centroids(qds, id_col: str, k: int, iters: int, concurrency):
    """Shared Lloyd loop over an already-quantized (id, q) Dataset:
    seed from the k smallest ids, run ``iters - 1`` integer-exact
    update rounds, return ``(seed_ids, centroids)``. Each round is one
    streaming combiner pass + a k x d groupby; the driver holds only
    k x d integers (see module docstring)."""
    import ray
    from ray.data.aggregate import Sum

    if iters < 1:
        raise ValueError("iters must be >= 1")
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

    return init_ids, cent


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

    qds = _quantize_ds(ds, vec_col, id_col, scale).materialize()
    init_ids, cent = _lloyd_centroids(qds, id_col, k, iters, concurrency)

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


# ---------------------------------------------------------------------------
# SemDeDup-style semantic deduplication
# ---------------------------------------------------------------------------

SEMANTIC_DEDUP_MAX_CLUSTER_ROWS = 100_000


def semantic_dedup(
    ds,
    k: int = 8,
    iters: int = 2,
    threshold_e4: int = 9500,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 64,
    concurrency: Optional[int] = None,
    max_cluster_rows: Optional[int] = None,
):
    """SemDeDup (Abbas et al. 2023) as a streaming Dataset op: k-means
    cluster the embeddings, then WITHIN each cluster drop every vector
    that has a >= threshold cosine neighbor with a smaller id. Returns
    the kept rows as (id_col, cluster).

    The keeper policy is lowest-id (the paper keeps an arbitrary /
    low-centroid-similarity member per duplicate group; lowest-id is
    the deterministic, partitioning-independent choice this engine
    uses everywhere). The drop rule is pairwise, not transitive: a row
    is dropped iff SOME smaller-id row of its cluster is >= threshold
    similar, whether or not that row is itself kept — one consistent
    pass, no iteration, and expressible as a SQL NOT EXISTS for the
    driver oracle.

    Exactness: vectors are quantized to floor(scale * x) int64 (scale
    a power of two) and the cosine test runs ENTIRELY in int64
    cross-multiplied form —

        dup(a, b)  <=>  dot > 0  and  dot^2 * 1e8 >= t_e4^2 * nn_a * nn_b

    (dot = <q_a, q_b>, nn = |q|^2, threshold = t_e4 / 1e4) — no float
    enters the comparison, so the result is bit-identical under any
    partitioning and in SQL. The default ``scale=64`` keeps every
    product within int64 for unit-norm embeddings up to ~74 dims; the
    op validates the actual bound per group and raises with guidance
    if dim * scale^2 is too large. Zero vectors are never duplicates
    of anything (dot > 0 fails).

    Shuffle shape (100 TB plan): quantize once (object store), Lloyd
    rounds as streaming combiner passes (k x d driver state), then ONE
    groupby(cluster) shuffle moving (id, cluster, q). The in-cluster
    O(n_c^2) similarity runs blockwise inside map_groups (memory
    O(n_c * block)); n_c is controlled by k — SemDeDup's own scaling
    story is k ~ corpus / 1000. Clusters above ``max_cluster_rows``
    raise rather than silently thrash; raise k instead.
    """
    import ray

    if not (0 < threshold_e4 <= 10_000):
        raise ValueError("threshold_e4 must be in (0, 10000]")
    cap = max_cluster_rows or SEMANTIC_DEDUP_MAX_CLUSTER_ROWS
    te4 = int(threshold_e4)

    qds = _quantize_ds(ds, vec_col, id_col, scale).materialize()
    init_ids, cent = _lloyd_centroids(qds, id_col, k, iters, concurrency)
    cref = ray.put((init_ids, cent))

    def assign_with_q(batch: pa.Table) -> pa.Table:
        ids_map, c = ray.get(cref)
        ids, qm = _q_matrix(batch, id_col)
        a, _d2 = _assign(qm, c)
        return pa.Table.from_arrays(
            [
                pa.array(ids.astype(np.int64)),
                pa.array(ids_map[a]),
                batch.column("q"),
            ],
            names=[id_col, "cluster", "q"],
        )

    def prune(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n > cap:
            raise ValueError(
                f"semantic_dedup cluster of {n} rows exceeds "
                f"max_cluster_rows={cap}; raise k (SemDeDup scales by "
                "shrinking clusters, k ~ corpus_size / 1000) or pass "
                "max_cluster_rows explicitly"
            )
        ids, qm = _q_matrix(group, id_col)
        order = np.argsort(ids, kind="stable")
        ids, qm = ids[order], qm[order]
        nn = (qm * qm).sum(axis=1, dtype=np.int64)
        max_nn = int(nn.max()) if n else 0
        # every product below must fit int64:
        #   dot^2 * 1e8  and  te4^2 * nn_a * nn_b,  |dot| <= max_nn
        if max_nn and max_nn * max_nn > (2**63 - 1) // max(
            10**8, te4 * te4
        ):
            raise ValueError(
                f"semantic_dedup int64 overflow risk: max |q|^2 = "
                f"{max_nn} (dim * scale^2 too large) — lower scale="
                "(power of two) so dim * scale^2 <= ~3e5"
            )
        dropped = np.zeros(n, dtype=bool)
        blk = 1024
        for lo in range(0, n, blk):
            hi = min(lo + blk, n)
            dot = qm[lo:hi] @ qm.T  # int64-exact within the bound
            rhs = (te4 * te4) * (nn[lo:hi, None] * nn[None, :])
            dup = (dot > 0) & (dot * dot * 10**8 >= rhs)
            # only smaller-id columns count for each row in the block
            col = np.arange(n)[None, :] < np.arange(lo, hi)[:, None]
            dropped[lo:hi] = (dup & col).any(axis=1)
        keep = pa.array(np.flatnonzero(~dropped), type=pa.int64())
        t = pa.Table.from_arrays(
            [pa.array(ids), group.column("cluster").take(pa.array(order))],
            names=[id_col, "cluster"],
        )
        return t.take(keep)

    return (
        qds.map_batches(
            assign_with_q, batch_format="pyarrow", concurrency=concurrency
        )
        .groupby("cluster")
        .map_groups(prune, batch_format="pyarrow")
    )
