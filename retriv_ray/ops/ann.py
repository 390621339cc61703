"""Similarity search over an embedding column (list<float>).

- :func:`cosine_topk_bruteforce` — the exact baseline: one numpy
  matmul per batch against a broadcast query matrix (``ray.put`` once,
  read zero-copy in every task), per-batch partial top-k, then a tiny
  per-query merge. Work is embarrassingly parallel; the only shuffle
  is over Q x k partial rows.
- :func:`cosine_topk_lsh` — the scale path: random-hyperplane LSH
  buckets (signature prefix) computed per batch; candidates =
  vectors sharing a bucket with the query under any of ``n_tables``
  hyperplane tables; exact cosine re-rank of candidates only.
  Approximate (recall < 1 possible), deterministic given the seed.
- :func:`cosine_topk_ivf` — the other classic scale path: spherical
  k-means centroids trained on a bounded sample (driver-side, like
  every IVF trainer); each query probes its ``nprobe`` nearest
  centroids; per batch, rows are assigned to their centroid and only
  rows in probed cells are scored. ``nprobe >= n_centroids`` is
  exhaustive and EQUALS the brute-force result (the driver query uses
  that to oracle-check the IVF machinery end-to-end).

Both compute cosine in float64 so results are comparable against a
DuckDB ``list_cosine_similarity`` oracle at rank level.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _batch_matrix(batch: pa.Table, col: str) -> np.ndarray:
    lists = batch.column(col)
    flat = lists.combine_chunks().flatten().to_numpy(zero_copy_only=False)
    n = len(lists)
    return flat.astype(np.float64).reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norm = np.linalg.norm(m, axis=1, keepdims=True)
    norm[norm == 0] = 1.0
    return m / norm


def cosine_topk_bruteforce(
    ds,
    query_ids: np.ndarray,
    query_vecs: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    return_sims: bool = False,
):
    """Exact top-k by cosine for each query vector. Returns a Dataset
    (q_vec_id, rank, vec_id) — rank 1-based, ties broken by vec_id
    ascending (deterministic, matches the SQL oracle ordering); with
    ``return_sims`` a ``sim`` float64 column is appended (hybrid
    fusion consumes it)."""
    import ray

    qn = _normalize(np.asarray(query_vecs, dtype=np.float64))
    q_ref = ray.put((np.asarray(query_ids, dtype=np.int64), qn))

    def partial(batch: pa.Table) -> pa.Table:
        q_ids, qmat = ray.get(q_ref)
        ids = batch.column(id_col).to_numpy()
        m = _normalize(_batch_matrix(batch, vec_col))
        sims = qmat @ m.T  # [Q, B]
        out_q, out_v, out_s = [], [], []
        kk = min(k + (1 if exclude_self else 0), sims.shape[1])
        for qi in range(sims.shape[0]):
            row = sims[qi]
            # partial top-k within the batch (deterministic order fixed at merge)
            idx = np.argpartition(-row, kk - 1)[:kk] if kk < len(row) else np.arange(len(row))
            out_q.append(np.full(len(idx), q_ids[qi], dtype=np.int64))
            out_v.append(ids[idx])
            out_s.append(row[idx])
        return pa.Table.from_arrays(
            [
                pa.array(np.concatenate(out_q)),
                pa.array(np.concatenate(out_v)),
                pa.array(np.concatenate(out_s)),
            ],
            names=["q_vec_id", "vec_id", "sim"],
        )

    def merge(group: pa.Table) -> pa.Table:
        q = group.column("q_vec_id")[0].as_py()
        v = group.column("vec_id").to_numpy()
        s = group.column("sim").to_numpy()
        if exclude_self:
            keep = v != q
            v, s = v[keep], s[keep]
        order = np.lexsort((v, -s))[:k]
        arrays = [
            pa.array(np.full(len(order), q, dtype=np.int64)),
            pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            pa.array(v[order]),
        ]
        names = ["q_vec_id", "rank", "vec_id"]
        if return_sims:
            arrays.append(pa.array(s[order].astype(np.float64)))
            names.append("sim")
        return pa.Table.from_arrays(arrays, names=names)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("q_vec_id")
        .map_groups(merge, batch_format="pyarrow")
    )


def cosine_topk_lsh(
    ds,
    query_ids: np.ndarray,
    query_vecs: np.ndarray,
    k: int = 10,
    n_tables: int = 8,
    n_bits: int = 8,
    dim: Optional[int] = None,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
):
    """Approximate top-k: random-hyperplane signatures; a vector is a
    candidate for a query iff they share a full ``n_bits`` signature
    in any table; candidates re-ranked by exact cosine. Same output
    schema as the brute-force path (+ possible missing tail when
    recall < 1)."""
    import ray

    q_vecs = _normalize(np.asarray(query_vecs, dtype=np.float64))
    d = dim or q_vecs.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_bits, d))
    powers = (1 << np.arange(n_bits, dtype=np.int64))

    def signatures(mat: np.ndarray) -> np.ndarray:
        # [n_tables, N]
        return np.stack(
            [(((mat @ planes[t].T) > 0) @ powers) for t in range(n_tables)]
        )

    q_sigs = signatures(q_vecs)  # [T, Q]
    q_ref = ray.put((np.asarray(query_ids, dtype=np.int64), q_vecs, q_sigs))

    def candidates(batch: pa.Table) -> pa.Table:
        q_ids, qmat, qs = ray.get(q_ref)
        ids = batch.column(id_col).to_numpy()
        m = _normalize(_batch_matrix(batch, vec_col))
        sigs = signatures(m)  # [T, B]
        out_q, out_v, out_s = [], [], []
        for t in range(sigs.shape[0]):
            eq = qs[t][:, None] == sigs[t][None, :]  # [Q, B]
            qi, bi = np.nonzero(eq)
            if len(qi):
                out_q.append(q_ids[qi])
                out_v.append(ids[bi])
                out_s.append(np.einsum("ij,ij->i", qmat[qi], m[bi]))
        if not out_q:
            return pa.Table.from_arrays(
                [pa.array([], type=pa.int64())] * 2 + [pa.array([], type=pa.float64())],
                names=["q_vec_id", "vec_id", "sim"],
            )
        return pa.Table.from_arrays(
            [
                pa.array(np.concatenate(out_q)),
                pa.array(np.concatenate(out_v)),
                pa.array(np.concatenate(out_s)),
            ],
            names=["q_vec_id", "vec_id", "sim"],
        )

    def merge(group: pa.Table) -> pa.Table:
        q = group.column("q_vec_id")[0].as_py()
        v = group.column("vec_id").to_numpy()
        s = group.column("sim").to_numpy()
        v, idx = np.unique(v, return_index=True)
        s = s[idx]
        if exclude_self:
            keep = v != q
            v, s = v[keep], s[keep]
        order = np.lexsort((v, -s))[:k]
        return pa.Table.from_arrays(
            [
                pa.array(np.full(len(order), q, dtype=np.int64)),
                pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
                pa.array(v[order]),
            ],
            names=["q_vec_id", "rank", "vec_id"],
        )

    return (
        ds.map_batches(candidates, batch_format="pyarrow")
        .groupby("q_vec_id")
        .map_groups(merge, batch_format="pyarrow")
    )


def _spherical_kmeans(
    mat: np.ndarray, n_centroids: int, iters: int, seed: int
) -> np.ndarray:
    """Deterministic spherical k-means (unit centroids, cosine
    assignment) with k-means++ seeding. Pure numpy; the training
    sample is bounded, so this runs on the driver like every IVF
    trainer (faiss does the same)."""
    rng = np.random.default_rng(seed)
    x = _normalize(mat)
    n = len(x)
    k = min(n_centroids, n)
    # k-means++ seeding on cosine distance (1 - sim)
    first = int(rng.integers(n))
    cents = [x[first]]
    d2 = 1.0 - x @ cents[0]
    for _ in range(1, k):
        p = np.clip(d2, 1e-12, None)
        nxt = int(rng.choice(n, p=p / p.sum()))
        cents.append(x[nxt])
        d2 = np.minimum(d2, 1.0 - x @ cents[-1])
    c = np.stack(cents)
    for _ in range(iters):
        assign = np.argmax(x @ c.T, axis=1)
        for j in range(k):
            members = x[assign == j]
            if len(members):
                c[j] = members.sum(axis=0)
        c = _normalize(c)
    return c


def cosine_topk_ivf(
    ds,
    query_ids: np.ndarray,
    query_vecs: np.ndarray,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    train_rows: int = 4096,
    kmeans_iters: int = 10,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
):
    """IVF-pruned cosine top-k. Same output schema as the brute-force
    path. The inverted-file structure is applied as per-batch cell
    pruning (assign batch rows to centroids; score only rows in the
    query's probed cells) — one streaming pass, no bucket shuffle, and
    the centroid matrix is the only broadcast state. At 100 TB, train
    on ``ds.random_sample`` instead of the leading rows; the scan
    stays embarrassingly parallel either way."""
    import ray

    qn = _normalize(np.asarray(query_vecs, dtype=np.float64))
    sample = _batch_matrix(
        pa.concat_tables(
            list(ds.limit(train_rows).iter_batches(batch_format="pyarrow"))
        ),
        vec_col,
    )
    cents = _spherical_kmeans(sample, n_centroids, kmeans_iters, seed)
    n_cells = len(cents)
    probe = np.argsort(-(qn @ cents.T), axis=1)[:, : min(nprobe, n_cells)]
    probe_mask = np.zeros((len(qn), n_cells), dtype=bool)
    probe_mask[np.arange(len(qn))[:, None], probe] = True
    q_ref = ray.put(
        (np.asarray(query_ids, dtype=np.int64), qn, cents, probe_mask)
    )

    def partial(batch: pa.Table) -> pa.Table:
        q_ids, qmat, c, pmask = ray.get(q_ref)
        ids = batch.column(id_col).to_numpy()
        m = _normalize(_batch_matrix(batch, vec_col))
        assign = np.argmax(m @ c.T, axis=1)  # [B]
        out_q, out_v, out_s = [], [], []
        for qi in range(len(qmat)):
            keep = pmask[qi][assign]
            if not keep.any():
                continue
            idx = np.flatnonzero(keep)
            row = qmat[qi] @ m[idx].T
            kk = min(k + (1 if exclude_self else 0), len(idx))
            sel = (
                np.argpartition(-row, kk - 1)[:kk]
                if kk < len(row)
                else np.arange(len(row))
            )
            out_q.append(np.full(len(sel), q_ids[qi], dtype=np.int64))
            out_v.append(ids[idx[sel]])
            out_s.append(row[sel])
        if not out_q:
            return pa.Table.from_arrays(
                [pa.array([], type=pa.int64())] * 2
                + [pa.array([], type=pa.float64())],
                names=["q_vec_id", "vec_id", "sim"],
            )
        return pa.Table.from_arrays(
            [
                pa.array(np.concatenate(out_q)),
                pa.array(np.concatenate(out_v)),
                pa.array(np.concatenate(out_s)),
            ],
            names=["q_vec_id", "vec_id", "sim"],
        )

    def merge(group: pa.Table) -> pa.Table:
        q = group.column("q_vec_id")[0].as_py()
        v = group.column("vec_id").to_numpy()
        s = group.column("sim").to_numpy()
        if exclude_self:
            keep = v != q
            v, s = v[keep], s[keep]
        order = np.lexsort((v, -s))[:k]
        return pa.Table.from_arrays(
            [
                pa.array(np.full(len(order), q, dtype=np.int64)),
                pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
                pa.array(v[order]),
            ],
            names=["q_vec_id", "rank", "vec_id"],
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("q_vec_id")
        .map_groups(merge, batch_format="pyarrow")
    )


def _pq_train(
    sample: np.ndarray, m_sub: int, ks: int, iters: int, seed: int
) -> np.ndarray:
    """Per-subspace Lloyd k-means codebooks [m_sub, ks, d/m_sub] over
    the (normalized) training sample — the classic PQ trainer
    (Jegou et al. 2011). Deterministic k-means++ seeding per
    subspace; bounded sample, so it runs on the driver like the IVF
    trainer (faiss does the same)."""
    n, d = sample.shape
    if d % m_sub:
        raise ValueError(f"dim {d} not divisible by m_sub {m_sub}")
    dsub = d // m_sub
    k = min(ks, n)
    rng = np.random.default_rng(seed)
    books = np.empty((m_sub, k, dsub), dtype=np.float64)
    for m in range(m_sub):
        x = sample[:, m * dsub : (m + 1) * dsub]
        first = int(rng.integers(n))
        cents = [x[first]]
        d2 = ((x - cents[0]) ** 2).sum(axis=1)
        for _ in range(1, k):
            p = np.clip(d2, 1e-12, None)
            cents.append(x[int(rng.choice(n, p=p / p.sum()))])
            d2 = np.minimum(d2, ((x - cents[-1]) ** 2).sum(axis=1))
        c = np.stack(cents)
        for _ in range(iters):
            # argmin ||x - c||^2 == argmax (x.c - ||c||^2/2)
            assign = np.argmax(
                x @ c.T - 0.5 * (c * c).sum(axis=1)[None, :], axis=1
            )
            for j in range(k):
                members = x[assign == j]
                if len(members):
                    c[j] = members.mean(axis=0)
        books[m] = c
    return books


def _pq_encode(mat: np.ndarray, books: np.ndarray) -> np.ndarray:
    """[N, m_sub] int codes: nearest codeword per subspace."""
    m_sub, _k, dsub = books.shape
    codes = np.empty((len(mat), m_sub), dtype=np.int64)
    for m in range(m_sub):
        x = mat[:, m * dsub : (m + 1) * dsub]
        c = books[m]
        codes[:, m] = np.argmax(
            x @ c.T - 0.5 * (c * c).sum(axis=1)[None, :], axis=1
        )
    return codes


def cosine_topk_pq(
    ds,
    query_ids: np.ndarray,
    query_vecs: np.ndarray,
    k: int = 10,
    m_sub: int = 8,
    ks: int = 16,
    rerank: int = 64,
    train_rows: int = 4096,
    kmeans_iters: int = 10,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
):
    """Product-quantization cosine top-k (Jegou et al. 2011):
    per-batch vectors encode to ``m_sub`` codebook ids, each query
    scores the whole batch through its ADC lookup table (one [ks]
    gather + add per subspace — no full-dimension dot products), the
    best ``rerank`` ADC candidates per (query, batch) re-rank by
    EXACT cosine, and the global merge is the brute-force merge. With
    ``rerank`` comfortably above k the exact re-rank makes recall
    -> 1 (pinned by test; the driver query shares the brute-force SQL
    oracle exactly as the LSH/IVF paths do). Memory per worker:
    codebooks m_sub*ks*dim/m_sub doubles + the [Q, ks] ADC tables —
    independent of corpus size; the scan is one streaming pass."""
    import ray

    qn = _normalize(np.asarray(query_vecs, dtype=np.float64))
    sample = _normalize(
        _batch_matrix(
            pa.concat_tables(
                list(ds.limit(train_rows).iter_batches(batch_format="pyarrow"))
            ),
            vec_col,
        )
    )
    books = _pq_train(sample, m_sub, ks, kmeans_iters, seed)
    dsub = books.shape[2]
    # ADC tables: tab[q, m, c] = <q_sub_m, book_m_c>
    tab = np.einsum(
        "qmd,mcd->qmc",
        qn.reshape(len(qn), m_sub, dsub),
        books,
    )
    q_ref = ray.put((np.asarray(query_ids, dtype=np.int64), qn, books, tab))

    def partial(batch: pa.Table) -> pa.Table:
        q_ids, qmat, bks, t = ray.get(q_ref)
        ids = batch.column(id_col).to_numpy()
        m = _normalize(_batch_matrix(batch, vec_col))
        codes = _pq_encode(m, bks)  # [B, m_sub]
        approx = np.zeros((len(qmat), len(m)), dtype=np.float64)
        for sm in range(bks.shape[0]):
            approx += t[:, sm, codes[:, sm]]
        out_q, out_v, out_s = [], [], []
        cc = min(rerank + (1 if exclude_self else 0), len(m))
        for qi in range(len(qmat)):
            row = approx[qi]
            cand = (
                np.argpartition(-row, cc - 1)[:cc]
                if cc < len(row)
                else np.arange(len(row))
            )
            exact = qmat[qi] @ m[cand].T
            kk = min(k + (1 if exclude_self else 0), len(cand))
            sel = (
                np.argpartition(-exact, kk - 1)[:kk]
                if kk < len(exact)
                else np.arange(len(exact))
            )
            out_q.append(np.full(len(sel), q_ids[qi], dtype=np.int64))
            out_v.append(ids[cand[sel]])
            out_s.append(exact[sel])
        return pa.Table.from_arrays(
            [
                pa.array(np.concatenate(out_q)),
                pa.array(np.concatenate(out_v)),
                pa.array(np.concatenate(out_s)),
            ],
            names=["q_vec_id", "vec_id", "sim"],
        )

    def merge(group: pa.Table) -> pa.Table:
        q = group.column("q_vec_id")[0].as_py()
        v = group.column("vec_id").to_numpy()
        s = group.column("sim").to_numpy()
        if exclude_self:
            keep = v != q
            v, s = v[keep], s[keep]
        order = np.lexsort((v, -s))[:k]
        return pa.Table.from_arrays(
            [
                pa.array(np.full(len(order), q, dtype=np.int64)),
                pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
                pa.array(v[order]),
            ],
            names=["q_vec_id", "rank", "vec_id"],
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("q_vec_id")
        .map_groups(merge, batch_format="pyarrow")
    )


def group_centroids(
    ds,
    group_col: str = "label",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
):
    """Per-group embedding centroid numerators, integer-exact: each
    vector component is quantized to ``floor(scale * x)`` BEFORE
    summation, so the per-(group, dim) sums are int64 and identical
    under ANY summation order / partitioning (float accumulation
    order-dependence is the classic distributed-centroid
    irreproducibility; quantize-then-sum removes it, and the true
    centroid is ``sum_e6 / (scale * n)`` to 1/scale precision).
    Returns one row per (group, dim): (group, dim, n, sum_e6) — dim is
    1-based to match SQL array subscripts.

    Scale plan: the k-means-update shape — a per-batch combiner sums
    each group's floored matrix locally (shuffle moves groups×dims
    rows per batch, never vectors), then one tiny
    ``groupby(group, dim)`` finishes. This is exactly the reducer an
    IVF/k-means trainer needs, factored as a reusable oracle-checked
    op.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, vec_col).astype(np.float64)
        q = np.floor(np.float64(scale) * m).astype(np.int64)
        g = batch.column(group_col).to_numpy()
        order = np.argsort(g, kind="stable")
        gs = g[order]
        starts = np.flatnonzero(
            np.concatenate(([True], gs[1:] != gs[:-1]))
        )
        d = q.shape[1]
        out_g, out_dim, out_n, out_s = [], [], [], []
        bounds = np.append(starts, len(gs))
        for a, b in zip(bounds[:-1], bounds[1:]):
            rows = q[order[a:b]]
            out_g.append(np.full(d, gs[a], dtype=np.int64))
            out_dim.append(np.arange(1, d + 1, dtype=np.int64))
            out_n.append(np.full(d, b - a, dtype=np.int64))
            out_s.append(rows.sum(axis=0, dtype=np.int64))
        if not out_g:
            return pa.Table.from_arrays(
                [pa.array([], type=pa.int64())] * 4,
                names=[group_col, "dim", "n", "sum_e6"],
            )
        return pa.Table.from_arrays(
            [
                pa.array(np.concatenate(out_g)),
                pa.array(np.concatenate(out_dim)),
                pa.array(np.concatenate(out_n)),
                pa.array(np.concatenate(out_s)),
            ],
            names=[group_col, "dim", "n", "sum_e6"],
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([group_col, "dim"])
        .aggregate(Sum("n", alias_name="n"), Sum("sum_e6", alias_name="sum_e6"))
    )
    return out


# ---------------------------------------------------------------------------
# kNN join (kNN graph): top-k neighbors for EVERY vector
# ---------------------------------------------------------------------------

KNN_JOIN_MAX_ROWS = 2_000_000


def knn_join(
    ds,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "exact",
    block_rows: int = 8192,
    n_tables: int = 16,
    n_bits: int = 6,
    seed: int = 11,
):
    """kNN self-join: (vec_id, rank, nbr_id) — each vector's top-``k``
    cosine neighbors, self excluded, ties by ascending neighbor id.
    The kNN-graph primitive under SemDeDup-style curation, graph
    clustering, and label propagation.

    ``method='exact'``: block-pair tasks over object-store refs (the
    ``embedding_near_dup`` plan) — each (i <= j) pair emits BOTH
    directions' per-row partial top-k, so every pair's similarity is
    computed once; a groupby(vec_id) merge finishes. O(n²/2) compute
    is inherent; the guard at ``KNN_JOIN_MAX_ROWS`` points to 'lsh'.

    ``method='lsh'``: random-hyperplane buckets (``n_tables`` tables
    of ``n_bits``), per-bucket partial top-k, cross-table dedup at the
    final merge. Streaming and corpus-scale, but approximate: a true
    neighbor is found only if it shares >= 1 bucket
    (P = 1 - (1 - (1 - theta/pi)^n_bits)^n_tables); the exact path is
    its oracle on samples.
    """
    import ray
    import ray.data

    base = ds.select_columns([id_col, vec_col])
    if method == "exact":
        mat = base.materialize()
        n = mat.count()
        if n == 0:
            return ray.data.from_arrow(_knn_table([], [], []))
        if n > KNN_JOIN_MAX_ROWS:
            raise ValueError(
                f"knn_join(method='exact') on {n} rows schedules "
                f"~{(n // block_rows + 1) ** 2 // 2} block-pair tasks; "
                "use method='lsh' or raise ops.ann.KNN_JOIN_MAX_ROWS"
            )
        num_blocks = max(1, -(-n // block_rows))
        refs = list(mat.repartition(num_blocks).materialize().to_arrow_refs())

        @ray.remote
        def block_pair(ti: pa.Table, tj: pa.Table, same: bool) -> pa.Table:
            ids_i = ti.column(id_col).to_numpy()
            ids_j = tj.column(id_col).to_numpy()
            if not len(ids_i) or not len(ids_j):
                return _knn_table([], [], [])
            mi = _normalize(_batch_matrix(ti, vec_col))
            mj = _normalize(_batch_matrix(tj, vec_col))
            sims = mi @ mj.T
            qs, vs, ss = _row_partial_topk(sims, ids_i, ids_j, k + 1)
            if not same:
                q2, v2, s2 = _row_partial_topk(sims.T, ids_j, ids_i, k + 1)
                qs, vs, ss = (
                    np.concatenate([qs, q2]),
                    np.concatenate([vs, v2]),
                    np.concatenate([ss, s2]),
                )
            return _knn_table(qs, vs, ss)

        out_refs = [
            block_pair.remote(refs[i], refs[j], i == j)
            for i in range(len(refs))
            for j in range(i, len(refs))
        ]
        parts = ray.data.from_arrow_refs(out_refs)
        dedup_needed = False
    elif method == "lsh":
        powers = 1 << np.arange(n_bits, dtype=np.int64)
        planes = [None]

        def keys(batch: pa.Table) -> pa.Table:
            ids = batch.column(id_col).to_numpy()
            m = _batch_matrix(batch, vec_col)
            if planes[0] is None:  # seeded: identical in every task
                r = np.random.default_rng(seed)
                planes[0] = r.standard_normal((n_tables, n_bits, m.shape[1]))
            vec = batch.column(vec_col)
            if isinstance(vec, pa.ChunkedArray):
                vec = vec.combine_chunks()
            out = []
            for t in range(n_tables):
                sig = ((m @ planes[0][t].T) > 0) @ powers
                out.append(
                    pa.Table.from_arrays(
                        [
                            pa.array(np.full(len(ids), t, dtype=np.int64)),
                            pa.array(sig.astype(np.int64)),
                            pa.array(ids.astype(np.int64)),
                            vec,
                        ],
                        names=["tbl", "key", id_col, vec_col],
                    )
                )
            return pa.concat_tables(out)

        def bucket_topk(group: pa.Table) -> pa.Table:
            ids = group.column(id_col).to_numpy()
            if len(ids) < 2:
                return _knn_table([], [], [])
            m = _normalize(_batch_matrix(group, vec_col))
            sims = m @ m.T
            return _knn_table(*_row_partial_topk(sims, ids, ids, k + 1))

        parts = (
            base.map_batches(keys, batch_format="pyarrow")
            .groupby(["tbl", "key"])
            .map_groups(bucket_topk, batch_format="pyarrow")
        )
        dedup_needed = True  # the same pair can surface in many tables
    else:
        raise ValueError(f"unknown method {method!r} (expected 'exact' or 'lsh')")

    def merge(group: pa.Table) -> pa.Table:
        q = group.column("q")[0].as_py()
        v = group.column("v").to_numpy()
        s = group.column("s").to_numpy()
        keep = v != q
        v, s = v[keep], s[keep]
        if dedup_needed and len(v):
            # the same (q, v) pair surfaces in many buckets; keep one
            # occurrence per v (best sim — BLAS tiling can jitter the
            # last float64 bit across bucket shapes) before ranking
            ov = np.lexsort((-s, v))
            v1, s1 = v[ov], s[ov]
            first = np.concatenate(([True], v1[1:] != v1[:-1]))
            v, s = v1[first], s1[first]
        order = np.lexsort((v, -s))
        v = v[order][:k]
        return pa.Table.from_arrays(
            [
                pa.array(np.full(len(v), q, dtype=np.int64)),
                pa.array(np.arange(1, len(v) + 1, dtype=np.int64)),
                pa.array(v),
            ],
            names=[id_col, "rank", "nbr_id"],
        )

    return parts.groupby("q").map_groups(merge, batch_format="pyarrow")


def _row_partial_topk(sims: np.ndarray, q_ids, c_ids, kk: int):
    """Per-row partial top-``kk`` of a [Q, C] sims block -> flat
    (q, v, s) arrays."""
    Q, C = sims.shape
    kk = min(kk, C)
    if kk < C:
        idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
    else:
        idx = np.broadcast_to(np.arange(C), (Q, C)).copy()
    qs = np.repeat(np.asarray(q_ids, dtype=np.int64), idx.shape[1])
    vs = np.asarray(c_ids, dtype=np.int64)[idx.reshape(-1)]
    ss = np.take_along_axis(sims, idx, axis=1).reshape(-1)
    return qs, vs, ss


def _knn_table(qs, vs, ss) -> pa.Table:
    return pa.Table.from_arrays(
        [
            pa.array(np.asarray(qs, dtype=np.int64)),
            pa.array(np.asarray(vs, dtype=np.int64)),
            pa.array(np.asarray(ss, dtype=np.float64)),
        ],
        names=["q", "v", "s"],
    )


def cosine_topk_filtered(
    ds,
    query_ids: np.ndarray,
    query_vecs: np.ndarray,
    predicate,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    return_sims: bool = False,
):
    """ES ``knn`` with ``filter`` — PRE-filter semantics (the exact
    top-k over the rows that pass the predicate, not a post-filtered
    unrestricted top-k, so low-selectivity filters still return k
    hits). ``predicate`` is a callable ``pa.Table -> boolean mask``
    evaluated MAP-SIDE on each batch before any scoring: the filter
    adds zero shuffles and the scored matrix shrinks to the survivors
    (with vectorized Arrow kernels the filter costs O(batch), the
    matmul saves selectivity x its FLOPs). Returns (q_vec_id, rank,
    vec_id[, sim]) like :func:`cosine_topk_bruteforce`."""

    def flt(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        return batch.filter(predicate(batch))

    return cosine_topk_bruteforce(
        ds.map_batches(flt, batch_format="pyarrow"),
        query_ids,
        query_vecs,
        k=k,
        id_col=id_col,
        vec_col=vec_col,
        exclude_self=exclude_self,
        return_sims=return_sims,
    )


def mmr_rerank(
    ds,
    query_ids: np.ndarray,
    query_vecs: np.ndarray,
    k: int = 10,
    pool: int = 50,
    lam: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Maximal Marginal Relevance (Carbonell & Goldstein 1998)
    diversified rerank: greedy-select ``k`` of the top-``pool``
    cosine candidates, each step maximizing

        lam * rel(c) - (1 - lam) * max_{s in selected} sim(c, s)

    (first pick = highest relevance; all ties by ascending vec_id).
    Returns (q_vec_id, rank, vec_id).

    Scale plan: candidate generation is the distributed brute-force
    pass (per-batch partial top-``pool``); the greedy runs per query
    inside ``groupby(q_vec_id).map_groups`` over pool-sized groups —
    O(k * pool) numpy per query, never on the driver. Candidate
    vectors attach via one hash join against the corpus, so the
    O(pool^2) pairwise-similarity matrix is built from pool rows, not
    the corpus. :func:`mmr_rerank_sql` generates an unrolled-greedy
    DuckDB twin from the same constants; it is empirically (not
    structurally) exact — Python computes rel/pairwise sims via
    normalized numpy matmul while the twin uses DuckDB's
    list_cosine_similarity, whose summation order can differ by
    ulps, and the greedy argmax amplifies a near-tie into a
    different pick. No divergence observed on the test corpora; a
    corpus engineered with exact cosine ties could diverge."""
    import ray

    cand = cosine_topk_bruteforce(
        ds,
        query_ids,
        query_vecs,
        k=pool,
        id_col=id_col,
        vec_col=vec_col,
        exclude_self=True,
        return_sims=True,
    ).materialize()

    # candidate id set: bounded by queries x pool rows — safe to
    # collect, broadcast once for the map-side corpus filter
    cand_ids = np.asarray(
        sorted(cand.unique(id_col)), dtype=np.int64
    )
    ids_ref = ray.put(cand_ids)

    _sch = dict(zip(ds.schema().names, ds.schema().types))
    vec_type = _sch[vec_col]
    union_schema = pa.schema(
        [
            (id_col, pa.int64()),
            ("q_vec_id", pa.int64()),
            ("sim", pa.float64()),
            (vec_col, vec_type),
            ("side", pa.int8()),
        ]
    )

    def tag_cand(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.Table.from_arrays(
            [
                pc.cast(batch.column(id_col), pa.int64()),
                pc.cast(batch.column("q_vec_id"), pa.int64()),
                pc.cast(batch.column("sim"), pa.float64()),
                pa.nulls(n, type=vec_type),
                pa.array(np.zeros(n, dtype=np.int8)),
            ],
            names=union_schema.names,
        )

    def tag_vecs(batch: pa.Table) -> pa.Table:
        wanted = ray.get(ids_ref)
        ids = batch.column(id_col).to_numpy()
        keep = np.isin(ids, wanted)
        batch = batch.filter(pa.array(keep))
        n = batch.num_rows
        return pa.Table.from_arrays(
            [
                pc.cast(batch.column(id_col), pa.int64()),
                pa.nulls(n, type=pa.int64()),
                pa.nulls(n, type=pa.float64()),
                batch.column(vec_col),
                pa.array(np.ones(n, dtype=np.int8)),
            ],
            names=union_schema.names,
        )

    def attach(group: pa.Table) -> pa.Table:
        side = group.column("side").to_numpy(zero_copy_only=False)
        vrows = np.flatnonzero(side == 1)
        crows = np.flatnonzero(side == 0)
        if not len(crows) or not len(vrows):
            return pa.schema(
                [
                    ("q_vec_id", pa.int64()),
                    (id_col, pa.int64()),
                    ("sim", pa.float64()),
                    (vec_col, vec_type),
                ]
            ).empty_table()
        vec = group.column(vec_col).take(
            pa.array(np.repeat(vrows[0], len(crows)))
        )
        keep = pa.array(crows)
        return pa.Table.from_arrays(
            [
                group.column("q_vec_id").take(keep),
                group.column(id_col).take(keep),
                group.column("sim").take(keep),
                vec,
            ],
            names=["q_vec_id", id_col, "sim", vec_col],
        )

    joined = (
        cand.map_batches(tag_cand, batch_format="pyarrow")
        .union(ds.map_batches(tag_vecs, batch_format="pyarrow"))
        .groupby(id_col)
        .map_groups(attach, batch_format="pyarrow")
    )

    def greedy(group: pa.Table) -> pa.Table:
        q = group.column("q_vec_id")[0].as_py()
        ids = group.column(id_col).to_numpy()
        rel = group.column("sim").to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids, rel = ids[order], rel[order]
        mat = _normalize(_batch_matrix(group.take(pa.array(order)), vec_col))
        sims = mat @ mat.T  # [pool, pool]
        n = len(ids)
        selected: List[int] = []
        chosen = np.zeros(n, dtype=bool)
        max_sim = np.full(n, -np.inf)
        out_ids = []
        for _step in range(min(k, n)):
            if not selected:
                score = rel.copy()
            else:
                score = lam * rel - (1.0 - lam) * max_sim
            score[chosen] = -np.inf
            # ties by ascending vec_id: ids are sorted, argmax takes first
            pick = int(np.argmax(score))
            chosen[pick] = True
            selected.append(pick)
            max_sim = np.maximum(max_sim, sims[:, pick])
            out_ids.append(ids[pick])
        return pa.Table.from_arrays(
            [
                pa.array(np.full(len(out_ids), q, dtype=np.int64)),
                pa.array(np.arange(1, len(out_ids) + 1, dtype=np.int64)),
                pa.array(np.asarray(out_ids)),
            ],
            names=["q_vec_id", "rank", id_col],
        )

    return (
        joined.groupby("q_vec_id")
        .map_groups(greedy, batch_format="pyarrow")
        .sort(["q_vec_id", "rank"])
    )


def mmr_rerank_sql(
    table: str,
    query_ids,
    k: int = 10,
    pool: int = 50,
    lam: float = 0.5,
) -> str:
    """DuckDB twin of :func:`mmr_rerank`: the greedy loop unrolled to
    ``k`` chained CTEs (step i picks the argmax of the MMR score over
    the not-yet-selected candidates via a window row_number), generated
    from the same constants so op and oracle share one spec."""
    ids_csv = ",".join(str(int(i)) for i in query_ids)
    parts = [
        f"""q AS (
      SELECT vec_id AS q_vec_id, embedding::DOUBLE[] AS qv
      FROM {table} WHERE vec_id IN ({ids_csv})),
    cand0 AS (
      SELECT q.q_vec_id, e.vec_id, e.embedding::DOUBLE[] AS v,
             list_cosine_similarity(q.qv, e.embedding::DOUBLE[]) AS rel
      FROM q CROSS JOIN {table} e WHERE e.vec_id <> q.q_vec_id),
    cand AS (
      SELECT q_vec_id, vec_id, v, rel FROM (
        SELECT *, row_number() OVER (PARTITION BY q_vec_id
                                     ORDER BY rel DESC, vec_id) rn
        FROM cand0) WHERE rn <= {pool}),
    ps AS (
      SELECT a.q_vec_id, a.vec_id AS va, b.vec_id AS vb,
             list_cosine_similarity(a.v, b.v) AS s
      FROM cand a JOIN cand b
        ON a.q_vec_id = b.q_vec_id AND a.vec_id <> b.vec_id),
    pick1 AS (
      SELECT q_vec_id, vec_id, 1 AS rank FROM (
        SELECT q_vec_id, vec_id,
               row_number() OVER (PARTITION BY q_vec_id
                                  ORDER BY rel DESC, vec_id) rn
        FROM cand) WHERE rn = 1),
    sel1 AS (SELECT * FROM pick1)"""
    ]
    for i in range(2, k + 1):
        parts.append(f"""pick{i} AS (
      SELECT q_vec_id, vec_id, {i} AS rank FROM (
        SELECT c.q_vec_id, c.vec_id,
               row_number() OVER (PARTITION BY c.q_vec_id
                 ORDER BY {lam} * c.rel - {1.0 - lam} * ms.m DESC,
                          c.vec_id) rn
        FROM cand c
        JOIN (SELECT p.q_vec_id, ps.va AS vec_id, max(ps.s) AS m
              FROM ps JOIN sel{i - 1} p
                ON p.q_vec_id = ps.q_vec_id AND p.vec_id = ps.vb
              GROUP BY p.q_vec_id, ps.va) ms
          ON ms.q_vec_id = c.q_vec_id AND ms.vec_id = c.vec_id
        WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{i - 1} s
                               WHERE s.q_vec_id = c.q_vec_id)
      ) WHERE rn = 1),
    sel{i} AS (SELECT * FROM sel{i - 1} UNION ALL SELECT * FROM pick{i})""")
    union = " UNION ALL ".join(f"SELECT * FROM pick{i}" for i in range(1, k + 1))
    return (
        "WITH " + ",\n    ".join(parts)
        + f"\n    SELECT q_vec_id, rank, vec_id FROM ({union}) "
        + "ORDER BY q_vec_id, rank"
    )
