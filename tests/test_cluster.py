"""Integer-exact distributed Lloyd k-means (ops/cluster.py)."""

import numpy as np
import pyarrow as pa
import pytest

from retriv_ray.ops.cluster import _assign, kmeans_assign


def _ref_kmeans(vecs, k, iters, scale):
    """Driver-side reference: same quantize/int64/floor-div contract,
    plain numpy."""
    q = np.floor(np.float64(scale) * vecs.astype(np.float64)).astype(np.int64)
    cent = q[:k].copy()
    for _ in range(iters - 1):
        a, _ = _assign(q, cent)
        new = cent.copy()
        for c in range(k):
            rows = q[a == c]
            if len(rows):
                new[c] = rows.sum(axis=0, dtype=np.int64) // len(rows)
        cent = new
    a, d2 = _assign(q, cent)
    return a, d2


def _make_ds(vecs, blocks):
    import ray.data

    t = pa.table(
        {
            "vec_id": pa.array(np.arange(len(vecs), dtype=np.int64)),
            "embedding": [list(map(float, v)) for v in vecs],
        }
    )
    return ray.data.from_arrow(t).repartition(blocks)


@pytest.mark.parametrize("blocks", [1, 3, 7])
def test_kmeans_matches_reference_any_partitioning(ray_session, blocks):
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(60, 8)).astype(np.float32) * 0.4
    ds = _make_ds(vecs, blocks)
    out = kmeans_assign(ds, k=4, iters=3, scale=1024).to_pandas()
    out = out.sort_values("vec_id").reset_index(drop=True)
    a, d2 = _ref_kmeans(vecs, 4, 3, 1024)
    assert list(out["cluster"]) == list(a)  # seed ids == ordinals here
    assert list(out["d2"]) == list(d2)


def test_kmeans_empty_cluster_keeps_seed_centroid(ray_session):
    # seeds 0 and 1 identical: points tie to ordinal 0 in round 1, so
    # seed 1's cluster goes empty during the update and must keep its
    # (unchanged) centroid rather than crash or zero out — it can then
    # legitimately re-attract points in the final assignment
    vecs = np.array(
        [[0.1, 0.1], [0.1, 0.1], [0.5, 0.5], [0.52, 0.5], [0.11, 0.1]],
        dtype=np.float32,
    )
    ds = _make_ds(vecs, 2)
    out = (
        kmeans_assign(ds, k=3, iters=2, scale=1024)
        .to_pandas()
        .sort_values("vec_id")
    )
    a, d2 = _ref_kmeans(vecs, 3, 2, 1024)
    assert list(out["cluster"]) == list(a)
    assert list(out["d2"]) == list(d2)


def test_kmeans_iters_one_is_seed_assignment(ray_session):
    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(20, 4)).astype(np.float32) * 0.3
    ds = _make_ds(vecs, 2)
    out = (
        kmeans_assign(ds, k=5, iters=1, scale=1024)
        .to_pandas()
        .sort_values("vec_id")
    )
    q = np.floor(1024.0 * vecs.astype(np.float64)).astype(np.int64)
    a, d2 = _assign(q, q[:5])
    assert list(out["cluster"]) == list(a)
    assert list(out["d2"]) == list(d2)
    # the seeds themselves sit at distance 0 in their own cluster
    assert all(out[out.vec_id < 5]["d2"] == 0)


def test_kmeans_k_exceeds_rows_raises(ray_session):
    vecs = np.zeros((3, 2), dtype=np.float32)
    with pytest.raises(ValueError):
        kmeans_assign(_make_ds(vecs, 1), k=5, iters=1)


def _ref_semantic_dedup(vecs, k, iters, te4, scale):
    """Driver-side reference: same quantize/int64 cross-multiplied
    cosine contract, plain numpy O(n^2)."""
    q = np.floor(np.float64(scale) * vecs.astype(np.float64)).astype(np.int64)
    cent = q[:k].copy()
    for _ in range(iters - 1):
        a, _ = _assign(q, cent)
        new = cent.copy()
        for c in range(k):
            rows = q[a == c]
            if len(rows):
                new[c] = rows.sum(axis=0, dtype=np.int64) // len(rows)
        cent = new
    a, _ = _assign(q, cent)
    nn = (q * q).sum(axis=1)
    kept = []
    for i in range(len(q)):
        dup = False
        for j in range(i):
            if a[j] != a[i]:
                continue
            dot = int(q[i] @ q[j])
            if dot > 0 and dot * dot * 10**8 >= te4 * te4 * int(nn[i]) * int(nn[j]):
                dup = True
                break
        if not dup:
            kept.append((i, int(a[i])))
    return kept


@pytest.mark.parametrize("blocks", [1, 4, 9])
def test_semantic_dedup_matches_reference_any_partitioning(ray_session, blocks):
    from retriv_ray.ops.cluster import semantic_dedup

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(80, 8)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    # plant exact near-dups: rows 50/51 copy row 3 with tiny jitter
    vecs[50] = vecs[3] + 0.001
    vecs[51] = vecs[3] - 0.001
    ds = _make_ds(vecs, blocks)
    out = (
        semantic_dedup(ds, k=4, iters=2, threshold_e4=9000, scale=64)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    ref = _ref_semantic_dedup(vecs, 4, 2, 9000, 64)
    assert list(zip(out["vec_id"], out["cluster"])) == ref
    kept_ids = set(out["vec_id"])
    assert 3 in kept_ids and 50 not in kept_ids and 51 not in kept_ids


def test_semantic_dedup_cross_cluster_twins_survive(ray_session):
    from retriv_ray.ops.cluster import semantic_dedup

    # two identical vectors forced into different clusters by seeding:
    # ids 0 and 1 ARE the seeds (k=2, iters=1 keeps seed assignment),
    # so each twin sits in its own cluster and both are kept — the
    # dedup is strictly within-cluster
    vecs = np.array(
        [[1.0, 0.0], [0.0, 1.0], [1.0, 0.002], [0.002, 1.0]],
        dtype=np.float32,
    )
    ds = _make_ds(vecs, 2)
    out = semantic_dedup(
        ds, k=2, iters=1, threshold_e4=9990, scale=64
    ).to_pandas()
    # 2 and 3 are ~identical to 0 and 1 resp. but live in the cluster
    # of their twin -> dropped; the seeds themselves survive
    assert sorted(out["vec_id"]) == [0, 1]


def test_semantic_dedup_validates_threshold(ray_session):
    from retriv_ray.ops.cluster import semantic_dedup

    ds = _make_ds(np.eye(3, dtype=np.float32), 1)
    with pytest.raises(ValueError, match="threshold_e4"):
        semantic_dedup(ds, k=2, threshold_e4=0)


def test_semantic_dedup_overflow_guard(ray_session):
    from retriv_ray.ops.cluster import semantic_dedup

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(10, 8)).astype(np.float32)
    ds = _make_ds(vecs, 1)
    with pytest.raises(Exception, match="overflow|scale"):
        semantic_dedup(
            ds, k=2, iters=1, threshold_e4=9000, scale=1 << 20
        ).to_pandas()


def test_semantic_dedup_cluster_cap(ray_session):
    from retriv_ray.ops.cluster import semantic_dedup

    rng = np.random.default_rng(4)
    vecs = rng.normal(size=(30, 4)).astype(np.float32)
    ds = _make_ds(vecs, 2)
    with pytest.raises(Exception, match="max_cluster_rows"):
        semantic_dedup(
            ds, k=2, iters=1, threshold_e4=9000, scale=64, max_cluster_rows=5
        ).to_pandas()
