"""kNN self-join (ops/ann.py knn_join): exact path vs brute numpy,
partitioning invariance, LSH recall, guards."""

import numpy as np
import pyarrow as pa
import pytest

from retriv_ray.ops.ann import knn_join


def _make_ds(vecs, blocks):
    import ray.data

    t = pa.table(
        {
            "vec_id": pa.array(np.arange(len(vecs), dtype=np.int64)),
            "embedding": [list(map(float, v)) for v in vecs],
        }
    )
    return ray.data.from_arrow(t).repartition(blocks)


def _brute(vecs, k):
    m = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = m @ m.T
    out = {}
    for i in range(len(m)):
        cand = [(j, sims[i, j]) for j in range(len(m)) if j != i]
        cand.sort(key=lambda p: (-p[1], p[0]))
        out[i] = [j for j, _ in cand[:k]]
    return out


@pytest.mark.parametrize("blocks,block_rows", [(1, 8192), (4, 20), (7, 11)])
def test_exact_matches_brute_any_partitioning(ray_session, blocks, block_rows):
    rng = np.random.default_rng(2)
    vecs = rng.normal(size=(60, 12)).astype(np.float64)
    out = (
        knn_join(_make_ds(vecs, blocks), k=4, block_rows=block_rows)
        .to_pandas()
        .sort_values(["vec_id", "rank"])
        .reset_index(drop=True)
    )
    ref = _brute(vecs, 4)
    for q, grp in out.groupby("vec_id"):
        assert list(grp["nbr_id"]) == ref[q], q
    assert set(out["vec_id"]) == set(range(60))


def test_lsh_recall_against_exact(ray_session):
    rng = np.random.default_rng(9)
    vecs = rng.normal(size=(120, 10)).astype(np.float64)
    exact = (
        knn_join(_make_ds(vecs, 3), k=3)
        .to_pandas().groupby("vec_id")["nbr_id"].apply(list).to_dict()
    )
    approx = (
        knn_join(_make_ds(vecs, 3), k=3, method="lsh", n_tables=24, n_bits=4)
        .to_pandas().groupby("vec_id")["nbr_id"].apply(list).to_dict()
    )
    hits = total = 0
    for q, ref in exact.items():
        got = set(approx.get(q, []))
        hits += len(got & set(ref))
        total += len(ref)
    assert hits / total > 0.6  # 24 tables x 4 bits on random data


def test_lsh_no_duplicate_neighbors(ray_session):
    rng = np.random.default_rng(4)
    vecs = rng.normal(size=(40, 6)).astype(np.float64)
    out = knn_join(
        _make_ds(vecs, 2), k=5, method="lsh", n_tables=16, n_bits=2
    ).to_pandas()
    for q, grp in out.groupby("vec_id"):
        assert grp["nbr_id"].is_unique
        assert list(grp.sort_values("rank")["rank"]) == list(
            range(1, len(grp) + 1)
        )
        assert q not in set(grp["nbr_id"])


def test_exact_row_guard(ray_session):
    import retriv_ray.ops.ann as ann

    vecs = np.eye(4)
    old = ann.KNN_JOIN_MAX_ROWS
    ann.KNN_JOIN_MAX_ROWS = 2
    try:
        with pytest.raises(ValueError, match="lsh"):
            knn_join(_make_ds(vecs, 1), k=2)
    finally:
        ann.KNN_JOIN_MAX_ROWS = old


def test_unknown_method(ray_session):
    with pytest.raises(ValueError, match="method"):
        knn_join(_make_ds(np.eye(3), 1), method="hnsw")
