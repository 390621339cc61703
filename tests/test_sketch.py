"""HyperLogLog approx_distinct (ops/sketch.py): partitioning
invariance, DuckDB-twin parity, accuracy, contract edges."""

import numpy as np
import pyarrow as pa
import pytest

from retriv_ray.ops.sketch import approx_distinct, approx_distinct_sql


def _make_ds(keys, vals, blocks):
    import ray.data

    t = pa.table({"k": keys, "v": vals})
    return ray.data.from_arrow(t).repartition(blocks)


def _events(n=4000, n_keys=3, card=(5, 150, 900), seed=1):
    rng = np.random.default_rng(seed)
    keys, vals = [], []
    for i in range(n):
        ki = int(rng.integers(n_keys))
        keys.append(f"t{ki}")
        vals.append(int(rng.integers(card[ki])))
    return keys, vals


@pytest.mark.parametrize("blocks", [1, 5, 13])
def test_partitioning_invariant(ray_session, blocks):
    keys, vals = _events()
    one = (
        approx_distinct(_make_ds(keys, vals, 1), key_col="k", value_col="v")
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    many = (
        approx_distinct(_make_ds(keys, vals, blocks), key_col="k", value_col="v")
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    assert one.equals(many)


def test_matches_duckdb_twin(ray_session, tmp_path):
    import duckdb
    import pyarrow.parquet as pq

    keys, vals = _events(seed=7)
    p = str(tmp_path / "ev.parquet")
    pq.write_table(pa.table({"k": keys, "v": vals}), p)
    mine = (
        approx_distinct(_make_ds(keys, vals, 4), key_col="k", value_col="v")
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW ev AS SELECT * FROM read_parquet('{p}')")
    theirs = con.execute(approx_distinct_sql("ev", "k", "v")).df()
    assert list(mine["k"]) == list(theirs["k"])
    assert list(mine["distinct_e2"]) == list(theirs["distinct_e2"])


@pytest.mark.parametrize("p,tol", [(8, 0.20), (12, 0.08)])
def test_accuracy_vs_exact(ray_session, p, tol):
    keys, vals = _events(n=20000, card=(50, 500, 5000), seed=3)
    out = approx_distinct(
        _make_ds(keys, vals, 4), key_col="k", value_col="v", p=p
    ).to_pandas()
    exact = {}
    for k, v in zip(keys, vals):
        exact.setdefault(k, set()).add(v)
    for _, row in out.iterrows():
        est = row["distinct_e2"] / 100.0
        true = len(exact[row["k"]])
        assert abs(est - true) / true < tol, (row["k"], est, true)


def test_small_range_linear_counting(ray_session):
    # 3 distinct values -> nearly all registers empty -> the linear
    # counting branch; estimate must be within 1 of exact
    out = approx_distinct(
        _make_ds(["a"] * 30, [1, 2, 3] * 10, 2), key_col="k", value_col="v"
    ).to_pandas()
    assert abs(out["distinct_e2"][0] / 100.0 - 3) < 1.0


def test_p_validation(ray_session):
    with pytest.raises(ValueError, match="p="):
        approx_distinct(_make_ds(["a"], [1], 1), key_col="k", value_col="v", p=2)


# -- Misra-Gries approx_topk -------------------------------------------------


def _zipf_tokens(n=6000, seed=2):
    rng = np.random.default_rng(seed)
    ranks = rng.zipf(1.3, size=n)
    return [f"tok{min(int(r), 400):03d}" for r in ranks]


def test_approx_topk_exact_when_capacity_suffices(ray_session):
    from collections import Counter

    from retriv_ray.ops.sketch import approx_topk

    toks = _zipf_tokens()
    ds = _make_ds(toks, list(range(len(toks))), 5).drop_columns(["v"])
    out = approx_topk(ds, "k", k=8, capacity=100_000).to_pandas()
    ref = sorted(Counter(toks).items(), key=lambda p: (-p[1], p[0]))[:8]
    assert list(zip(out["k"], out["est_count"])) == ref
    assert (out["max_undercount"] == 0).all()


def test_approx_topk_bound_honest_under_truncation(ray_session):
    from collections import Counter

    from retriv_ray.ops.sketch import approx_topk

    toks = _zipf_tokens(n=8000, seed=5)
    ds = _make_ds(toks, list(range(len(toks))), 6).drop_columns(["v"])
    out = approx_topk(ds, "k", k=10, capacity=20).to_pandas()
    true = Counter(toks)
    for _, row in out.iterrows():
        t = true[row["k"]]
        assert row["est_count"] <= t <= row["est_count"] + row["max_undercount"], (
            row["k"], row["est_count"], row["max_undercount"], t,
        )
    # the heavy head must survive a tight capacity
    head = sorted(true.items(), key=lambda p: (-p[1], p[0]))[:3]
    assert {v for v, _ in head} <= set(out["k"])


def test_approx_topk_weighted(ray_session):
    import ray.data

    from retriv_ray.ops.sketch import approx_topk

    t = pa.table({"k": ["a", "b", "a", "c"], "w": [5, 2, 1, 10]})
    out = approx_topk(
        ray.data.from_arrow(t), "k", k=2, capacity=10, weight_col="w"
    ).to_pandas()
    assert list(zip(out["k"], out["est_count"])) == [("c", 10), ("a", 6)]


def test_approx_topk_validates(ray_session):
    from retriv_ray.ops.sketch import approx_topk

    ds = _make_ds(["a"], [1], 1)
    import pytest as _pt

    with _pt.raises(ValueError):
        approx_topk(ds, "k", k=0)


# -- count-min ---------------------------------------------------------------


def test_approx_count_bounds_and_duckdb_twin(ray_session):
    import duckdb
    import ray

    from retriv_ray.ops.sketch import approx_count, approx_count_sql

    rng = np.random.default_rng(3)
    vals = rng.zipf(1.5, 4000)
    vals = vals[vals < 500]
    t = pa.table({"v": vals.astype(np.int64)})
    ds = ray.data.from_arrow(t).repartition(5)
    probes = list(range(1, 15)) + [9999]
    got = approx_count(ds, "v", probes, d=4, w=64)
    est = dict(zip(got.column("value").to_pylist(),
                   got.column("est").to_pylist()))
    true = {str(p): int((vals == p).sum()) for p in probes}
    # one-sided guarantee: never undercounts (absent probes may still
    # overcount at w=64 — every cell is loaded; exactness-at-width is
    # the next test's job)
    for p in probes:
        assert est[str(p)] >= true[str(p)], p
    # w=64 on ~500 distinct values MUST collide somewhere
    assert any(est[k] > true[k] for k in est)
    # bit-identical DuckDB twin
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute(approx_count_sql("t", "v", probes, 4, 64)).fetchall()
    assert [(v, e) for v, e in zip(got.column("value").to_pylist(),
                                   got.column("est").to_pylist())] == want


def test_approx_count_exact_when_wide(ray_session):
    import ray

    from retriv_ray.ops.sketch import approx_count

    t = pa.table({"v": ["a"] * 7 + ["b"] * 3 + ["c"]})
    ds = ray.data.from_arrow(t).repartition(3)
    got = approx_count(ds, "v", ["a", "b", "c", "d"], d=4, w=4096)
    m = dict(zip(got.column("value").to_pylist(),
                 got.column("est").to_pylist()))
    # 3 values x 4 rows in 4096 cells: estimate == exact count unless
    # all 4 rows collide (impossible here by direct check)
    assert m == {"a": 7, "b": 3, "c": 1, "d": 0}


def test_approx_count_nulls_and_duplicate_probes(ray_session):
    import duckdb
    import ray

    from retriv_ray.ops.sketch import approx_count, approx_count_sql

    t = pa.table({"v": ["a", None, "a", "b", None]})
    ds = ray.data.from_arrow(t).repartition(2)
    got = approx_count(ds, "v", ["a", "a", "b", "zz"], d=4, w=4096)
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute(
        approx_count_sql("t", "v", ["a", "a", "b", "zz"], 4, 4096)
    ).fetchall()
    assert [
        (v, e)
        for v, e in zip(got.column("value").to_pylist(),
                        got.column("est").to_pylist())
    ] == want
    assert got.num_rows == 3  # probes deduped like the SQL GROUP BY


def test_approx_count_all_null_input(ray_session):
    import ray

    from retriv_ray.ops.sketch import approx_count

    t = pa.table({"v": pa.array([None, None], type=pa.string())})
    got = approx_count(ray.data.from_arrow(t), "v", ["a", "b"], d=2, w=16)
    assert got.column("est").to_pylist() == [0, 0]


def test_approx_count_sql_escapes_quotes(ray_session):
    """Probe values containing single quotes produce valid (escaped)
    SQL — probes are arbitrary user strings."""
    import duckdb
    import ray

    from retriv_ray.ops.sketch import approx_count, approx_count_sql

    vals = ["it's", "plain", "it's", "a'b'c"]
    t = pa.table({"v": vals})
    ds = ray.data.from_arrow(t).repartition(2)
    probes = ["it's", "a'b'c", "missing'"]
    got = approx_count(ds, "v", probes, d=4, w=4096)
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute(approx_count_sql("t", "v", probes, 4, 4096)).fetchall()
    assert [
        (v, e)
        for v, e in zip(got.column("value").to_pylist(),
                        got.column("est").to_pylist())
    ] == want
