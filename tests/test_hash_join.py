"""hash_join (native shuffle hash join with prune-first projections)
vs a pandas oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from retriv_ray.ops.relational import hash_join, order_priority_stats


def _sides(seed=11):
    rng = np.random.RandomState(seed)
    left = pd.DataFrame(
        {
            "k": rng.randint(0, 30, 100),
            "a": rng.randint(0, 1000, 100),
            "junk_l": ["x"] * 100,
        }
    )
    right = pd.DataFrame(
        {
            "rk": rng.randint(0, 30, 80),
            "b": rng.randint(0, 1000, 80),
            "junk_r": ["y"] * 80,
        }
    )
    return left, right


def test_inner_join_matches_pandas(ray_session):
    import ray.data

    left, right = _sides()
    got = hash_join(
        ray.data.from_pandas(left),
        ray.data.from_pandas(right),
        on=["k"],
        right_on=["rk"],
        num_partitions=4,
        left_cols=["a"],
        right_cols=["b"],
    ).to_pandas()
    exp = left.merge(right, left_on="k", right_on="rk")[["k", "a", "b"]]
    g = got.sort_values(["k", "a", "b"]).reset_index(drop=True)
    e = exp.sort_values(["k", "a", "b"]).reset_index(drop=True)
    assert len(g) == len(e)
    assert (g[["k", "a", "b"]].values == e.values).all()
    # prune-first: junk columns never crossed the shuffle
    assert "junk_l" not in got.columns and "junk_r" not in got.columns


def test_left_join_keeps_unmatched(ray_session):
    import ray.data

    left = pd.DataFrame({"k": [1, 2, 3], "a": [10, 20, 30]})
    right = pd.DataFrame({"k": [2], "b": [99]})
    got = hash_join(
        ray.data.from_pandas(left),
        ray.data.from_pandas(right),
        on=["k"],
        join_type="left_outer",
        num_partitions=2,
    ).to_pandas()
    got = got.sort_values("k").reset_index(drop=True)
    assert len(got) == 3
    assert got.loc[got.k == 2, "b"].iloc[0] == 99
    assert got.loc[got.k != 2, "b"].isna().all()


def test_order_priority_stats(ray_session):
    import ray.data

    orders = pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3],
            "o_orderdate": pd.to_datetime(
                ["1995-03-01", "1994-01-01", "1995-06-01"]
            ),
            "o_orderpriority": ["1-URGENT", "1-URGENT", "2-HIGH"],
        }
    )
    lineitem = pd.DataFrame(
        {
            "l_orderkey": [1, 1, 2, 3],
            "l_extendedprice": [10.25, 5.50, 7.00, 1.10],
        }
    )
    got = (
        order_priority_stats(
            ray.data.from_pandas(orders),
            ray.data.from_pandas(lineitem),
            "1995-01-01",
            "1996-07-01",
        )
        .to_pandas()
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    # order 2 is outside the window; order 1 has 2 lines, order 3 one
    assert got["o_orderpriority"].tolist() == ["1-URGENT", "2-HIGH"]
    assert got["n_lines"].tolist() == [2, 1]
    assert got["sum_cents"].tolist() == [1575, 110]
