"""Empty-side join robustness.

Ray Data 2.49's native ``Dataset.join`` crashes when one side ships
zero blocks into the hash exchange (``ArrowInvalid: No match or
multiple matches for key field reference``). Every join-bearing op in
this repo has a legitimate empty steady state — no duplicate
candidates, an all-filtered fact table, an all-singleton clustering —
so ``safe_join`` (retriv_ray/ops/_safejoin.py) pads each side with one
null-key sentinel row and drops zero-column poison shards at the
aggregator. These tests pin every such steady state end to end.
"""

import pyarrow as pa
import pytest

import ray

from retriv_ray.ops._safejoin import safe_join
from retriv_ray.ops import dedup as dd
from retriv_ray.ops import relational as rel


def _tbl(**cols):
    return pa.table(cols)


def _ds(**cols):
    return ray.data.from_arrow(_tbl(**cols))


def _empty(schema: pa.Schema):
    return ray.data.from_arrow(schema.empty_table())


IJ = dict(join_type="inner", num_partitions=4)

L_SCHEMA = pa.schema([("k", pa.int64()), ("lv", pa.string())])
R_SCHEMA = pa.schema([("k", pa.int64()), ("rv", pa.int64())])


def test_safe_join_both_populated_matches_native():
    left = _ds(k=[1, 2, 3], lv=["a", "b", "c"])
    right = _ds(k=[2, 3, 4], rv=[20, 30, 40])
    out = safe_join(left, right, on=("k",), **IJ).to_pandas()
    out = out.sort_values("k").reset_index(drop=True)
    assert out["k"].tolist() == [2, 3]
    assert out["lv"].tolist() == ["b", "c"]
    assert out["rv"].tolist() == [20, 30]


@pytest.mark.parametrize(
    "empty_left,empty_right", [(True, False), (False, True), (True, True)]
)
def test_safe_join_inner_empty_sides(empty_left, empty_right):
    left = (
        _empty(L_SCHEMA) if empty_left else _ds(k=[1, 2], lv=["a", "b"])
    )
    right = (
        _empty(R_SCHEMA) if empty_right else _ds(k=[1, 2], rv=[10, 20])
    )
    out = safe_join(
        left,
        right,
        on=("k",),
        left_schema=L_SCHEMA,
        right_schema=R_SCHEMA,
        **IJ,
    )
    assert out.count() == 0


def test_safe_join_left_outer_empty_right_keeps_all_left():
    left = _ds(k=[1, 2, 3], lv=["a", "b", "c"])
    out = safe_join(
        left,
        _empty(R_SCHEMA),
        join_type="left_outer",
        num_partitions=4,
        on=("k",),
        right_schema=R_SCHEMA,
    ).to_pandas()
    assert sorted(out["k"].tolist()) == [1, 2, 3]
    assert out["rv"].isna().all()


def test_safe_join_left_outer_null_keys_kept():
    # real null-key left rows must survive the sentinel filter
    left = ray.data.from_arrow(
        pa.table({"k": pa.array([1, None], pa.int64()), "lv": ["a", "n"]})
    )
    right = _ds(k=[1], rv=[10])
    out = safe_join(
        left, right, join_type="left_outer", num_partitions=4, on=("k",)
    ).to_pandas()
    assert len(out) == 2
    assert set(out["lv"]) == {"a", "n"}


def test_safe_join_after_groupby_zero_column_blocks():
    # groupby aggregates emit zero-column blocks for empty hash
    # partitions; those must not poison the join aggregators
    base = _ds(k=[1, 1, 2], v=[1, 2, 3])
    agg = base.groupby("k").sum("v")  # few groups, many partitions
    right = _ds(k=[1, 2], rv=[10, 20])
    out = safe_join(agg, right, on=("k",), **IJ).to_pandas()
    assert sorted(out["k"].tolist()) == [1, 2]


def _docs(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


def test_minhash_no_candidates():
    # two documents with disjoint vocabulary: zero LSH candidates,
    # the verify joins see an empty candidate side
    ds = _docs([(1, "alpha beta gamma delta"), (2, "zip zap zop quux")])
    out = dd.minhash_lsh_pairs(ds, threshold=0.5, join_partitions=4)
    assert out.count() == 0


def test_minhash_empty_corpus():
    ds = _docs([])
    out = dd.minhash_lsh_pairs(ds, threshold=0.5, join_partitions=4)
    assert out.count() == 0


def test_dedup_filter_zero_pairs_passthrough():
    ds = _docs([(1, "aa"), (2, "bb"), (3, "cc")])
    pairs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id_a": pa.array([], pa.int64()),
                "doc_id_b": pa.array([], pa.int64()),
            }
        )
    )
    out = dd.dedup_filter(ds, pairs)
    assert sorted(out.to_pandas()["doc_id"].tolist()) == [1, 2, 3]


def test_anti_join_empty_right_keeps_all():
    left = _ds(k=[1, 2, 3], lv=["a", "b", "c"])
    out = rel.shuffle_anti_join(left, _empty(R_SCHEMA), on="k")
    assert sorted(out.to_pandas()["k"].tolist()) == [1, 2, 3]


def test_anti_join_empty_left():
    right = _ds(k=[1], rv=[10])
    out = rel.shuffle_anti_join(_empty(L_SCHEMA), right, on="k")
    assert out.count() == 0


def test_hash_join_empty_filtered_side():
    # a date-style filter matching nothing produces an empty DERIVED
    # side (no schema metadata of its own)
    left = _ds(k=[1, 2], lv=["a", "b"]).filter(lambda r: r["k"] > 99)
    right = _ds(k=[1, 2], rv=[10, 20])
    out = rel.hash_join(
        left,
        right,
        on=("k",),
        num_partitions=4,
        left_schema=L_SCHEMA,
    )
    assert out.count() == 0


def test_order_priority_stats_empty_window():
    orders = _ds(
        o_orderkey=[1, 2],
        o_orderdate=["1995-01-01", "1995-06-01"],
        o_orderpriority=["1-URGENT", "2-HIGH"],
    )
    lineitem = _ds(l_orderkey=[1, 2], l_extendedprice=[10.0, 20.0])
    out = rel.order_priority_stats(orders, lineitem, "2050-01-01", "2050-02-01")
    assert out.count() == 0
