"""Temporal-join tests: salted (bucket-replicated) asof/range joins
equal the unsalted path AND a DuckDB oracle, including a hot key
whose rows span many buckets and ties at equal timestamps."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from retriv_ray.ops.joins import asof_join, range_join

TOL = 6 * 3600  # asof lookback
WIN = 1800  # range window
BUCKET = 900  # salt buckets much smaller than window/tolerance


def _mk():
    rng = np.random.default_rng(11)
    base = np.datetime64("2025-06-01T00:00:00", "us")
    rows = []
    eid = 0
    # hot key 1: 3000 lefts + 400 rights over 2 days
    for side, n in ((0, 3000), (1, 400)):
        ts = base + np.sort(
            rng.integers(0, 2 * 86400 * 1_000_000, size=n)
        ).astype("timedelta64[us]")
        for t in ts:
            rows.append((1, eid, t, side, float(eid % 97)))
            eid += 1
    # normal keys, incl. one with no rights and one with no lefts
    for uid in (2, 3):
        for side, n in ((0, 40), (1, 10)):
            ts = base + rng.integers(0, 86400 * 1_000_000, size=n).astype(
                "timedelta64[us]"
            )
            for t in ts:
                rows.append((uid, eid, t, side, float(eid % 97)))
                eid += 1
    rows.append((4, eid, base + np.timedelta64(5, "s"), 0, 0.0))
    eid += 1
    rows.append((5, eid, base + np.timedelta64(5, "s"), 1, 1.0))
    eid += 1
    # exact-timestamp tie: two rights at the same us, left at same us
    t = base + np.timedelta64(777, "s")
    rows.append((6, eid, t, 1, 10.0))
    eid += 1
    rows.append((6, eid, t, 1, 20.0))
    eid += 1
    rows.append((6, eid, t, 0, 0.0))
    eid += 1
    df = pd.DataFrame(rows, columns=["user_id", "event_id", "ts", "side", "value"])
    return df.sample(frac=1.0, random_state=5).reset_index(drop=True)


@pytest.fixture(scope="module")
def sides(ray_session):
    import ray.data

    df = _mk()
    lefts = ray.data.from_pandas(df[df.side == 0].drop(columns=["side"])).repartition(6)
    rights = ray.data.from_pandas(df[df.side == 1].drop(columns=["side"])).repartition(
        6
    )
    return df, lefts, rights


def _oracle_asof(df):
    con = duckdb.connect()
    con.register("ev", df)
    return con.execute(
        f"""
        WITH l AS (SELECT user_id, event_id, ts FROM ev WHERE side = 0),
             r AS (SELECT user_id, event_id, ts, value FROM ev WHERE side = 1)
        SELECT key, event_id, ts, anchor_id, anchor_ts, anchor_val FROM (
          SELECT l.user_id AS key, l.event_id AS event_id, l.ts AS ts,
                 r.event_id AS anchor_id, r.ts AS anchor_ts,
                 r.value AS anchor_val,
                 row_number() OVER (PARTITION BY l.event_id
                                    ORDER BY r.ts DESC, r.event_id DESC) AS rn
          FROM l JOIN r ON l.user_id = r.user_id AND r.ts <= l.ts
                       AND r.ts > l.ts - INTERVAL {TOL} SECOND
        ) WHERE rn = 1 ORDER BY key, event_id
        """
    ).df()


def _oracle_range(df):
    con = duckdb.connect()
    con.register("ev", df)
    return con.execute(
        f"""
        WITH l AS (SELECT user_id, event_id, ts FROM ev WHERE side = 0),
             r AS (SELECT user_id, event_id, ts FROM ev WHERE side = 1)
        SELECT l.user_id AS key, l.event_id AS event_id,
               r.event_id AS anchor_id,
               (epoch_us(l.ts) - epoch_us(r.ts)) // 1000000 AS delta_s
        FROM l JOIN r ON l.user_id = r.user_id
                     AND l.ts >= r.ts AND l.ts < r.ts + INTERVAL {WIN} SECOND
        ORDER BY key, event_id, anchor_id
        """
    ).df()


def _norm(pdf, cols):
    return pdf.sort_values(cols).reset_index(drop=True)


@pytest.mark.parametrize("bucket_s", [None, BUCKET])
def test_asof_matches_oracle(sides, bucket_s):
    df, lefts, rights = sides
    got = asof_join(lefts, rights, tolerance_s=TOL, bucket_s=bucket_s).to_pandas()
    got = _norm(got, ["key", "event_id"])[
        ["key", "event_id", "ts", "anchor_id", "anchor_ts", "anchor_val"]
    ]
    want = _oracle_asof(df).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the equal-ts tie on key 6 resolved to the larger anchor id
    k6 = got[got.key == 6]
    assert len(k6) == 1 and float(k6.anchor_val.iloc[0]) == 20.0


@pytest.mark.parametrize("bucket_s", [None, BUCKET])
def test_range_matches_oracle(sides, bucket_s):
    df, lefts, rights = sides
    got = range_join(lefts, rights, window_s=WIN, bucket_s=bucket_s).to_pandas()
    got = _norm(got, ["key", "event_id", "anchor_id"])
    want = _oracle_range(df).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # no duplicate pairs from the replication path
    assert not got.duplicated(["event_id", "anchor_id"]).any()


def test_asof_unbounded_tolerance_unsalted(sides):
    df, lefts, rights = sides
    got = asof_join(lefts, rights, tolerance_s=None).to_pandas()
    con = duckdb.connect()
    con.register("ev", df)
    want = con.execute(
        """
        WITH l AS (SELECT user_id, event_id, ts FROM ev WHERE side = 0),
             r AS (SELECT user_id, event_id, ts, value FROM ev WHERE side = 1)
        SELECT key, event_id, anchor_id FROM (
          SELECT l.user_id AS key, l.event_id AS event_id,
                 r.event_id AS anchor_id,
                 row_number() OVER (PARTITION BY l.event_id
                                    ORDER BY r.ts DESC, r.event_id DESC) AS rn
          FROM l JOIN r ON l.user_id = r.user_id AND r.ts <= l.ts
        ) WHERE rn = 1 ORDER BY key, event_id
        """
    ).df()
    got = _norm(got, ["key", "event_id"])[["key", "event_id", "anchor_id"]]
    pd.testing.assert_frame_equal(got, want.reset_index(drop=True), check_dtype=False)


def test_asof_salted_requires_tolerance(sides):
    _, lefts, rights = sides
    with pytest.raises(ValueError, match="tolerance_s"):
        asof_join(lefts, rights, tolerance_s=None, bucket_s=900)


def test_bucket_salt_right_empty_batch():
    """ADVICE r3: an all-filtered (zero-row) block through the salted
    path must not crash and must keep the bucket column in the schema."""
    import pyarrow as pa

    from retriv_ray.ops.joins import _bucket_salt_right

    empty = pa.Table.from_arrays(
        [
            pa.array([], type=pa.int64()),
            pa.array([], type=pa.int64()),
            pa.array([], type=pa.int64()),
            pa.array([], type=pa.float64()),
            pa.array([], type=pa.int8()),
        ],
        names=["key", "ts_us", "id", "val", "side"],
    )
    out = _bucket_salt_right(empty, span_us=10, bucket_us=5)
    assert out.num_rows == 0
    assert out.schema.field("bucket").type == pa.int64()


def test_asof_salted_with_empty_filtered_blocks(sides):
    """End-to-end: blocks that filter to zero rows flow through the
    salted asof path (this crashed before the empty-batch guard)."""
    import ray.data

    df, _, _ = sides
    # keep only key 6 -> most upstream blocks become empty
    lefts = ray.data.from_pandas(
        df[(df.side == 0) & (df.user_id == 6)].drop(columns=["side"])
    ).repartition(4)
    rights = ray.data.from_pandas(
        df[(df.side == 1) & (df.user_id == 6)].drop(columns=["side"])
    ).repartition(4)
    got = asof_join(lefts, rights, tolerance_s=TOL, bucket_s=BUCKET).to_pandas()
    assert len(got) == 1 and float(got.anchor_val.iloc[0]) == 20.0
