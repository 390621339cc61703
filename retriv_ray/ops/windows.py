"""Windowed / time-bucketed aggregates over the events table.

Ray Data has no event-time windowing primitive; tumbling windows are
expressed as a bucket column + groupby (the idiomatic batch
equivalent), with per-batch pre-aggregation so the shuffle moves one
row per (key, window) per batch, not one per event. Money-like
doubles are aggregated as integer cents so results are exactly
reproducible (and hash-comparable against a SQL oracle) regardless
of summation order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def tumbling_window(
    ds,
    every: str = "hour",
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
):
    """(key, window_start_s, n_events, value_cents) per tumbling
    window. ``every`` is a pyarrow floor_temporal unit ('hour',
    'day', 'minute'). Window starts are int64 epoch SECONDS (exact,
    resolution-unambiguous for hashing against a SQL oracle)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        win = pc.divide(
            pc.cast(pc.floor_temporal(batch.column(ts_col), unit=every), pa.int64()),
            pa.scalar(1_000_000, type=pa.int64()),
        )
        cents = pc.cast(
            pc.round(pc.multiply(batch.column(value_col), pa.scalar(100.0))),
            pa.int64(),
        )
        t = pa.Table.from_arrays(
            [batch.column(key_col), win, cents],
            names=[key_col, "window_start_s", "c"],
        )
        g = pa.TableGroupBy(t, [key_col, "window_start_s"]).aggregate(
            [("c", "count"), ("c", "sum")]
        )
        return g.rename_columns([key_col, "window_start_s", "n", "cents"])

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([key_col, "window_start_s"])
        .aggregate(Sum("n"), Sum("cents"))
    )
    return out.rename_columns({"sum(n)": "n_events", "sum(cents)": "value_cents"})


def sessionize(
    ds,
    gap_seconds: int = 1800,
    key_col: str = "user_id",
    ts_col: str = "ts",
):
    """Session windows per key: events sorted by ts within a key are
    split where the gap exceeds ``gap_seconds``. Returns one row per
    session (key, session_start, session_end, n_events).

    Partitioning assumption: one key's events fit in one group
    (map_groups materializes per-key history) — holds for per-user
    event streams; salt by day for pathological keys."""

    def sessions(group: pa.Table) -> pa.Table:
        key = group.column(key_col)[0].as_py()
        ts = np.sort(group.column(ts_col).to_numpy().astype("datetime64[us]").astype(np.int64))
        gaps = np.diff(ts) > gap_seconds * 1_000_000
        starts = np.concatenate(([0], np.flatnonzero(gaps) + 1))
        ends = np.append(starts[1:], len(ts)) - 1
        return pa.Table.from_arrays(
            [
                pa.array(np.full(len(starts), key, dtype=np.int64)),
                pa.array(ts[starts].astype("datetime64[us]"), type=pa.timestamp("us")),
                pa.array(ts[ends].astype("datetime64[us]"), type=pa.timestamp("us")),
                pa.array((ends - starts + 1).astype(np.int64)),
            ],
            names=[key_col, "session_start", "session_end", "n_events"],
        )

    return ds.groupby(key_col).map_groups(sessions, batch_format="pyarrow")
