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


def hopping_window(
    ds,
    window_s: int = 3600,
    hop_s: int = 1800,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
):
    """Overlapping (hopping/sliding) windows: each event lands in the
    ``window_s / hop_s`` windows covering it; output is one row per
    (key, window_start_s) with n_events and integer-cents sum — the
    same exact-arithmetic contract as :func:`tumbling_window`. The
    per-event window fan-out happens inside the per-batch combiner, so
    the shuffle still moves one row per (key, window) per batch, not
    ``k`` rows per event. ``window_s`` must be a multiple of ``hop_s``
    (second-aligned boundaries make floor-to-second assignment exact
    for microsecond timestamps)."""
    from ray.data.aggregate import Sum

    assert window_s % hop_s == 0, "window must be a multiple of hop"
    k = window_s // hop_s

    def partial(batch: pa.Table) -> pa.Table:
        t = (
            batch.column(ts_col).to_numpy().astype("datetime64[us]").astype(np.int64)
            // 1_000_000
        )
        # same rounding kernel as tumbling_window (pc.round), so both
        # operators share the SQL oracle's arithmetic exactly
        cents = pc.cast(
            pc.round(pc.multiply(batch.column(value_col), pa.scalar(100.0))),
            pa.int64(),
        ).to_numpy()
        keys = batch.column(key_col)
        last = (t // hop_s) * hop_s
        starts = (last[:, None] - hop_s * np.arange(k)[None, :]).ravel()
        idx = np.repeat(np.arange(len(t)), k)
        tbl = pa.Table.from_arrays(
            [
                keys.take(pa.array(idx)),
                pa.array(starts),
                pa.array(cents[idx]),
            ],
            names=[key_col, "window_start_s", "c"],
        )
        g = pa.TableGroupBy(tbl, [key_col, "window_start_s"]).aggregate(
            [("c", "count"), ("c", "sum")]
        )
        return g.rename_columns([key_col, "window_start_s", "n", "cents"])

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([key_col, "window_start_s"])
        .aggregate(Sum("n"), Sum("cents"))
    )
    return out.rename_columns({"sum(n)": "n_events", "sum(cents)": "value_cents"})


def _session_table(
    key: int, ts_us: np.ndarray, n_ev: np.ndarray | None,
    gap_us: int, key_col: str,
) -> pa.Table:
    """Sessions over SORTED int64-us timestamps. ``n_ev`` is the event
    count each row represents (None -> 1, the raw-event case); counts
    are summed per session so the stitch pass can reuse this kernel."""
    gaps = np.diff(ts_us) > gap_us
    starts = np.concatenate(([0], np.flatnonzero(gaps) + 1))
    bounds = np.append(starts, len(ts_us))
    if n_ev is None:
        counts = (bounds[1:] - bounds[:-1]).astype(np.int64)
    else:
        counts = np.add.reduceat(n_ev.astype(np.int64), starts)
    ends = bounds[1:] - 1
    return pa.Table.from_arrays(
        [
            pa.array(np.full(len(starts), key, dtype=np.int64)),
            pa.array(ts_us[starts].astype("datetime64[us]"), type=pa.timestamp("us")),
            pa.array(ts_us[ends].astype("datetime64[us]"), type=pa.timestamp("us")),
            pa.array(counts),
        ],
        names=[key_col, "session_start", "session_end", "n_events"],
    )


def sessionize(
    ds,
    gap_seconds: int = 1800,
    key_col: str = "user_id",
    ts_col: str = "ts",
    salt_seconds: int | None = None,
):
    """Session windows per key: events sorted by ts within a key are
    split where the gap exceeds ``gap_seconds``. Returns one row per
    session (key, session_start, session_end, n_events).

    ``salt_seconds=None`` groups by key alone — fine when one key's
    events fit in one group. For pathological hot keys, pass a salt
    period (e.g. 86400): stage 1 sessionizes per (key, time-bucket)
    group, stage 2 stitches each key's per-bucket sessions — merging
    where the cross-bucket gap is within threshold — over SESSION
    rows, which are smaller than event rows by the per-session event
    count. Both paths produce byte-identical output (time buckets are
    disjoint and ordered, so bucket-local sessions + the same gap rule
    over their boundaries reconstruct the unsalted split exactly)."""
    gap_us = gap_seconds * 1_000_000

    def sessions(group: pa.Table) -> pa.Table:
        key = group.column(key_col)[0].as_py()
        ts = np.sort(
            group.column(ts_col).to_numpy().astype("datetime64[us]").astype(np.int64)
        )
        return _session_table(key, ts, None, gap_us, key_col)

    if salt_seconds is None:
        return ds.groupby(key_col).map_groups(sessions, batch_format="pyarrow")

    salt_us = salt_seconds * 1_000_000

    def add_salt(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch.column(ts_col), pa.int64())
        return batch.append_column(
            "_salt", pc.divide(ts, pa.scalar(salt_us, type=pa.int64()))
        )

    def stitch(group: pa.Table) -> pa.Table:
        key = group.column(key_col)[0].as_py()
        s = group.column("session_start").to_numpy().astype("datetime64[us]").astype(np.int64)
        e = group.column("session_end").to_numpy().astype("datetime64[us]").astype(np.int64)
        n = group.column("n_events").to_numpy()
        order = np.argsort(s, kind="stable")
        s, e, n = s[order], e[order], n[order]
        # same gap rule, applied between consecutive sessions: bucket
        # time-disjointness makes ends nondecreasing in start order,
        # so next_start - prev_end is the true inter-session gap.
        brk = (s[1:] - e[:-1]) > gap_us
        starts = np.concatenate(([0], np.flatnonzero(brk) + 1))
        bounds = np.append(starts, len(s))
        ends = bounds[1:] - 1
        return pa.Table.from_arrays(
            [
                pa.array(np.full(len(starts), key, dtype=np.int64)),
                pa.array(s[starts].astype("datetime64[us]"), type=pa.timestamp("us")),
                pa.array(e[ends].astype("datetime64[us]"), type=pa.timestamp("us")),
                pa.array(np.add.reduceat(n.astype(np.int64), starts)),
            ],
            names=[key_col, "session_start", "session_end", "n_events"],
        )

    partials = (
        ds.map_batches(add_salt, batch_format="pyarrow")
        .groupby([key_col, "_salt"])
        .map_groups(sessions, batch_format="pyarrow")
    )
    return partials.groupby(key_col).map_groups(stitch, batch_format="pyarrow")


def rolling_event_stats(
    ds,
    window_rows: int = 5,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
):
    """Per-key ROW-window rolling aggregates — the feature-engineering
    staple SQL spells ``... OVER (PARTITION BY key ORDER BY ts, id
    ROWS BETWEEN w-1 PRECEDING AND CURRENT ROW)``. For every event,
    over the trailing ``window_rows`` events of the same key ordered
    by (ts, id): event count ``n_window``, value sum and max as
    integer cents (``floor(value * 100)`` — floor, not round, so the
    quantization is rounding-mode-independent between Arrow and the
    SQL oracle; sums of integers are order-exact). Returns
    (event_id, key, n_window, sum_cents, max_cents).

    Scale plan: one hash shuffle groups events by key; inside each
    group the window is a vectorized prefix-sum difference (sum) and
    a sliding-window maximum — O(rows), no per-row Python. Group size
    = events per key, naturally bounded for user-keyed streams; for a
    pathological hot key the exact split is time-bucket salting with
    a ``window_rows - 1`` row overlap carried between buckets (the
    ``sessionize`` split-and-stitch pattern) — overlap rows are
    recomputed, results are identical because a ROW window only looks
    ``window_rows - 1`` rows back.
    """

    def roll(group: pa.Table) -> pa.Table:
        ts = group.column(ts_col).cast(pa.int64()).to_numpy()
        ids = group.column(id_col).to_numpy()
        order = np.lexsort((ids, ts))
        cents = np.floor(
            group.column(value_col).to_numpy().astype(np.float64) * 100.0
        ).astype(np.int64)[order]
        n = len(order)
        w = int(window_rows)
        csum = np.concatenate(([0], np.cumsum(cents)))
        lo = np.maximum(np.arange(n) - (w - 1), 0)
        hi = np.arange(n) + 1
        sums = csum[hi] - csum[lo]
        counts = hi - lo
        if n:
            pad = np.full(w - 1, np.iinfo(np.int64).min, dtype=np.int64)
            sw = np.lib.stride_tricks.sliding_window_view(
                np.concatenate((pad, cents)), w
            )
            maxs = sw.max(axis=1)
        else:
            maxs = np.empty(0, dtype=np.int64)
        return pa.Table.from_arrays(
            [
                pa.array(ids[order]),
                group.column(key_col).take(order),
                pa.array(counts.astype(np.int64)),
                pa.array(sums),
                pa.array(maxs),
            ],
            names=[id_col, key_col, "n_window", "sum_cents", "max_cents"],
        )

    return ds.groupby(key_col).map_groups(roll, batch_format="pyarrow")


def rollup_counts(
    ds,
    keys=("lang", "source"),
    value_col: str = "n_chars",
):
    """SQL ``GROUP BY ROLLUP(k1, k2, ...)`` parity: counts and integer
    value sums at every rollup level — (k1, k2, ...), (k1, NULL, ...),
    ..., grand total — with NULL (empty-string sentinel ``'<all>'``)
    marking rolled-up positions so the output stays string-typed and
    hashable. Returns one row per rollup group:
    (k1, ..., kn, n, value_sum).

    Scale plan: each batch emits its local counts for ALL levels in
    one pass (a batch with g distinct full-key groups emits at most
    g * (levels+1) partial rows — the combiner), then ONE
    groupby(all keys) finishes. No level needs its own shuffle; the
    rolled-up levels are tiny and ride along.
    """
    from ray.data.aggregate import Sum

    keys = list(keys)
    ALL = "<all>"

    def partial(batch: pa.Table) -> pa.Table:
        # Arrow-group once at the finest level, then roll the TINY
        # grouped table up one level at a time: per-batch work is
        # O(rows) in C++ kernels plus O(distinct combos) per level —
        # replaces the per-row Python defaultdict walk over all levels
        empty = pa.Table.from_arrays(
            [pa.array([], type=pa.string()) for _ in keys]
            + [pa.array([], type=pa.int64())] * 2,
            names=keys + ["n", "value_sum"],
        )
        if batch.num_rows == 0:
            return empty
        key_arrs = [
            pc.fill_null(pc.cast(batch.column(k), pa.string()), "")
            for k in keys
        ]
        t = pa.Table.from_arrays(
            key_arrs + [pc.cast(batch.column(value_col), pa.int64())],
            names=keys + ["v"],
        )
        plain = (
            pa.TableGroupBy(t, keys)
            .aggregate([("v", "count"), ("v", "sum")])
            .rename_columns(keys + ["n", "value_sum"])
        )
        levels = []
        for lvl in range(len(keys) + 1):
            kept = keys[: len(keys) - lvl]
            if lvl:
                prev = plain.select(kept + ["n", "value_sum"]) if kept else plain
                if kept:
                    plain = (
                        pa.TableGroupBy(prev, kept)
                        .aggregate([("n", "sum"), ("value_sum", "sum")])
                        .rename_columns(kept + ["n", "value_sum"])
                    )
                else:
                    plain = pa.Table.from_arrays(
                        [
                            pa.array(
                                [pc.sum(prev.column("n")).as_py()],
                                type=pa.int64(),
                            ),
                            pa.array(
                                [pc.sum(prev.column("value_sum")).as_py()],
                                type=pa.int64(),
                            ),
                        ],
                        names=["n", "value_sum"],
                    )
            padded = plain
            for k in keys[len(kept):]:
                padded = padded.append_column(
                    k, pa.array([ALL] * padded.num_rows, type=pa.string())
                )
            levels.append(padded.select(keys + ["n", "value_sum"]))
        return pa.concat_tables(levels)

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(keys)
        .aggregate(Sum("n", alias_name="n"), Sum("value_sum", alias_name="value_sum"))
    )
    return out


def funnel_stages(
    ds,
    stages=("view", "click", "purchase"),
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
):
    """Classic funnel analysis: per key, how many of the ordered
    ``stages`` completed under greedy-min semantics — stage 1 anchors
    at its earliest event; stage k at its earliest event STRICTLY
    after stage k-1's anchor. Returns (key, stages_completed) for
    every key that has any event (0 = has events, none of stage 1).
    Timestamps compare in microseconds; strict inequality makes the
    result deterministic under equal timestamps on both engines.

    Scale plan: rows project to (key, ts_us, stage_idx) at the read
    (non-stage events drop to a sentinel and still count the key);
    ONE key-hash shuffle, then a vectorized per-group pass (one
    masked argmin per stage). Hot keys: bounded by events-per-key,
    same stance as sessionize.
    """
    stage_idx = {s: i for i, s in enumerate(stages)}

    def project(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col).cast(pa.int64()).to_numpy()
        si = np.asarray(
            [stage_idx.get(v, -1) for v in batch.column(type_col).to_pylist()],
            dtype=np.int64,
        )
        return pa.Table.from_arrays(
            [batch.column(key_col), pa.array(ts), pa.array(si)],
            names=[key_col, "ts_us", "si"],
        )

    def per_key(group: pa.Table) -> pa.Table:
        ts = group.column("ts_us").to_numpy()
        si = group.column("si").to_numpy()
        done = 0
        prev = None
        for k in range(len(stages)):
            mask = si == k if prev is None else (si == k) & (ts > prev)
            if not mask.any():
                break
            prev = ts[mask].min()
            done += 1
        return pa.Table.from_arrays(
            [
                group.column(key_col).slice(0, 1),
                pa.array([done], type=pa.int64()),
            ],
            names=[key_col, "stages_completed"],
        )

    return (
        ds.map_batches(project, batch_format="pyarrow")
        .groupby(key_col)
        .map_groups(per_key, batch_format="pyarrow")
    )


def retention_cohorts(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
):
    """Cohort retention matrix: cohort = a user's first active DAY;
    for every (cohort_day, day offset since cohort) count the users
    active on that offset day. Day boundaries are UTC midnight;
    output is (cohort_day_s: int64 epoch seconds, offset_days: int64,
    n_users: int64) — all-integer, so the SQL-oracle hash covers
    values.

    Scale plan: a per-batch combiner dedupes to distinct
    (user, day) pairs BEFORE the shuffle (an active user emits one
    row per day per batch, not one per event); ONE user-hash shuffle
    computes each user's first day and their distinct offset rows
    group-locally; the final groupby moves one row per (user,
    active-day) — bounded by user-days, orders of magnitude below
    event count at any scale. Nothing is gathered on the driver.
    """

    def distinct_days(batch: pa.Table) -> pa.Table:
        day_s = pc.divide(
            pc.cast(pc.floor_temporal(batch.column(ts_col), unit="day"), pa.int64()),
            pa.scalar(1_000_000, type=pa.int64()),
        )
        t = pa.Table.from_arrays(
            [batch.column(key_col), day_s], names=[key_col, "day_s"]
        )
        return pa.TableGroupBy(t, [key_col, "day_s"]).aggregate([])

    def per_user(group: pa.Table) -> pa.Table:
        days = np.unique(group.column("day_s").to_numpy())
        first = days[0]
        n = len(days)
        return pa.Table.from_arrays(
            [
                pa.array(np.full(n, first, dtype=np.int64)),
                pa.array((days - first) // 86400),
            ],
            names=["cohort_day_s", "offset_days"],
        )

    out = (
        ds.map_batches(distinct_days, batch_format="pyarrow")
        .groupby(key_col)
        .map_groups(per_user, batch_format="pyarrow")
        .groupby(["cohort_day_s", "offset_days"])
        .count()
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                batch.column("cohort_day_s"),
                batch.column("offset_days"),
                pc.cast(batch.column("count()"), pa.int64()),
            ],
            names=["cohort_day_s", "offset_days", "n_users"],
        )

    return out.map_batches(finish, batch_format="pyarrow")


def rolling_time_stats(
    ds,
    window_seconds: int = 3600,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
):
    """Per-key TIME-window rolling aggregates — SQL's ``... OVER
    (PARTITION BY key ORDER BY ts RANGE BETWEEN INTERVAL w PRECEDING
    AND CURRENT ROW)``. For each event: count and integer-cents sum
    (``floor(value * 100)``) over the key's events with
    ``ts in [cur - w, cur]`` inclusive — including ts-peers, exactly
    the SQL RANGE peer-group rule. Returns (event_id, key, n_window,
    sum_cents).

    Scale plan: one key-hash shuffle; inside each group the variable
    window bounds are two vectorized ``searchsorted`` calls over the
    sorted timestamp array and the sum is a prefix-sum difference —
    O(rows log rows) per group, no per-row Python. Hot keys: the
    sessionize-style time-bucket split with a ``window_seconds``
    overlap carried between buckets reproduces the result exactly
    (a time window only looks ``window_seconds`` back).
    """
    w_us = int(window_seconds) * 1_000_000

    def roll(group: pa.Table) -> pa.Table:
        ts = group.column(ts_col).cast(pa.int64()).to_numpy()
        order = np.argsort(ts, kind="stable")
        ts = ts[order]
        cents = np.floor(
            group.column(value_col).to_numpy().astype(np.float64) * 100.0
        ).astype(np.int64)[order]
        lo = np.searchsorted(ts, ts - w_us, side="left")
        hi = np.searchsorted(ts, ts, side="right")
        csum = np.concatenate(([0], np.cumsum(cents)))
        return pa.Table.from_arrays(
            [
                group.column(id_col).take(order),
                group.column(key_col).take(order),
                pa.array((hi - lo).astype(np.int64)),
                pa.array(csum[hi] - csum[lo]),
            ],
            names=[id_col, key_col, "n_window", "sum_cents"],
        )

    return ds.groupby(key_col).map_groups(roll, batch_format="pyarrow")


def distinct_users_daily(
    ds,
    key_col: str = "event_type",
    ts_col: str = "ts",
    user_col: str = "user_id",
):
    """Exact grouped COUNT(DISTINCT): distinct users per (key, day).
    Returns (key, day_s: int64 epoch seconds, n_users: int64).

    Scale plan: the per-batch combiner dedupes (key, day, user)
    triples before the shuffle, so repeat activity inside a batch
    never ships; ONE (key, day)-hash shuffle, then ``np.unique``
    inside the group. Exact at any scale without a distinct-count
    sketch; group size is bounded by daily active users per key —
    for a key×day hot enough to overflow a worker, pre-bucket users
    into ``hash(user) % B`` sub-groups and sum the per-bucket
    distinct counts (disjoint buckets make the sum exact).
    """

    def distinct_triples(batch: pa.Table) -> pa.Table:
        day_s = pc.divide(
            pc.cast(pc.floor_temporal(batch.column(ts_col), unit="day"), pa.int64()),
            pa.scalar(1_000_000, type=pa.int64()),
        )
        t = pa.Table.from_arrays(
            [batch.column(key_col), day_s, batch.column(user_col)],
            names=[key_col, "day_s", user_col],
        )
        return pa.TableGroupBy(t, [key_col, "day_s", user_col]).aggregate([])

    def per_group(group: pa.Table) -> pa.Table:
        n = len(np.unique(group.column(user_col).to_numpy()))
        return pa.Table.from_arrays(
            [
                group.column(key_col).slice(0, 1),
                group.column("day_s").slice(0, 1),
                pa.array([n], type=pa.int64()),
            ],
            names=[key_col, "day_s", "n_users"],
        )

    return (
        ds.map_batches(distinct_triples, batch_format="pyarrow")
        .groupby([key_col, "day_s"])
        .map_groups(per_group, batch_format="pyarrow")
    )


def date_histogram_pipeline(
    ds,
    unit: str = "month",
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    moving: int = 3,
):
    """ES ``date_histogram`` with a CALENDAR interval (month/week/...,
    via ``floor_temporal`` — boundaries match SQL ``date_trunc``, not
    fixed-width buckets) plus the ES *pipeline aggregations* over each
    key's bucket series, all integer-exact:

    - ``cum_cents``     — ``cumulative_sum`` of value_cents
    - ``delta_cents``   — ``derivative`` (minus the previous PRESENT
      bucket; null on each key's first bucket — ES semantics for
      series with gaps)
    - ``moving_cents``  — ``moving_fn`` trailing sum over the last
      ``moving`` present buckets including the current one

    Scale plan: the histogram itself is :func:`tumbling_window` (per-
    batch ``pa.TableGroupBy`` combiner, ONE shuffle of (key, bucket)
    partials); the pipeline pass runs inside ``groupby(key).map_groups``
    over the already-aggregated bucket rows — bounded by buckets per
    key (calendar buckets: tiny at any corpus size), never touching
    the events again.
    """
    hist = tumbling_window(
        ds, every=unit, key_col=key_col, ts_col=ts_col, value_col=value_col
    )

    def series(group: pa.Table) -> pa.Table:
        start = group.column("window_start_s").to_numpy(zero_copy_only=False)
        order = np.argsort(start, kind="stable")
        group = group.take(pa.array(order))
        cents = group.column("value_cents").to_numpy(zero_copy_only=False)
        cum = np.cumsum(cents)
        delta = np.empty(len(cents), dtype=np.int64)
        delta[1:] = cents[1:] - cents[:-1]
        mov = cum - np.concatenate(([0] * min(moving, len(cum)), cum[:-moving]))
        return (
            group.append_column("cum_cents", pa.array(cum, type=pa.int64()))
            .append_column(
                "delta_cents",
                pa.array(
                    np.ma.masked_array(delta, mask=[True] + [False] * (len(delta) - 1)),
                    type=pa.int64(),
                ),
            )
            .append_column("moving_cents", pa.array(mov, type=pa.int64()))
        )

    return (
        hist.groupby(key_col)
        .map_groups(series, batch_format="pyarrow")
        .sort([key_col, "window_start_s"])
    )


def numeric_histogram(
    ds,
    value_col: str,
    interval: int,
    key_col: str | None = None,
):
    """ES ``histogram`` aggregation on a numeric (int64) column:
    fixed-``interval`` buckets keyed by ``floor(value / interval) *
    interval`` (floor division — negative values bucket toward
    -infinity, ES semantics), with count and exact integer sum per
    bucket; optionally sub-keyed by ``key_col``. Empty buckets are
    omitted (ES ``min_doc_count: 1``).

    One per-batch ``pa.TableGroupBy`` combiner, one (key, bucket)
    exchange — the tumbling-window pattern on a value axis.
    """
    from ray.data.aggregate import Sum

    keys = ([key_col] if key_col else []) + ["bucket"]

    def partial(batch: pa.Table) -> pa.Table:
        # drop null values (and null keys): a NaN bucket would flip
        # the int64 columns to float64 and break partial-schema unity
        valid = pc.is_valid(batch.column(value_col))
        if key_col:
            valid = pc.and_(valid, pc.is_valid(batch.column(key_col)))
        batch = batch.filter(valid)
        v = pc.cast(batch.column(value_col), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        bucket = (v // interval) * interval
        cols = (
            [batch.column(key_col)] if key_col else []
        ) + [pa.array(bucket), pa.array(v)]
        t = pa.Table.from_arrays(cols, names=keys + ["v"])
        g = pa.TableGroupBy(t, keys).aggregate([("v", "count"), ("v", "sum")])
        return g.rename_columns(keys + ["n", "value_sum"])

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(keys)
        .aggregate(Sum("n", alias_name="n"), Sum("value_sum", alias_name="value_sum"))
    )
    return out.sort(keys)


def population_drift(
    ds_a,
    ds_b,
    value_col: str,
    interval: int,
):
    """Population Stability Index between two dataset versions (the
    training-data drift staple): fixed-``interval`` buckets over the
    int64 metric, per-bucket counts from both sides, and the PSI term

        psi_term_e9 = floor(1e9 * (pa - pb) * ln(pa / pb))

    with Laplace-smoothed shares ``p = (n + 0.5) / (total + 0.5 * K)``
    (K = number of occupied buckets) so empty-on-one-side buckets
    contribute finitely. Total PSI = sum(psi_term_e9) / 1e9
    (client-side; the emitted terms are exact integers, floor of ONE
    double expression — reproduced verbatim by the SQL oracle).

    Scale plan: one tagged union + ONE groupby(bucket) over per-batch
    bucket-count partials (the numeric_histogram combiner); the
    K / totals scalars are a tiny aggregate; the PSI map is
    per-bucket. Returns (bucket, n_a, n_b, psi_term_e9) sorted by
    bucket.
    """
    import math

    from ray.data.aggregate import Sum

    def tagged(side: int):
        def partial(batch: pa.Table) -> pa.Table:
            valid = pc.is_valid(batch.column(value_col))
            batch = batch.filter(valid)
            v = pc.cast(batch.column(value_col), pa.int64()).to_numpy(
                zero_copy_only=False
            )
            bucket = (v // interval) * interval
            t = pa.Table.from_arrays([pa.array(bucket)], names=["bucket"])
            g = pa.TableGroupBy(t, "bucket").aggregate([("bucket", "count")])
            n = g.column("bucket_count")
            zero = pa.array(
                np.zeros(g.num_rows, dtype=np.int64)
            )
            return pa.Table.from_arrays(
                [
                    g.column("bucket"),
                    pc.cast(n, pa.int64()) if side == 0 else zero,
                    pc.cast(n, pa.int64()) if side == 1 else zero,
                ],
                names=["bucket", "n_a", "n_b"],
            )

        return partial

    hist = (
        ds_a.map_batches(tagged(0), batch_format="pyarrow")
        .union(ds_b.map_batches(tagged(1), batch_format="pyarrow"))
        .groupby("bucket")
        .aggregate(
            Sum("n_a", alias_name="n_a"), Sum("n_b", alias_name="n_b")
        )
        .materialize()
    )
    # three scalars: occupied-bucket count and side totals
    k = hist.count()
    tot_a = hist.sum("n_a") or 0
    tot_b = hist.sum("n_b") or 0

    def psi(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "bucket" not in batch.schema.names:
            return pa.Table.from_arrays(
                [pa.array([], type=pa.int64())] * 4,
                names=["bucket", "n_a", "n_b", "psi_term_e9"],
            )
        na = batch.column("n_a").to_numpy(zero_copy_only=False).astype(np.float64)
        nb = batch.column("n_b").to_numpy(zero_copy_only=False).astype(np.float64)
        pa_ = (na + 0.5) / (tot_a + 0.5 * k)
        pb_ = (nb + 0.5) / (tot_b + 0.5 * k)
        term = np.floor(1e9 * (pa_ - pb_) * np.log(pa_ / pb_)).astype(np.int64)
        return batch.append_column("psi_term_e9", pa.array(term))

    return hist.map_batches(psi, batch_format="pyarrow").sort("bucket")
