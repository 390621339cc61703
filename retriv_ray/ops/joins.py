"""Temporal joins Ray Data lacks as primitives: as-of join and
range (interval) join, expressed as hash-shuffle + per-group
vectorized searchsorted.

Both ops take a *left* event stream and a *right* anchor stream that
share a key column and an event-time column, union them with a side
tag (one schema, one shuffle), group by key, and match inside each
group with numpy searchsorted over sorted int64-microsecond
timestamps — no Python loop over rows, no driver-side state.

Partitioning assumption (documented per the custom-operator rule):
the unsalted path requires one key's rows to fit in one map_groups
group. For hot keys both ops provide an EXACT time-bucket-salted
path: the left row belongs to exactly one bucket, and each right row
is replicated into every bucket its match window overlaps (bounded
by window/tolerance ÷ bucket size + 1 copies), so every (left,
right) candidate pair meets in exactly one group — no stitch pass,
no duplicate pairs, byte-identical to the unsalted output. The
as-of salted path therefore requires a finite ``tolerance_s``
(unbounded lookback would need unbounded replication; pandas
``merge_asof`` has the same ``tolerance`` notion).

Tie/determinism rule: among right rows with equal admissible
timestamps the one with the greatest id wins (sort by (ts, id),
take the last at-or-before), so results are hash-stable and the SQL
oracle can pin the same rule with ``ORDER BY r.ts DESC, r.id DESC
LIMIT 1`` semantics.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_US = 1_000_000


def _tag_side(
    ds,
    key_col: str,
    ts_col: str,
    id_col: str,
    val_col: Optional[str],
    side: int,
):
    """Project one input onto the shared (key, ts_us, id, val, side)
    schema — columns are pruned before the shuffle so the exchange
    moves 33 bytes/row regardless of the source's width."""

    def tag(batch: pa.Table) -> pa.Table:
        val = (
            pc.cast(batch.column(val_col), pa.float64())
            if val_col is not None
            else pa.nulls(batch.num_rows, type=pa.float64())
        )
        return pa.Table.from_arrays(
            [
                pc.cast(batch.column(key_col), pa.int64()),
                # normalize to us first: parquet sources are already
                # timestamp[us], pandas-born datasets arrive as [ns]
                pc.cast(pc.cast(batch.column(ts_col), pa.timestamp("us")), pa.int64()),
                pc.cast(batch.column(id_col), pa.int64()),
                val,
                pa.array(np.full(batch.num_rows, side, dtype=np.int8)),
            ],
            names=["key", "ts_us", "id", "val", "side"],
        )

    cols = [key_col, ts_col, id_col] + ([val_col] if val_col else [])
    return ds.select_columns(cols).map_batches(tag, batch_format="pyarrow")


def _split_group(group: pa.Table):
    """(left ts/id, right ts/id/val) arrays, each sorted by (ts, id)."""
    side = group.column("side").to_numpy(zero_copy_only=False)
    ts = group.column("ts_us").to_numpy(zero_copy_only=False)
    ids = group.column("id").to_numpy(zero_copy_only=False)
    val = group.column("val").to_numpy(zero_copy_only=False)
    out = []
    for s in (0, 1):
        m = side == s
        t, i, v = ts[m], ids[m], val[m]
        order = np.lexsort((i, t))
        out.append((t[order], i[order], v[order]))
    return out


def _bucket_salt_right(batch: pa.Table, span_us: int, bucket_us: int) -> pa.Table:
    """Replicate each right row into every bucket that
    [ts, ts + span_us) overlaps; left rows keep their own bucket."""
    if batch.num_rows == 0:
        # all-filtered upstream blocks still flow through map_batches;
        # keep the schema consistent (bucket column present) so Ray can
        # unify empty and non-empty blocks.
        return batch.append_column("bucket", pa.array([], type=pa.int64()))
    ts = batch.column("ts_us").to_numpy(zero_copy_only=False)
    side = batch.column("side").to_numpy(zero_copy_only=False)
    b_lo = ts // bucket_us
    # inclusive last bucket a right row can still match in
    b_hi = np.where(side == 1, (ts + span_us - 1) // bucket_us, b_lo)
    counts = (b_hi - b_lo + 1).astype(np.int64)
    idx = np.repeat(np.arange(len(ts)), counts)
    offs = np.arange(counts.sum()) - np.repeat(
        np.concatenate(([0], np.cumsum(counts)[:-1])), counts
    )
    bucket = np.repeat(b_lo, counts) + offs
    return batch.take(pa.array(idx)).append_column("bucket", pa.array(bucket))


_ASOF_SCHEMA = pa.schema(
    [
        ("key", pa.int64()),
        ("event_id", pa.int64()),
        ("ts", pa.timestamp("us")),
        ("anchor_id", pa.int64()),
        ("anchor_ts", pa.timestamp("us")),
        ("anchor_val", pa.float64()),
    ]
)

_RANGE_SCHEMA = pa.schema(
    [
        ("key", pa.int64()),
        ("event_id", pa.int64()),
        ("anchor_id", pa.int64()),
        ("delta_s", pa.int64()),
    ]
)


def _empty(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()


def asof_join(
    left_ds,
    right_ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    right_val_col: Optional[str] = "value",
    tolerance_s: Optional[int] = None,
    bucket_s: Optional[int] = None,
):
    """For every left row, the single right row of the same key with
    the greatest (ts, id) such that right.ts <= left.ts (and, with
    ``tolerance_s``, right.ts > left.ts - tolerance). Inner join: rows
    with no admissible anchor are dropped. Output one row per matched
    left row: (key, event_id, ts, anchor_id, anchor_ts, anchor_val).

    ``bucket_s`` turns on the exact salted path (requires
    ``tolerance_s``; see module docstring for the replication bound).
    """
    if bucket_s is not None and tolerance_s is None:
        raise ValueError(
            "asof_join(bucket_s=...) requires tolerance_s: unbounded "
            "lookback would need unbounded right-row replication"
        )
    tol_us = tolerance_s * _US if tolerance_s is not None else None

    tagged = _tag_side(left_ds, key_col, ts_col, id_col, None, 0).union(
        _tag_side(right_ds, key_col, ts_col, id_col, right_val_col, 1)
    )

    def match(group: pa.Table) -> pa.Table:
        (lt, li, _), (rt, ri, rv) = _split_group(group)
        if len(lt) == 0 or len(rt) == 0:
            return _empty(_ASOF_SCHEMA)
        pos = np.searchsorted(rt, lt, side="right") - 1
        ok = pos >= 0
        if tol_us is not None:
            ok &= rt[np.maximum(pos, 0)] > lt - tol_us
        if not ok.any():
            return _empty(_ASOF_SCHEMA)
        lt, li, pos = lt[ok], li[ok], pos[ok]
        key = group.column("key")[0].as_py()
        return pa.Table.from_arrays(
            [
                pa.array(np.full(len(lt), key, dtype=np.int64)),
                pa.array(li),
                pa.array(lt.astype("datetime64[us]"), type=pa.timestamp("us")),
                pa.array(ri[pos]),
                pa.array(rt[pos].astype("datetime64[us]"), type=pa.timestamp("us")),
                pa.array(rv[pos]),
            ],
            names=_ASOF_SCHEMA.names,
        )

    if bucket_s is None:
        return tagged.groupby("key").map_groups(match, batch_format="pyarrow")

    bucket_us = bucket_s * _US

    def salt(batch: pa.Table) -> pa.Table:
        return _bucket_salt_right(batch, tol_us, bucket_us)

    return (
        tagged.map_batches(salt, batch_format="pyarrow")
        .groupby(["key", "bucket"])
        .map_groups(match, batch_format="pyarrow")
    )


def range_join(
    left_ds,
    right_ds,
    window_s: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    bucket_s: Optional[int] = None,
):
    """All (left, right) pairs of the same key with
    right.ts <= left.ts < right.ts + window_s (the attribution-window
    interval join). Output one row per pair: (key, event_id,
    anchor_id, delta_s = floor((left.ts - right.ts) / 1s)).

    ``bucket_s`` turns on the exact salted path (right rows
    replicated into the <= window_s/bucket_s + 1 buckets their
    window overlaps)."""
    win_us = window_s * _US

    tagged = _tag_side(left_ds, key_col, ts_col, id_col, None, 0).union(
        _tag_side(right_ds, key_col, ts_col, id_col, None, 1)
    )

    def match(group: pa.Table) -> pa.Table:
        (lt, li, _), (rt, ri, _) = _split_group(group)
        if len(lt) == 0 or len(rt) == 0:
            return _empty(_RANGE_SCHEMA)
        # admissible rights for left ts T: rt in (T - win_us, T]
        lo = np.searchsorted(rt, lt - win_us, side="right")
        hi = np.searchsorted(rt, lt, side="right")
        counts = hi - lo
        total = int(counts.sum())
        if total == 0:
            return _empty(_RANGE_SCHEMA)
        l_idx = np.repeat(np.arange(len(lt)), counts)
        offs = np.arange(total) - np.repeat(
            np.concatenate(([0], np.cumsum(counts)[:-1])), counts
        )
        r_idx = np.repeat(lo, counts) + offs
        key = group.column("key")[0].as_py()
        return pa.Table.from_arrays(
            [
                pa.array(np.full(total, key, dtype=np.int64)),
                pa.array(li[l_idx]),
                pa.array(ri[r_idx]),
                pa.array((lt[l_idx] - rt[r_idx]) // _US),
            ],
            names=_RANGE_SCHEMA.names,
        )

    if bucket_s is None:
        return tagged.groupby("key").map_groups(match, batch_format="pyarrow")

    bucket_us = bucket_s * _US

    def salt(batch: pa.Table) -> pa.Table:
        return _bucket_salt_right(batch, win_us, bucket_us)

    return (
        tagged.map_batches(salt, batch_format="pyarrow")
        .groupby(["key", "bucket"])
        .map_groups(match, batch_format="pyarrow")
    )
