"""Sentinel-padded wrapper around Ray Data's native hash join.

Ray Data 2.49's ``Dataset.join`` fails when one side contributes ZERO
blocks to the exchange (an entirely-empty dataset, e.g. "no duplicate
candidates found"): each ``HashShuffleAggregator`` partition then
rebuilds that side as a zero-column table and pyarrow's Acero join
raises ``ArrowInvalid: No match or multiple matches for key field
reference``. Empty datasets are a legitimate steady state for every
join in this repo (dedup verify joins with no candidates, anti joins
with an empty probe side, date-filtered fact tables), so the native
join alone is not safe to ship.

``safe_join`` unions ONE all-null sentinel row onto each side before
the join. Join keys are null on the sentinel and Acero's hash join
never matches null keys, so sentinels add no matched rows; each side
now always ships at least one schema-bearing block, which is all the
aggregator needs. A nullable int8 marker column (null on real rows, 1
on the sentinel) lets a cheap post-filter drop the sentinel rows that
OUTER joins emit as unmatched; the marker adds one null-buffer column
per batch (no data copy) and is dropped from the output.

The sentinel alone is not sufficient: groupby aggregates emit
zero-COLUMN blocks for empty hash partitions, ``map_batches`` never
invokes its UDF on empty non-mapping batches (it forwards the raw
block — ``plan_udf_map_op.py`` in Ray 2.49), so no map stage can
scrub them, and the join's hash exchange forwards them into the
aggregators where they poison the per-partition concat
(``ArrowInvalid: No match ... for key field reference``). The only
place they can be dropped is the aggregator itself:
``_patch_join_aggregation`` wraps
``JoiningShuffleAggregation.accept`` to skip 0-row/0-column shards
— they carry no data and no schema, so dropping them never changes
a join result. The sentinel still guarantees that every partition
receives at least one schema-bearing (possibly 0-row) slice per
side, which is what ``finalize`` needs to build each side's table.

Laziness is preserved end to end: no ``count()`` / ``materialize()``
probe runs the upstream pipeline twice. Callers that know their
sides' schemas statically should pass ``left_schema``/``right_schema``
to avoid even the metadata fetch of ``Dataset.schema()``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import pyarrow as pa
import pyarrow.compute as pc

_LMARK = "__sjl"
_RMARK = "__sjr"

_patched = False

try:  # import guarded so a future-Ray internals move degrades gracefully
    from ray.data._internal.execution.operators.join import (
        JoiningShuffleAggregation as _RayJoinAggregation,
    )
except Exception:  # pragma: no cover - future-Ray fallback
    _RayJoinAggregation = None


if _RayJoinAggregation is not None:

    class _EmptyTolerantJoinAggregation(_RayJoinAggregation):
        """Ray's join aggregation, minus the 0-row/0-column poison
        shards that groupby aggregates emit for empty partitions (see
        module doc). Top-level class so cloudpickle serializes it BY
        REFERENCE: the aggregator ACTORS import this module and run
        this ``accept`` — patching the method on the driver alone
        would never reach them."""

        def accept(self, input_seq_id, partition_id, partition_shard):
            import os

            if os.environ.get("RETRIV_SJ_DEBUG"):
                print(
                    f"[SJ] ACCEPT seq={input_seq_id} pid={partition_id} "
                    f"cols={getattr(partition_shard, 'num_columns', '?')} "
                    f"rows={getattr(partition_shard, 'num_rows', '?')} "
                    f"names={list(getattr(partition_shard, 'column_names', []))[:8]}",
                    flush=True,
                )
            if (
                isinstance(partition_shard, pa.Table)
                and partition_shard.num_columns == 0
                and partition_shard.num_rows == 0
            ):
                return
            super().accept(input_seq_id, partition_id, partition_shard)

        def finalize(self, partition_id):
            import os

            if os.environ.get("RETRIV_SJ_DEBUG"):
                l = self._get_partition_builder(
                    input_seq_id=0, partition_id=partition_id
                ).build()
                r = self._get_partition_builder(
                    input_seq_id=1, partition_id=partition_id
                ).build()
                print(
                    f"[SJ] FINALIZE pid={partition_id} "
                    f"L:{l.num_columns}c/{l.num_rows}r "
                    f"R:{r.num_columns}c/{r.num_rows}r",
                    flush=True,
                )
            return super().finalize(partition_id)


def _patch_join_aggregation() -> None:
    """Driver-side: default every planned ``JoinOperator`` to the
    empty-tolerant aggregation. The planner constructs JoinOperator on
    the driver; the aggregation class travels to the aggregator actors
    inside the factory closure, by reference. Idempotent."""
    global _patched
    if _patched:
        return
    try:
        from ray.data._internal.execution.interfaces.ref_bundle import (
            RefBundle,
        )
        from ray.data._internal.execution.operators import join as _join_mod

        orig_init = _join_mod.JoinOperator.__init__

        def init(self, *args, **kwargs):
            kwargs.setdefault(
                "shuffle_aggregation_type", _EmptyTolerantJoinAggregation
            )
            orig_init(self, *args, **kwargs)

        _join_mod.JoinOperator.__init__ = init

        # Ray's hash exchange broadcasts schemas (ships empty shards to
        # EVERY partition) only with the FIRST shuffle task per side —
        # but a 0-row first block short-circuits inside _shuffle_block
        # and ships nothing, while still consuming the one-shot flag
        # (hash_shuffle.py:548,589 vs :223). A side whose row-bearing
        # blocks come after any empty block then never propagates its
        # schema, and partitions that receive no shard rebuild that
        # side as a zero-column table -> ArrowInvalid at finalize.
        # Join-scoped fix: dispatch blocks one at a time and give the
        # broadcast back when the consuming block was (possibly) empty,
        # so the first PROVABLY row-bearing block broadcasts. A double
        # broadcast (num_rows unknown) is harmless: extra 0-row
        # schema-ful shards concat away.
        orig_add = _join_mod.JoinOperator._do_add_input_inner

        def add_inner(self, input_bundle, input_index):
            pairs = list(zip(input_bundle.block_refs, input_bundle.metadata))
            if len(pairs) <= 1:
                subs = [(input_bundle, pairs[0][1] if pairs else None)]
            else:
                subs = [
                    (
                        RefBundle(
                            blocks=((br, md),),
                            schema=input_bundle.schema,
                            owns_blocks=input_bundle.owns_blocks,
                        ),
                        md,
                    )
                    for br, md in pairs
                ]
            for sub, md in subs:
                prev = self._has_schemas_broadcasted[input_index]
                orig_add(self, sub, input_index)
                if (
                    not prev
                    and md is not None
                    and (md.num_rows is None or md.num_rows == 0)
                ):
                    self._has_schemas_broadcasted[input_index] = False

        _join_mod.JoinOperator._do_add_input_inner = add_inner
        _patched = True
    except Exception:  # pragma: no cover - future-Ray fallback
        _patched = True


def arrow_schema(ds) -> pa.Schema:
    """Arrow schema of a Dataset (metadata fetch; may execute a plan
    prefix for derived datasets — pass an explicit schema to avoid).
    Normalizes Ray's pandas-block schema wrapper to a real
    ``pa.Schema``."""
    sch = ds.schema(fetch_if_missing=True)
    if sch is None:
        raise ValueError(
            "safe_join: side has no schema metadata (a derived dataset "
            "that produced zero rows) — pass left_schema/right_schema "
            "explicitly"
        )
    base = getattr(sch, "base_schema", sch)
    if not isinstance(base, pa.Schema):
        import numpy as np

        def to_arrow(t):
            if isinstance(t, pa.DataType):
                return t
            if np.dtype(t) == np.dtype(object):
                # pandas-block object columns are strings in this repo
                # (Arrow-read text); other object payloads must pass an
                # explicit schema
                return pa.string()
            return pa.from_numpy_dtype(t)

        base = pa.schema(
            [(n, to_arrow(t)) for n, t in zip(sch.names, sch.types)]
        )
    return base


def _pad(ds, schema: pa.Schema, marker: str):
    """Append a null int8 ``marker`` column to every batch and union
    one all-null sentinel row (marker=1) so the side is never empty
    and every block is schema-bearing. Zero-column empty blocks pass
    through the marker map untouched (Ray never calls the UDF on
    empty batches); ``_patch_join_aggregation`` drops them at the
    aggregator."""
    import ray

    if marker in schema.names:
        raise ValueError(f"column name {marker!r} is reserved by safe_join")
    sent = pa.table(
        {f.name: pa.nulls(1, f.type) for f in schema}
    ).append_column(marker, pa.array([1], pa.int8()))

    def addm(batch: pa.Table) -> pa.Table:
        return batch.append_column(marker, pa.nulls(batch.num_rows, pa.int8()))

    return ds.map_batches(addm, batch_format="pyarrow").union(
        ray.data.from_arrow(sent)
    )


def safe_join(
    left,
    right,
    *,
    join_type: str,
    num_partitions: int,
    on: Sequence[str],
    right_on: Optional[Sequence[str]] = None,
    left_schema: Optional[pa.Schema] = None,
    right_schema: Optional[pa.Schema] = None,
):
    """``Dataset.join`` that tolerates empty sides (see module doc).

    Same signature surface as the native join plus optional static
    schemas. Supports every native ``join_type``; sentinel rows that
    outer joins emit as unmatched are filtered by marker, so real
    null-key rows (kept by left/right/full outer) are unaffected.
    """
    _patch_join_aggregation()
    rkeys = tuple(right_on) if right_on is not None else tuple(on)
    ls = left_schema if left_schema is not None else arrow_schema(left)
    rs = right_schema if right_schema is not None else arrow_schema(right)

    joined = _pad(left, ls, _LMARK).join(
        _pad(right, rs, _RMARK),
        join_type=join_type,
        num_partitions=num_partitions,
        on=tuple(on),
        right_on=rkeys,
    )

    def strip(batch: pa.Table) -> pa.Table:
        keep = None
        for c in (_LMARK, _RMARK):
            if c in batch.column_names:
                k = pc.not_equal(pc.fill_null(batch.column(c), 0), 1)
                keep = k if keep is None else pc.and_(keep, k)
        if keep is not None:
            batch = batch.filter(keep)
        drop = [c for c in (_LMARK, _RMARK) if c in batch.column_names]
        return batch.drop_columns(drop)

    return joined.map_batches(strip, batch_format="pyarrow")
