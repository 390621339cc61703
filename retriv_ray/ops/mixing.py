"""Token-budget mixture sampling — the data-mixing step of a
pretraining pipeline: given per-source mixture weights and a total
token budget, deterministically select documents per source until
each source's token share is filled.

Selection contract (SQL-oracle-checked): within each source, docs are
ordered by (md5_low64(f"{seed}:{id}"), id) — the repo-wide
``md5_number_lower`` hash convention, so the sample is reproducible
and partition-independent — and a doc is kept while the INCLUSIVE
running token sum stays <= the source's budget
(floor(weight x total)). A doc that would overflow the budget is
dropped along with everything after it; no partial documents.

Distributed shape (no driver-side doc list at any scale):
1. one vectorized counting pass emits (source, bucket, n) partials,
   bucket = top ``log2(n_buckets)`` bits of the rank hash — a PREFIX
   of the sort key, so bucket order == rank order;
2. a tiny groupby((source, bucket)) sum — sources x n_buckets rows —
   prefix-sums on the driver and broadcasts (O(sources x buckets));
3. a groupby((source, bucket)) shuffle of (id, source, n, rank) rows
   lets each group sort locally, add its broadcast base, and cut at
   the budget. Each group holds ~1/n_buckets of one source — raise
   ``n_buckets`` for hot sources.

This is the same bucketed-prefix-sum shape as
:func:`retriv_ray.ops.prep.pack_token_stream`'s distributed path.
"""

from __future__ import annotations

import math
from typing import Dict

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from retriv_ray.ops.prep import _md5_low64


def mixture_sample(
    ds,
    weights: Dict[str, float],
    token_budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    seed: int = 0,
    n_buckets: int = 256,
):
    """Dataset of (id, source, text, ...) -> Dataset of (id, source,
    n_tokens) — the selected mixture. Sources absent from ``weights``
    are dropped entirely."""
    import ray

    assert n_buckets & (n_buckets - 1) == 0, "n_buckets must be a power of 2"
    shift = np.uint64(64 - int(math.log2(n_buckets))) if n_buckets > 1 else np.uint64(64)
    budgets = {
        s: int(math.floor(w * token_budget)) for s, w in weights.items()
    }

    def annotate(batch: pa.Table) -> pa.Table:
        src = batch.column(source_col).to_pylist()
        keep = np.asarray([s in budgets for s in src], dtype=bool)
        idx = pa.array(np.flatnonzero(keep), type=pa.int64())
        batch = batch.take(idx)
        src = [s for s, k in zip(src, keep) if k]
        ids = batch.column(id_col).to_pylist()
        rank = _md5_low64([f"{seed}:{v}" for v in ids])
        txt = pc.fill_null(pc.cast(batch.column(text_col), pa.string()), "")
        n = pc.cast(pc.count_substring_regex(txt, pattern=r"\S+"), pa.int64())
        bucket = (rank >> shift).astype(np.int64) if n_buckets > 1 else np.zeros(len(src), np.int64)
        gkey = [f"{s}|{b:06d}" for s, b in zip(src, bucket)]
        return pa.Table.from_arrays(
            [
                batch.column(id_col),
                pa.array(src, type=pa.string()),
                n,
                pa.array(rank.astype(np.uint64), type=pa.uint64()),
                pa.array(gkey, type=pa.string()),
            ],
            names=[id_col, source_col, "n", "rank", "gkey"],
        )

    annotated = ds.map_batches(annotate, batch_format="pyarrow").materialize()

    # ---- stage 1: tiny per-(source, bucket) sums -> exclusive bases
    def partial(batch: pa.Table) -> pa.Table:
        t = pa.Table.from_arrays(
            [batch.column("gkey"), batch.column("n")], names=["gkey", "n"]
        )
        return (
            pa.TableGroupBy(t, "gkey")
            .aggregate([("n", "sum")])
            .rename_columns(["gkey", "n"])
        )

    from ray.data.aggregate import Sum

    bparts = list(
        annotated.map_batches(partial, batch_format="pyarrow")
        .groupby("gkey")
        .aggregate(Sum("n"))
        .iter_batches(batch_format="pyarrow", batch_size=None)
    )
    btbl = (
        pa.concat_tables([pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b for b in bparts])
        if bparts
        else pa.table({"gkey": pa.array([], type=pa.string()), "sum(n)": pa.array([], type=pa.int64())})
    )
    gkeys = np.asarray(btbl.column("gkey").to_pylist(), dtype=object)
    gsums = btbl.column("sum(n)").to_numpy()
    order = np.argsort(gkeys, kind="stable")  # (source, bucket) asc
    gkeys, gsums = gkeys[order], gsums[order]
    srcs = np.asarray([k.rsplit("|", 1)[0] for k in gkeys], dtype=object)
    base = np.zeros(len(gkeys), dtype=np.int64)
    if len(gkeys):
        new_src = np.concatenate(([True], srcs[1:] != srcs[:-1]))
        csum = np.cumsum(gsums)
        prev = np.concatenate(([0], csum[:-1]))
        # restart the running sum at each source boundary: subtract
        # the exclusive cumsum at the source's first row (prev is
        # nondecreasing, so a running max carries it forward)
        src_base = np.where(new_src, prev, 0)
        np.maximum.accumulate(src_base, out=src_base)
        base = prev - src_base
    bref = ray.put((gkeys, base))

    # ---- stage 2: per-group local sort + cumsum + budget cut
    def cut(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], type=group.column(id_col).type),
                    source_col: pa.array([], type=pa.string()),
                    "n_tokens": pa.array([], type=pa.int64()),
                }
            )
        gk = group.column("gkey")[0].as_py()
        src = gk.rsplit("|", 1)[0]
        keys, bases0 = ray.get(bref)
        b0 = int(bases0[np.searchsorted(keys, gk)])
        ids = group.column(id_col).to_numpy()
        rank = group.column("rank").to_numpy()
        n = group.column("n").to_numpy()
        o = np.lexsort((ids, rank))
        running = b0 + np.cumsum(n[o])
        keep = o[running <= budgets[src]]
        keep.sort()
        idx = pa.array(keep, type=pa.int64())
        return pa.Table.from_arrays(
            [
                group.column(id_col).take(idx),
                group.column(source_col).take(idx),
                pa.compute.cast(group.column("n").take(idx), pa.int64()),
            ],
            names=[id_col, source_col, "n_tokens"],
        )

    return annotated.groupby("gkey").map_groups(cut, batch_format="pyarrow")
