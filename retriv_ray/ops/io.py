"""Resumable partitioned parquet output — the sink contract for
long-running 100 TB jobs.

``Dataset.write_parquet`` restarts from zero when a job dies; at
10^12 rows a sink must let the re-run skip finished work. This sink
routes rows to a FIXED set of key-hash buckets (md5 low-64 of the
key, the repo-wide hash convention — so the bucket a row lands in is
a function of its content, independent of partitioning, block sizes
or cluster width), writes each bucket atomically (tmp dir + rename +
``_DONE`` marker), and on re-run drops rows of completed buckets
BEFORE the exchange — the pipeline recomputes upstream (cheap,
streaming) but never rewrites finished partitions, and readers never
see a half-written bucket. The same idempotence story as the index
build's per-(shard, part) lineage (index/manifest.py), as a reusable
Dataset op.

Layout: ``out_dir/bucket-00042/part.parquet`` + ``_DONE``; read back
with :func:`read_resumable` (or plain ``read_parquet`` on the glob).
"""

from __future__ import annotations

import os
import shutil
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _bucket_dir(out_dir: str, i: int) -> str:
    return os.path.join(out_dir, f"bucket-{i:05d}")


def _done_buckets(out_dir: str, n_buckets: int) -> set:
    return {
        i
        for i in range(n_buckets)
        if os.path.exists(os.path.join(_bucket_dir(out_dir, i), "_DONE"))
    }


def resumable_write_parquet(
    ds,
    out_dir: str,
    key_col: str,
    n_buckets: int = 64,
    sort_within_bucket: Optional[str] = None,
) -> dict:
    """Write ``ds`` to ``out_dir`` as ``n_buckets`` atomic key-hash
    partitions; buckets already marked ``_DONE`` are skipped (their
    rows are filtered out before the shuffle). Returns
    ``{"written": w, "skipped": s, "rows": n}``.

    Pass ``sort_within_bucket`` (a column name) to make each bucket's
    FILE byte-stable across runs and partitionings — with it, a resumed
    run, a fresh run and a differently-partitioned run all produce
    identical bucket files. Size ``n_buckets`` so one bucket ≈ one
    comfortable parquet file (hundreds of MB at scale).
    """
    from retriv_ray.ops.dedup import _md5_low64_many

    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    os.makedirs(out_dir, exist_ok=True)
    done = _done_buckets(out_dir, n_buckets)

    def route(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_pylist()
        b = (_md5_low64_many([str(v) for v in keys]) % np.uint64(n_buckets)).astype(
            np.int64
        )
        batch = batch.append_column("__bucket", pa.array(b))
        if done:
            keep = ~np.isin(b, np.fromiter(done, dtype=np.int64))
            batch = batch.filter(pa.array(keep))
        return batch

    def write_bucket(group: pa.Table) -> pa.Table:
        i = int(group.column("__bucket")[0].as_py())
        t = group.drop_columns(["__bucket"])
        if sort_within_bucket is not None:
            t = t.sort_by(sort_within_bucket)
        final = _bucket_dir(out_dir, i)
        tmp = final + f".tmp-{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        pq.write_table(t, os.path.join(tmp, "part.parquet"))
        open(os.path.join(tmp, "_DONE"), "w").close()
        # atomic publish; a concurrent retry that lost the race just
        # discards its tmp dir
        shutil.rmtree(final, ignore_errors=True)
        os.rename(tmp, final)
        return pa.Table.from_arrays(
            [pa.array([i], type=pa.int64()), pa.array([t.num_rows], type=pa.int64())],
            names=["bucket", "rows"],
        )

    routed = ds.map_batches(route, batch_format="pyarrow")
    summary = (
        routed.groupby("__bucket")
        .map_groups(write_bucket, batch_format="pyarrow")
        .take_all()  # bounded: one row per written bucket
    )
    written = len(summary)
    rows = int(sum(r["rows"] for r in summary))
    return {"written": written, "skipped": len(done), "rows": rows}


def read_resumable(out_dir: str):
    """Dataset over a :func:`resumable_write_parquet` output —
    completed buckets only (half-written tmp dirs are invisible by
    construction, but a marker check keeps a crashed pre-rename
    layout from ever being read)."""
    import ray.data

    parts = sorted(
        os.path.join(out_dir, d, "part.parquet")
        for d in os.listdir(out_dir)
        if d.startswith("bucket-")
        and os.path.exists(os.path.join(out_dir, d, "_DONE"))
    )
    if not parts:
        raise FileNotFoundError(f"no completed buckets under {out_dir}")
    return ray.data.read_parquet(parts)
