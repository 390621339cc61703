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


def incremental_sum_agg(
    input_files,
    state_dir: str,
    key_cols,
    value_cols,
):
    """Incrementally-maintained SUM aggregate (the materialized-view /
    incremental-ETL contract): ``state_dir`` holds the running
    aggregate over every input file ever folded in; each call
    aggregates ONLY the not-yet-processed files (fingerprint =
    path+st_mtime_ns+size, recorded in ``manifest.json``), merges the delta
    into the persisted state with one groupby-sum (legal because SUM
    is commutative + associative over the partition lattice), and
    publishes atomically: the new state parquet carries the sha of the
    manifest it corresponds to INSIDE its schema metadata, is renamed
    into place first, and the manifest is written second. A crash
    between the two leaves state/manifest mismatched — detected on
    the next call, which rebuilds from scratch rather than ever
    double-counting a file.

    Returns the merged aggregate as a pa.Table sorted by key.
    Daily-driver shape: new date partitions fold in at the cost of
    the delta, never a full recompute; the full-history rebuild stays
    available as the fallback and as the correctness oracle.
    """
    import hashlib as _hl
    import json as _json

    import ray.data
    from ray.data.aggregate import Sum

    key_cols, value_cols = list(key_cols), list(value_cols)
    files = sorted(str(p) for p in input_files)
    # st_mtime_ns (not float getmtime): an in-place rewrite with
    # identical size inside coarse-mtime granularity must still move
    # the fingerprint, else it would silently serve a stale aggregate
    fps = {
        p: f"{os.stat(p).st_mtime_ns}|{os.path.getsize(p)}" for p in files
    }
    os.makedirs(state_dir, exist_ok=True)
    man_path = os.path.join(state_dir, "manifest.json")
    state_path = os.path.join(state_dir, "state.parquet")

    def _man_fingerprint(man: dict) -> str:
        return _hl.sha1(
            _json.dumps(man, sort_keys=True).encode()
        ).hexdigest()

    man: dict = {}
    state_tbl = None
    if os.path.exists(man_path) and os.path.exists(state_path):
        try:
            with open(man_path) as f:
                man = _json.load(f)
        except ValueError:  # corrupt manifest: rebuild from scratch
            man = {}
        if man:
            t = pq.read_table(state_path)
            meta = t.schema.metadata or {}
            if meta.get(b"manifest_sha") == _man_fingerprint(man).encode():
                state_tbl = t
            else:  # torn publish: rebuild from scratch
                man = {}

    # a file ALREADY folded whose content changed (fingerprint moved)
    # cannot be incrementally re-folded — its old rows are baked into
    # the state. Never double-count: rebuild from scratch.
    if any(p in man and man[p] != fps[p] for p in files):
        man, state_tbl = {}, None

    new_files = [p for p in files if man.get(p) != fps[p]]
    if not new_files and state_tbl is not None:
        return state_tbl.sort_by([(k, "ascending") for k in key_cols])

    if new_files:
        delta = (
            ray.data.read_parquet(new_files, columns=key_cols + value_cols)
            .groupby(key_cols)
            .aggregate(*[Sum(v, alias_name=v) for v in value_cols])
        )
        parts = [delta.to_arrow_refs()]
        import ray as _ray

        tabs = [t for refs in parts for t in _ray.get(refs)]
        delta_tbl = (
            pa.concat_tables([t for t in tabs if t.num_rows])
            if any(t.num_rows for t in tabs)
            else None
        )
    else:  # empty input + no prior state: fall to the typed-empty path
        delta_tbl = None
    merged_inputs = [
        t
        for t in (
            state_tbl.select(key_cols + value_cols) if state_tbl is not None else None,
            delta_tbl,
        )
        if t is not None
    ]
    if not merged_inputs:
        # type the empty state from the INPUT schema, not guesses — a
        # wrong-typed empty state would poison every later fold
        src_schema = pq.read_schema(files[0]) if files else None
        merged = pa.Table.from_arrays(
            [
                pa.array(
                    [],
                    type=(
                        src_schema.field(c).type
                        if src_schema is not None and c in src_schema.names
                        else pa.string()
                    ),
                )
                for c in key_cols
            ]
            + [pa.array([], type=pa.int64()) for _ in value_cols],
            names=key_cols + value_cols,
        )
    else:
        allt = pa.concat_tables(merged_inputs, promote_options="default")
        g = pa.TableGroupBy(allt, key_cols).aggregate(
            [(v, "sum") for v in value_cols]
        )
        merged = g.rename_columns(key_cols + value_cols)

    new_man = dict(man)
    for p in new_files:
        new_man[p] = fps[p]
    merged = merged.replace_schema_metadata(
        {b"manifest_sha": _man_fingerprint(new_man).encode()}
    )
    tmp = f"{state_path}.{os.getpid()}.tmp"
    pq.write_table(merged, tmp)
    os.replace(tmp, state_path)
    man_tmp = f"{man_path}.{os.getpid()}.tmp"
    with open(man_tmp, "w") as f:
        _json.dump(new_man, f)
    os.replace(man_tmp, man_path)
    return merged.sort_by([(k, "ascending") for k in key_cols])
