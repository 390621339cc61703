"""Distributed inverted-index build — the Ray Data spine.

Replaces the reference's driver-resident build
(retriv/sparse_retriever/build_inverted_index.py:29-66: one
CountVectorizer CSR matrix in RAM) with a streaming shuffle build:

    read_parquet(conv_id, turn_idx, text)              [column-pruned read]
      ├─ groupby(conv_id).count/min/max                [shuffle A: conv-level, small]
      │    └─ sort(conv_id) → prefix-sum → conv_offsets (conv_id, base, n_turns)
      │       broadcast (ray.put) as sorted arrays; doc_id = base + turn_idx
      │       replicates the reference's enumeration-order internal ids
      │       (base_retriever.py:56-62) under stable (conv_id, turn_idx) order.
      ├─ map_batches(_TokenizePartials, actor pool)    [stateful: stemmer/memo/conv map]
      │    emits per-batch PARTIAL postings — one row per (term, doc-shard)
      │    with list<doc_id>, list<tf> — i.e. the combiner runs before the
      │    shuffle, so the exchange moves per-term partials, not
      │    (term, doc, tf) pairs. Per-shard doc-length rows ride the same
      │    exchange under a reserved part index.
      └─ DIRECT HASH SHUFFLE                            [shuffle B: THE term shuffle]
           gkey = shard * (P+1) + part,
           part  = crc32(term) % P        (explicit, deterministic hash partitioning)
           shard = doc_id // shard_docs   (doc-range sharding = hot-term skew
                                           splitting: a hot term's postings are
                                           spread across shards; each group is
                                           bounded by shard_docs * avg_len / P)
           gkey is a static function known at MAP time, so no
           comparison sort is needed: fused read+tokenize+partition
           tasks return one object per reduce bucket
           (_tokenize_partition_task, num_returns=n_buckets), and
           per-bucket reduce tasks (_reduce_bucket) fetch exactly
           their slice worker-to-worker. Local-path sources use this
           direct path; Dataset sources and >4k-file inputs fall back
           to the Dataset sort-shuffle (groupby(gkey).map_groups) —
           outputs are byte-identical either way because each group
           lexsorts its globally unique (term, doc_id) pairs before
           encoding. Each group block-encodes via
           encode_grouped_postings, writes segments/seg-SSSSS-PPPP.parquet
           atomically + a lineage record → resumable mid-shuffle.
      └─ read segments(term, df, cf) → groupby(term).sum → terms/ table
           [shuffle C: vocab-sized global df/cf + min_df pruning]
      └─ manifest.json (stats, config, fingerprint)

Scale notes (10^12 turns, 256 nodes):
- The only all-to-all over full data volume is shuffle B, and it moves
  compressed list-column partials (ascending doc_ids inside a batch).
- conv_offsets is gathered to the driver and broadcast once via
  ``ray.put`` (np.searchsorted lookup per batch). That holds to ~1e8
  conversations; beyond that the documented path is a bucketed hash
  join of turns against conv_offsets on conv_id (same key both sides).
- Resume: every (shard, part) group is idempotent — write-to-temp +
  rename, lineage record carries the build fingerprint; a re-run
  recomputes upstream tokenization (stateless) but skips the encode +
  write of completed groups (manifest.py).
- Determinism: segment bytes are independent of batching/parallelism
  (per-group lexsort over globally unique (term, doc_id) pairs).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import zlib
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from retriv_ray.config import SparseConfig
from retriv_ray.index import codec
from retriv_ray.index import manifest as mf
from retriv_ray.text.pipeline import TextPreprocessor

# Reserved part index for doc-length rows (gkey = shard*(P+1) + P).
# doc_ids are SHARD-LOCAL int32 (doc_id - shard*shard_docs): every
# group is one (shard, part), so the base is implied by gkey, and the
# exchange — the build's only full-volume all-to-all — moves half the
# bytes. Requires shard_docs <= 2^31 (enforced in build_index).
PAIR_SCHEMA = pa.schema(
    [
        ("gkey", pa.int64()),
        ("term", pa.string()),
        ("doc_ids", pa.list_(pa.int32())),
        ("tfs", pa.list_(pa.int32())),
    ]
)

SEGMENT_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("df", pa.int64()),
        ("cf", pa.int64()),
        ("doc_bytes", pa.binary()),
        ("tf_bytes", pa.binary()),
        ("counts", pa.list_(pa.int32())),
        ("last", pa.list_(pa.int64())),
        ("max_tf", pa.list_(pa.int32())),
        # per-block byte lengths: random access for block-skip decode
        ("doc_blens", pa.list_(pa.int32())),
        ("tf_blens", pa.list_(pa.int32())),
    ]
)


def term_part(term: str, num_parts: int) -> int:
    """Deterministic cross-process term hash partition (python's
    ``hash`` is salted per process — never use it for routing)."""
    return zlib.crc32(term.encode("utf-8")) % num_parts


def _term_parts_np(terms: np.ndarray, num_parts: int) -> np.ndarray:
    return np.fromiter(
        (zlib.crc32(t.encode("utf-8")) % num_parts for t in terms),
        dtype=np.int64,
        count=len(terms),
    )


# ---------------------------------------------------------------------------
# doc_id assignment: conv offsets
# ---------------------------------------------------------------------------


def _offsets_partial(batch: pa.Table) -> pa.Table:
    # vectorized per-batch combiner (pyarrow group_by is C++).
    # turn_sq (int64 square) adds a second moment to the contiguity
    # guard: min/max/count/sum alone admit compensating multisets
    # (e.g. [0,1,1,4,4,5] has the right min/max/count/sum), and a
    # silent duplicate would corrupt doc_id = base + turn_idx.
    ti = pc.cast(batch.column("turn_idx"), pa.int64())
    t = pa.Table.from_arrays(
        [batch.column("conv_id"), ti, pc.multiply(ti, ti)],
        names=["conv_id", "turn_idx", "turn_sq"],
    )
    return pa.TableGroupBy(t, "conv_id").aggregate(
        [
            ("turn_idx", "count"),
            ("turn_idx", "min"),
            ("turn_idx", "max"),
            ("turn_idx", "sum"),
            ("turn_sq", "sum"),
        ]
    ).rename_columns(
        [
            "conv_id", "count()", "min(turn_idx)", "max(turn_idx)",
            "sum(turn_idx)", "sumsq(turn_idx)",
        ]
    )


def _offsets_partial_from_file(path: str) -> pa.Table:
    import pyarrow.parquet as _pq

    return _offsets_partial(_pq.read_table(path, columns=["conv_id", "turn_idx"]))


def _offsets_partial_from_units(units: List[Tuple[str, int]]) -> pa.Table:
    """Partial over a list of (file, row_group) units — the row-group
    split lets the pre-pass fill every CPU slot even when the source
    has few files (8 files on a 16-slot cluster left half the slots
    idle as per-file tasks)."""
    import pyarrow.parquet as _pq

    tabs = []
    cur_path, cur_pf = None, None
    for path, rg in units:
        if path != cur_path:
            cur_path, cur_pf = path, _pq.ParquetFile(path)
        tabs.append(
            _offsets_partial(
                cur_pf.read_row_group(rg, columns=["conv_id", "turn_idx"])
            )
        )
    return pa.concat_tables(tabs)


def _plan_offset_units(files: List[str], n_tasks: int) -> List[List[Tuple[str, int]]]:
    """Round-robin (file, row_group) units into ``n_tasks`` chunks,
    keeping each chunk's units grouped by file (one ParquetFile open
    per file per task). Falls back to whole-file units when a footer
    is unreadable (the read task will surface the real error)."""
    units: List[Tuple[str, int]] = []
    for f in files:
        try:
            n_rg = pq.ParquetFile(f).metadata.num_row_groups
        except OSError:
            n_rg = 1
        units.extend((f, rg) for rg in range(max(1, n_rg)))
    n_tasks = max(1, min(n_tasks, len(units)))
    chunks: List[List[Tuple[str, int]]] = [[] for _ in range(n_tasks)]
    for i, u in enumerate(units):
        chunks[i % n_tasks].append(u)
    for c in chunks:
        c.sort()
    return [c for c in chunks if c]


def _list_parquet_files(source) -> Optional[List[str]]:
    """Local parquet file list for a path/list source, or None when
    the source isn't plain local paths (then the Dataset path of
    compute_conv_offsets handles it — e.g. cloud URIs via pyarrow.fs)."""
    paths = source if isinstance(source, list) else [source]
    out: List[str] = []
    for p in paths:
        if not isinstance(p, str) or "://" in p:
            return None
        if os.path.isfile(p):
            out.append(p)
        elif os.path.isdir(p):
            for root, _dirs, files in os.walk(p):
                out.extend(
                    os.path.join(root, f)
                    for f in sorted(files)
                    if f.endswith((".parquet", ".pq"))
                )
        else:
            return None
    return out or None


def compute_conv_offsets(ds, driver_merge_limit: int = 5_000_000) -> Tuple[pa.Table, int]:
    """(conv_id, base, n_turns) sorted by conv_id; doc_id = base + turn_idx.

    ``ds`` is a Dataset OR a path/list-of-paths source. Combiner-first
    either way: one partial row per conversation per input block, so
    only conv-level partials ever move. For path sources the partials
    run as one plain Ray task per parquet file (same work, but skips a
    whole Dataset-executor startup — this pass is the build's fixed
    overhead, measured ~1.5-2.5s of pure startup). Below
    ``driver_merge_limit`` partial rows the merge happens on the
    driver (no all-to-all); above it, a distributed groupby + sort
    handles the merge (the 10^9-conversation path).

    Validates the FIXTURES.md F1 invariant that turn_idx is 0-based
    and contiguous per conversation (otherwise base+turn_idx would not
    reproduce enumeration order and we fail loudly).
    """
    import ray

    files = None if not isinstance(ds, (str, list)) else _list_parquet_files(ds)
    if files is not None and len(files) > 4096:
        # the file-task path gathers per-file conv partials to the
        # driver before the size check; past ~4k files let the Dataset
        # path stream/merge them instead
        files = None
    if isinstance(ds, (str, list)) and files is None:
        import ray.data

        ds = ray.data.read_parquet(ds, columns=["conv_id", "turn_idx"])

    if files is not None:
        ncpu = int(ray.cluster_resources().get("CPU", 1))
        chunks = _plan_offset_units(files, n_tasks=max(len(files), 2 * ncpu))
        task = ray.remote(num_cpus=1)(_offsets_partial_from_units)
        tables = ray.get([task.remote(c) for c in chunks])
        t = pa.concat_tables(tables)
        partials = None
    else:
        partials = (
            ds.select_columns(["conv_id", "turn_idx"])
            .map_batches(_offsets_partial, batch_format="pyarrow")
            .materialize()
        )
        t = None
    if (t.num_rows if t is not None else partials.count()) <= driver_merge_limit:
        if t is None:
            t = pa.Table.from_batches(_gather(partials))
        return _merge_offset_partials(t)
    else:
        from ray.data.aggregate import Max, Min, Sum

        if partials is None:
            import ray.data

            # file-task partials above the driver limit: merge them
            # distributed (each table is conv-level, already combined)
            partials = ray.data.from_arrow(tables)
        agg = (
            partials.groupby("conv_id")
            .aggregate(
                Sum("count()"),
                Min("min(turn_idx)"),
                Max("max(turn_idx)"),
                Sum("sum(turn_idx)"),
                Sum("sumsq(turn_idx)"),
            )
            .sort("conv_id")
        )
        t = pa.Table.from_batches(_gather(agg))
        conv = t.column("conv_id").to_pylist()
        n = t.column("sum(count())").to_numpy()
        tmin = t.column("min(min(turn_idx))").to_numpy()
        tmax = t.column("max(max(turn_idx))").to_numpy()
        tsum = t.column("sum(sum(turn_idx))").to_numpy()
        tsq = t.column("sum(sumsq(turn_idx))").to_numpy()
    return _finalize_offsets(conv, n, tmin, tmax, tsum, tsq)


# ---------------------------------------------------------------------------
# sharded conv map: bucketed join of turns against conv offsets
# ---------------------------------------------------------------------------
#
# Above the broadcast limit the per-conversation offsets table never
# touches the driver OR a single worker: the conv-level partials
# groupby+sort (range-partitioned by conv_id), per-bucket turn sums
# prefix-sum on the driver (O(buckets) rows), and each bucket
# finalizes its own bases, writes its id_map parquet slice, and stays
# in the object store as one lookup object. doc_id assignment then
# becomes a bucketed map-side hash join: each tokenize task routes its
# conv_ids to buckets via the (tiny) boundary array and fetches only
# the buckets it touches (LRU-capped per worker) — with inputs laid
# out by conv range that is 1-2 buckets per task. Same pattern as
# ops/prep.py pack_token_stream's distributed prefix-sum.


def _offsets_block_stats(tbl: pa.Table) -> Tuple[int, int, Optional[str], Optional[str]]:
    """(n_convs, n_turns, first_conv, last_conv) of one sorted block."""
    if tbl.num_rows == 0:
        return (0, 0, None, None)
    conv = tbl.column("conv_id")
    return (
        tbl.num_rows,
        int(pc.sum(tbl.column("sum(count())")).as_py()),
        conv[0].as_py(),
        conv[-1].as_py(),
    )


def _finalize_offsets_block(tbl: pa.Table, base_start: int, bucket_idx: int, index_dir: str):
    """Finalize ONE conv-range bucket (run with ``num_returns=2``):
    validate turn contiguity, prefix-sum bases from ``base_start``,
    write id_map/conv_offsets-{i:05d}.parquet, and return the tiny
    meta separately from the (conv_ids, bases) lookup arrays so the
    driver fetches only the meta and tokenize workers only the
    arrays."""
    conv = np.asarray(tbl.column("conv_id").to_pylist(), dtype=object)
    n = tbl.column("sum(count())").to_numpy()
    tmin = tbl.column("min(min(turn_idx))").to_numpy()
    tmax = tbl.column("max(max(turn_idx))").to_numpy()
    tsum = tbl.column("sum(sum(turn_idx))").to_numpy()
    tsq = tbl.column("sum(sumsq(turn_idx))").to_numpy()
    _validate_offsets(conv, n, tmin, tmax, tsum, tsq)
    base = base_start + np.cumsum(n) - n
    table = pa.Table.from_arrays(
        [
            pa.array(conv, type=pa.string()),
            pa.array(base, type=pa.int64()),
            pa.array(n.astype(np.int64), type=pa.int64()),
        ],
        names=["conv_id", "base", "n_turns"],
    )
    mf.atomic_write_parquet(
        table,
        os.path.join(index_dir, "id_map", f"conv_offsets-{bucket_idx:05d}.parquet"),
    )
    return (int(tbl.num_rows), int(n.sum())), (conv, base)


def compute_conv_offsets_sharded(source, index_dir: str, n_buckets: Optional[int] = None):
    """Distributed conv-offset computation for conversation counts past
    the broadcast limit: returns ``(handle, doc_count)`` where
    ``handle = ("sharded", boundaries, [ObjectRef, ...])`` — boundaries
    is the first conv_id of each bucket, each ref resolves to that
    bucket's (conv_ids, bases) arrays. The per-conversation table is
    never gathered to the driver or ray.put whole; driver memory is
    O(buckets). Buckets double as the id_map parquet slices.
    """
    import ray
    import ray.data
    from ray.data.aggregate import Max, Min, Sum

    files = _list_parquet_files(source) if isinstance(source, (str, list)) else None
    if files is not None and len(files) <= 4096:
        ncpu = int(ray.cluster_resources().get("CPU", 1))
        chunks = _plan_offset_units(files, n_tasks=max(len(files), 2 * ncpu))
        task = ray.remote(num_cpus=1)(_offsets_partial_from_units)
        partials = ray.data.from_arrow_refs([task.remote(c) for c in chunks])
    else:
        if isinstance(source, (str, list)):
            ds = ray.data.read_parquet(source, columns=["conv_id", "turn_idx"])
        else:
            ds = source.select_columns(["conv_id", "turn_idx"])
        partials = ds.map_batches(_offsets_partial, batch_format="pyarrow")
    agg = (
        partials.groupby("conv_id")
        .aggregate(
            Sum("count()"),
            Min("min(turn_idx)"),
            Max("max(turn_idx)"),
            Sum("sum(turn_idx)"),
            Sum("sumsq(turn_idx)"),
        )
        .sort("conv_id")
    )
    n_buckets = n_buckets or int(os.environ.get("GRAFT_CONV_BUCKETS", "0")) or None
    if n_buckets:
        # order-preserving split (no shuffle): bucket-size control for
        # tests and for sources whose sort yields few big blocks
        agg = agg.repartition(n_buckets)
    agg = agg.materialize()

    os.makedirs(os.path.join(index_dir, "id_map"), exist_ok=True)
    block_refs = list(agg.to_arrow_refs())
    stats_task = ray.remote(num_cpus=1)(_offsets_block_stats)
    stats = ray.get([stats_task.remote(r) for r in block_refs])
    live = [(r, s) for r, s in zip(block_refs, stats) if s[0] > 0]
    if not live:
        raise ValueError("empty input dataset")
    for (_, a), (_, b) in zip(live, live[1:]):
        if not a[3] < b[2]:  # groupby output has unique keys -> strict
            raise ValueError(
                "conv offset blocks are not globally ordered after sort"
            )
    fin = ray.remote(num_cpus=1, num_returns=2)(_finalize_offsets_block)
    base = 0
    metas, data_refs, boundaries = [], [], []
    for i, (ref, s) in enumerate(live):
        m_ref, d_ref = fin.remote(ref, base, i, index_dir)
        metas.append(m_ref)
        data_refs.append(d_ref)
        boundaries.append(s[2])
        base += s[1]
    ray.get(metas)  # surface contiguity-validation errors NOW
    handle = ("sharded", np.asarray(boundaries, dtype=object), data_refs)
    return handle, int(base)


def read_conv_offsets(index_dir: str) -> pa.Table:
    """id_map reader for both layouts: the single conv_offsets.parquet
    of broadcast builds, or the concatenation (already globally
    conv_id-sorted) of a sharded build's conv_offsets-*.parquet."""
    d = os.path.join(index_dir, "id_map")
    single = os.path.join(d, "conv_offsets.parquet")
    if os.path.exists(single):
        return pq.read_table(single)
    parts = sorted(
        f
        for f in os.listdir(d)
        if f.startswith("conv_offsets-") and f.endswith(".parquet")
    )
    if not parts:
        raise FileNotFoundError(single)
    return pa.concat_tables([pq.read_table(os.path.join(d, f)) for f in parts])


def read_conv_offsets_range(index_dir: str, doc_lo: int, doc_hi: int) -> pa.Table:
    """conv_offsets rows whose doc range [base, base+n_turns) overlaps
    [doc_lo, doc_hi) — over either id_map layout, pruned by parquet
    row-group ``base`` statistics so a shard-ranged serving actor
    reads O(its slice) of the map, not the corpus (bases are globally
    ascending and contiguous across slices, so a row's range end is
    the NEXT row's base). Includes the conversation straddling
    ``doc_lo``."""
    d = os.path.join(index_dir, "id_map")
    single = os.path.join(d, "conv_offsets.parquet")
    if os.path.exists(single):
        paths = [single]
    else:
        paths = [
            os.path.join(d, f)
            for f in sorted(os.listdir(d))
            if f.startswith("conv_offsets-") and f.endswith(".parquet")
        ]
        if not paths:
            raise FileNotFoundError(single)
    # (file, row_group, min_base) in global order; group g covers
    # [min_g, min_{g+1}) — prune those entirely outside the window
    units: list = []
    prunable = True
    for p in paths:
        f = pq.ParquetFile(p)
        try:
            ci = f.schema_arrow.get_field_index("base")
        except Exception:
            ci = 1
        for rg in range(f.metadata.num_row_groups):
            st = f.metadata.row_group(rg).column(ci).statistics
            if st is None or st.min is None:
                prunable = False
                break
            units.append((p, rg, int(st.min)))
        if not prunable:
            break
    if prunable and units:
        keep: list = []
        for i, (p, rg, lo) in enumerate(units):
            end = units[i + 1][2] if i + 1 < len(units) else None
            if lo >= doc_hi:
                break
            if end is not None and end <= doc_lo:
                continue
            keep.append((p, rg))
        tabs = []
        open_files: dict = {}
        for p, rg in keep:
            f = open_files.get(p)
            if f is None:
                f = open_files[p] = pq.ParquetFile(p)
            tabs.append(f.read_row_group(rg))
        t = (
            pa.concat_tables(tabs)
            if tabs
            else pq.ParquetFile(paths[0]).schema_arrow.empty_table()
        )
    else:  # stats unavailable: fall back to the full read
        t = read_conv_offsets(index_dir)
    if t.num_rows == 0:
        return t
    base = t.column("base").to_numpy()
    lo_idx = max(0, int(np.searchsorted(base, doc_lo, side="right")) - 1)
    hi_idx = int(np.searchsorted(base, doc_hi, side="left"))
    return t.slice(lo_idx, hi_idx - lo_idx)


class ConvMapResolver:
    """Worker-side conv_id -> doc-base lookup over EITHER conv-map
    layout: the broadcast ObjectRef of (conv_ids, bases) arrays, or
    the ``("sharded", boundaries, refs)`` handle of
    :func:`compute_conv_offsets_sharded`. Sharded mode is a bucketed
    map-side hash join: rows route to conv-range buckets via the
    (tiny) boundary array and only the buckets a task touches are
    fetched, LRU-capped per worker — no whole-map object ever exists
    (the 10^11-conversation path). Shared by the main tokenize stage
    and the positional build."""

    def __init__(self, conv_map_ref):
        from collections import OrderedDict

        self._ref = conv_map_ref
        # deliberately lazy: when the conv offsets are still being
        # merged (overlapped build), tokenization proceeds and only
        # the first lookup blocks
        self._conv = None
        self._buckets: "OrderedDict[int, tuple]" = OrderedDict()
        self._bucket_cap = int(os.environ.get("GRAFT_CONV_BUCKET_CACHE", "16"))

    def conv_map(self):
        if self._conv is None:
            import ray

            self._conv = ray.get(self._ref)
        return self._conv

    def doc_bases(self, conv: np.ndarray) -> np.ndarray:
        """base[conv_id] per row. Broadcast mode: one searchsorted
        over the whole (fetched-once) map. Sharded mode: fetch only
        the touched buckets — with inputs laid out by conv range that
        is 1-2 buckets per task."""
        ref = self._ref
        if not (isinstance(ref, tuple) and ref[0] == "sharded"):
            convs, bases = self.conv_map()
            return bases[np.searchsorted(convs, conv)]
        import ray

        _, bounds, refs = ref
        b = np.searchsorted(bounds, conv, side="right") - 1
        np.maximum(b, 0, out=b)  # bounds[0] is the global min conv_id
        out = np.empty(len(conv), dtype=np.int64)
        for bi in np.unique(b):
            bucket = self._buckets.get(int(bi))
            if bucket is None:
                bucket = ray.get(refs[int(bi)])
                self._buckets[int(bi)] = bucket
                while len(self._buckets) > self._bucket_cap:
                    self._buckets.popitem(last=False)
            else:
                self._buckets.move_to_end(int(bi))
            convs_b, bases_b = bucket
            m = b == bi
            out[m] = bases_b[np.searchsorted(convs_b, conv[m])]
        return out


def _load_offsets_slice(path: str):
    """One id_map parquet slice -> ((first_conv, end_doc), (conv_ids,
    bases)). Run with ``num_returns=2`` so the driver fetches only the
    tiny meta and tokenize workers only the arrays."""
    t = pq.read_table(path)
    if t.num_rows == 0:
        return (None, 0), (np.empty(0, dtype=object), np.empty(0, dtype=np.int64))
    conv = np.asarray(t.column("conv_id").to_pylist(), dtype=object)
    base = t.column("base").to_numpy()
    n = t.column("n_turns").to_numpy()
    return (conv[0], int(base[-1] + n[-1])), (conv, base)


def sharded_handle_from_slices(index_dir: str):
    """Build a ``("sharded", boundaries, refs)`` conv-map handle over
    an EXISTING id_map (either layout) without materializing the map
    on the driver: one Ray task per parquet slice loads its
    (conv_ids, bases) arrays straight into the object store; the
    driver fetches only (first_conv, end_doc) per slice. Lets a
    positional build reuse a sharded main build's doc-id assignment
    at conversation counts past the broadcast limit. Returns
    ``(handle, doc_count)``."""
    import ray

    d = os.path.join(index_dir, "id_map")
    single = os.path.join(d, "conv_offsets.parquet")
    if os.path.exists(single):
        paths = [single]
    else:
        paths = [
            os.path.join(d, f)
            for f in sorted(os.listdir(d))
            if f.startswith("conv_offsets-") and f.endswith(".parquet")
        ]
    if not paths:
        raise FileNotFoundError(single)
    task = ray.remote(num_cpus=1, num_returns=2)(_load_offsets_slice)
    pairs = [task.remote(p) for p in paths]
    metas = ray.get([m for m, _ in pairs])
    live = [(m, r) for m, (_, r) in zip(metas, pairs) if m[0] is not None]
    if not live:
        raise ValueError(f"empty conv offsets under {d}")
    boundaries = np.asarray([m[0] for m, _ in live], dtype=object)
    handle = ("sharded", boundaries, [r for _, r in live])
    return handle, int(live[-1][0][1])


def _merge_offset_partials(t: pa.Table) -> Tuple[pa.Table, int]:
    """Merge conv-level offset partials (one pandas groupby) and
    finalize: validation + prefix-sum. Pure — runs on the driver or
    inside a Ray task (the overlapped direct-path build)."""
    df = t.to_pandas()
    g = df.groupby("conv_id", sort=True).agg(
        {
            "count()": "sum",
            "min(turn_idx)": "min",
            "max(turn_idx)": "max",
            "sum(turn_idx)": "sum",
            "sumsq(turn_idx)": "sum",
        }
    )
    return _finalize_offsets(
        g.index.tolist(),
        g["count()"].to_numpy(),
        g["min(turn_idx)"].to_numpy(),
        g["max(turn_idx)"].to_numpy(),
        g["sum(turn_idx)"].to_numpy(),
        g["sumsq(turn_idx)"].to_numpy(),
    )


def _validate_offsets(conv, n, tmin, tmax, tsum, tsq) -> None:
    # contiguity: min==0, max+1==count, sum==n(n-1)/2 AND
    # sumsq==n(n-1)(2n-1)/6 — two independent moments on top of
    # min/max/count. One moment admits compensating multisets (e.g.
    # [0,1,1,4,4,5] passes min/max/count/sum); matching both the
    # first and second moment as well as min/max/count has no
    # non-contiguous integer solution in realistic ranges, so a
    # duplicate+gap pair can no longer silently corrupt
    # doc_id = base + turn_idx.
    n64 = n.astype(np.int64)
    want_sum = n64 * (n64 - 1) // 2
    want_sq = n64 * (n64 - 1) * (2 * n64 - 1) // 6
    if len(n) and (
        tmin.min() != 0
        or not np.array_equal(tmax + 1, n)
        or not np.array_equal(tsum.astype(np.int64), want_sum)
        or not np.array_equal(tsq.astype(np.int64), want_sq)
    ):
        bad = np.flatnonzero(
            (tmin != 0)
            | (tmax + 1 != n)
            | (tsum.astype(np.int64) != want_sum)
            | (tsq.astype(np.int64) != want_sq)
        )[:5]
        raise ValueError(
            "turn_idx must be 0-based, contiguous and duplicate-free per "
            f"conv_id; violations e.g. conv_ids {[conv[i] for i in bad]}"
        )


def _finalize_offsets(conv, n, tmin, tmax, tsum, tsq) -> Tuple[pa.Table, int]:
    _validate_offsets(conv, n, tmin, tmax, tsum, tsq)
    base = np.cumsum(n) - n
    table = pa.Table.from_arrays(
        [
            pa.array(conv, type=pa.string()),
            pa.array(base, type=pa.int64()),
            pa.array(n, type=pa.int64()),
        ],
        names=["conv_id", "base", "n_turns"],
    )
    return table, int(n.sum())


def _merge_offsets_task(*tables: pa.Table):
    """Remote form of the offsets merge (run with ``num_returns=2``):
    returns ``(offsets_table, doc_count)`` and ``(conv_ids, bases)``
    as SEPARATE objects, so tokenize workers fetch only the broadcast
    arrays and the driver only the table. Lets the whole offsets pass
    run CONCURRENTLY with the tokenize map wave (see build_index):
    map tasks block on the second object lazily, at their first
    partial-aggregation step, after their reads/tokenization."""
    table, doc_count = _merge_offset_partials(pa.concat_tables(tables))
    conv_ids = np.asarray(table.column("conv_id").to_pylist(), dtype=object)
    bases = table.column("base").to_numpy()
    return (table, doc_count), (conv_ids, bases)


def _gather(ds) -> List[pa.RecordBatch]:
    """Small-dataset gather to driver as record batches."""
    import ray

    out: List[pa.RecordBatch] = []
    for t in ray.get(list(ds.to_arrow_refs())):
        out.extend(t.to_batches())
    if not out:
        raise ValueError("empty input dataset")
    return out


# ---------------------------------------------------------------------------
# map side: tokenize + per-batch partial postings
# ---------------------------------------------------------------------------


_WORKER_STATE: Dict[str, "_TokenizePartials"] = {}


def tokenize_partials_fn(cfg_json, conv_map_ref, num_parts, shard_docs):
    """Task-form of the tokenize stage: per-worker-process state
    (TextPreprocessor + broadcast conv map) lives in a module-level
    cache, built once per worker and reused across tasks AND across
    builds in the same session. Tasks run in Ray's shared, already-warm
    worker pool — unlike a dedicated actor pool, there is no N-process
    spawn+import storm at the start of every build (measured ~6s of
    the sandbox build wall at concurrency=31)."""

    def fn(batch: pa.Table) -> pa.Table:
        key = json.dumps(cfg_json, sort_keys=True) + str(conv_map_ref)
        st = _WORKER_STATE.get(key)
        if st is None:
            st = _TokenizePartials(
                SparseConfig.from_json(cfg_json), conv_map_ref, num_parts, shard_docs
            )
            _WORKER_STATE.clear()  # one live build config per worker
            _WORKER_STATE[key] = st
        return st(batch)

    return fn


class _TokenizePartials:
    """Tokenize stage body: stateful TextPreprocessor (stemmer memo,
    compiled regexes — built ONCE per worker) + broadcast conv-offset
    arrays (``ray.get`` once per worker, from the object store).
    Usable directly as a map_batches callable class (actor pool) or
    via :func:`tokenize_partials_fn` (task pool, the default).

    Per pyarrow batch, fully vectorized after tokenization:
    token→code via one dict pass, then lexsort/reduceat to per-(term,
    doc) tfs, then run-splitting by (term, shard) into list columns.
    """

    def __init__(self, cfg: SparseConfig, conv_map_ref, num_parts: int, shard_docs: int):
        self.pre = TextPreprocessor(cfg)
        self._conv_ref = conv_map_ref
        self._resolver = ConvMapResolver(conv_map_ref)
        self.P = num_parts
        self.shard_docs = shard_docs

    def _conv_map(self):
        return self._resolver.conv_map()

    def _doc_bases(self, conv: np.ndarray) -> np.ndarray:
        """base[conv_id] per row — see :meth:`ConvMapResolver.doc_bases`
        (broadcast searchsorted, or the bucketed map-side hash join on
        a sharded handle)."""
        return self._resolver.doc_bases(conv)

    def __call__(self, batch: pa.Table) -> pa.Table:
        P, shard_docs = self.P, self.shard_docs

        # tokenize FIRST (the expensive step; needs no global state) —
        # only the string-level chain runs per turn; the split happens
        # in Arrow (whitespace path: token strings never exist as
        # Python objects) and the stopword filter + stemmer run once
        # per UNIQUE raw token (Zipf: ~2% of the flat count). Both
        # shrink the Python working set of the tokenize wave — the
        # memory-bandwidth-sensitive leg of the N->4N scaling rule.
        texts = batch.column("text").to_pylist()
        n_rows = len(texts)
        if self.pre.arrow_splittable:
            norm = self.pre.normalized
            la = pc.utf8_split_whitespace(
                pa.array(
                    [norm("" if t is None else t) for t in texts],
                    type=pa.string(),
                )
            )
            flat_arr = la.flatten()
            reps = np.diff(la.offsets.to_numpy().astype(np.int64))
            n_flat = len(flat_arr)
        else:
            tokens = self.pre.raw_tokens_many(
                "" if t is None else t for t in texts
            )
            from itertools import chain

            flat_tokens = list(chain.from_iterable(tokens))
            reps = np.fromiter(
                (len(t) for t in tokens), dtype=np.int64, count=n_rows
            )
            flat_arr = pa.array(flat_tokens, type=pa.string())
            n_flat = len(flat_tokens)

        # flat raw tokens -> codes via Arrow dictionary_encode (C++
        # hash table over UTF-8; the per-token Python setdefault loop
        # was the build's hottest line, the per-occurrence stem/stop
        # loop the second-hottest)
        if n_flat:
            denc = flat_arr.dictionary_encode()
            raw_codes = denc.indices.to_numpy().astype(np.int64)
            # finish the chain over unique raw tokens only: None =
            # stopword (M12 quirk: unstemmed token vs stemmed list)
            stems = self.pre.stem_or_none_many(denc.dictionary.to_pylist())
            kept_idx = [i for i, s in enumerate(stems) if s is not None]
            senc = pa.array(
                [stems[i] for i in kept_idx], type=pa.string()
            ).dictionary_encode()
            # raw code -> stem code (-1 = stopword, dropped)
            scode_of_raw = np.full(len(stems), -1, dtype=np.int64)
            if kept_idx:
                scode_of_raw[np.asarray(kept_idx, dtype=np.int64)] = (
                    senc.indices.to_numpy().astype(np.int64)
                )
            stem_dict = senc.dictionary  # Arrow string array: unique stems
            code_arr = scode_of_raw[raw_codes]
        else:
            code_arr = np.empty(0, dtype=np.int64)
            stem_dict = pa.array([], type=pa.string())

        # conv -> doc base over the batch's UNIQUE conv_ids (batches
        # span few conversations; avoids an object-array searchsorted
        # per row)
        conv_col = batch.column("conv_id")
        if isinstance(conv_col, pa.ChunkedArray):
            conv_col = conv_col.combine_chunks()
        cenc = conv_col.dictionary_encode()
        u_conv = np.asarray(cenc.dictionary.to_pylist(), dtype=object)
        bases_u = self._doc_bases(u_conv)
        turn = batch.column("turn_idx").to_numpy().astype(np.int64)
        doc_ids = bases_u[cenc.indices.to_numpy().astype(np.int64)] + turn

        # doc length = kept (post-stopword) token count per turn
        keep_mask = code_arr >= 0
        parent = np.repeat(np.arange(n_rows, dtype=np.int64), reps)
        doc_lens = np.bincount(
            parent[keep_mask], minlength=n_rows
        ).astype(np.int64)
        code_arr = code_arr[keep_mask]
        doc_rep = np.repeat(doc_ids, reps)[keep_mask]

        rows_gkey: List[np.ndarray] = []
        rows_term: List[pa.Array] = []
        offsets = [0]
        flat_docs: List[np.ndarray] = []
        flat_tfs: List[np.ndarray] = []

        if len(code_arr):
            # collapse duplicate (term, doc) to tf counts: pack into a
            # single int64 key and sort VALUES (no argsort
            # indirection, no post-sort gathers) when the batch's
            # doc-id span allows it — one pass less over the pair
            # arrays than the lexsort path
            d_min = int(doc_rep.min())
            span = int(doc_rep.max()) - d_min + 1
            n_stems = len(stem_dict)
            if n_stems * span < (1 << 62):
                packed = np.sort(code_arr * span + (doc_rep - d_min))
                new = np.empty(len(packed), dtype=bool)
                new[0] = True
                new[1:] = packed[1:] != packed[:-1]
                starts = np.flatnonzero(new)
                tf = np.diff(np.append(starts, len(packed))).astype(np.int32)
                keys = packed[starts]
                u_code = keys // span
                u_doc = keys % span + d_min
            else:  # astronomically sparse id space: classic lexsort
                order = np.lexsort((doc_rep, code_arr))
                c_s, d_s = code_arr[order], doc_rep[order]
                new = np.empty(len(c_s), dtype=bool)
                new[0] = True
                new[1:] = (c_s[1:] != c_s[:-1]) | (d_s[1:] != d_s[:-1])
                starts = np.flatnonzero(new)
                tf = np.diff(np.append(starts, len(c_s))).astype(np.int32)
                u_code, u_doc = c_s[starts], d_s[starts]
            # split runs at (term, shard) boundaries
            shard = u_doc // shard_docs
            brk = np.empty(len(u_code), dtype=bool)
            brk[0] = True
            brk[1:] = (u_code[1:] != u_code[:-1]) | (shard[1:] != shard[:-1])
            r_starts = np.flatnonzero(brk)
            r_ends = np.append(r_starts[1:], len(u_code))
            run_codes = u_code[r_starts]
            # crc routing over the UNIQUE stems once, gathered per run;
            # term column stays an Arrow take (no object arrays)
            part_of_stem = _term_parts_np(stem_dict.to_pylist(), P)
            r_parts = part_of_stem[run_codes]
            r_gkey = shard[r_starts] * (P + 1) + r_parts
            rows_gkey.append(r_gkey)
            rows_term.append(stem_dict.take(pa.array(run_codes)))
            # shard-local int32 ids (base implied by gkey's shard)
            flat_docs.append((u_doc % shard_docs).astype(np.int32))
            flat_tfs.append(tf)
            offsets.extend((r_ends).tolist())

        # doc-length rows: one per (batch, doc-shard), reserved part P
        dshard = doc_ids // shard_docs
        dorder = np.argsort(doc_ids, kind="stable")
        d_sorted, l_sorted = doc_ids[dorder], doc_lens[dorder]
        ds_sorted = dshard[dorder]
        db = np.flatnonzero(
            np.concatenate(([True], ds_sorted[1:] != ds_sorted[:-1]))
        )
        d_ends = np.append(db[1:], len(d_sorted))
        last = offsets[-1]
        for s, e in zip(db, d_ends):
            rows_gkey.append(
                np.asarray([ds_sorted[s] * (self.P + 1) + self.P], dtype=np.int64)
            )
            rows_term.append(pa.array([""], type=pa.string()))
            flat_docs.append((d_sorted[s:e] % self.shard_docs).astype(np.int32))
            flat_tfs.append(l_sorted[s:e].astype(np.int32))
            last += e - s
            offsets.append(last)

        gkey = np.concatenate(rows_gkey) if rows_gkey else np.empty(0, np.int64)
        terms = (
            pa.concat_arrays(rows_term)
            if rows_term
            else pa.array([], type=pa.string())
        )
        docs_flat = (
            np.concatenate(flat_docs) if flat_docs else np.empty(0, np.int32)
        )
        tfs_flat = (
            np.concatenate(flat_tfs) if flat_tfs else np.empty(0, np.int32)
        )
        off = np.asarray(offsets, dtype=np.int32)
        return pa.Table.from_arrays(
            [
                pa.array(gkey, type=pa.int64()),
                terms,
                pa.ListArray.from_arrays(off, pa.array(docs_flat, type=pa.int32())),
                pa.ListArray.from_arrays(off, pa.array(tfs_flat, type=pa.int32())),
            ],
            schema=PAIR_SCHEMA,
        )


# ---------------------------------------------------------------------------
# reduce side: one (shard, part) group -> one segment file
# ---------------------------------------------------------------------------


def _reduce_group(
    group: pa.Table, index_dir: str, num_parts: int, fingerprint: str,
    shard_docs: int = 1 << 22,
) -> pa.Table:
    t0 = time.monotonic()
    gkey = int(group.column("gkey")[0].as_py())
    shard, part = divmod(gkey, num_parts + 1)
    base = np.int64(shard) * np.int64(shard_docs)  # locals -> absolutes
    is_doclen = part == num_parts

    lin = mf.lineage_path(index_dir, gkey)
    if os.path.exists(lin):
        try:
            with open(lin) as f:
                rec = json.load(f)
            if rec.get("fingerprint") == fingerprint:
                return _stats_row(rec)
        except (OSError, json.JSONDecodeError):
            pass

    lists_docs = group.column("doc_ids")
    lists_tfs = group.column("tfs")
    flat_docs = lists_docs.combine_chunks().flatten().to_numpy(zero_copy_only=False)
    flat_tfs = lists_tfs.combine_chunks().flatten().to_numpy(zero_copy_only=False)

    if is_doclen:
        order = np.argsort(flat_docs, kind="stable")
        d = flat_docs[order].astype(np.int64)
        d += base
        l = flat_tfs[order]
        path = os.path.join(index_dir, "doc_lens", f"shard-{shard:05d}.parquet")
        tbl = pa.Table.from_arrays(
            [pa.array(d, type=pa.int64()), pa.array(l, type=pa.int32())],
            names=["doc_id", "doc_len"],
        )
        mf.atomic_write_parquet(tbl, path)
        rec = {
            "fingerprint": fingerprint,
            "gkey": gkey,
            "kind": "doc_lens",
            "shard": shard,
            "n_docs": int(len(d)),
            "len_sum": int(flat_tfs.sum()),
            "seconds": time.monotonic() - t0,
        }
        mf.write_lineage(index_dir, gkey, rec)
        return _stats_row(rec)

    # term codes within the group, then one lexsort over all postings
    terms = group.column("term").to_pylist()
    vocab: Dict[str, int] = {}
    setd = vocab.setdefault
    row_codes = np.fromiter(
        (setd(t, len(vocab)) for t in terms), dtype=np.int64, count=len(terms)
    )
    row_lens = (
        lists_docs.combine_chunks().value_lengths().to_numpy(zero_copy_only=False)
    ).astype(np.int64)
    code_rep = np.repeat(row_codes, row_lens)
    # one-key radix sort on a composite (code, local-doc) key: local
    # ids are < shard_docs <= 2^31, so (code << 32) | local fits int64
    # for up to 2^31 terms per group; ~2x faster than the 2-key
    # lexsort and the reduce stage is the build's hottest kernel.
    if len(code_rep) and len(vocab) < (1 << 31):
        key = code_rep.view(np.uint64) << np.uint64(32)
        key |= flat_docs.astype(np.uint64)
        order = np.argsort(key, kind="stable")
    else:
        order = np.lexsort((flat_docs, code_rep))
    c_s, t_s = code_rep[order], flat_tfs[order]
    d_s = flat_docs[order].astype(np.int64)
    d_s += base  # locals -> absolute doc ids for the encoded segment
    new = np.empty(len(c_s), dtype=bool)
    if len(c_s):
        new[0] = True
        new[1:] = c_s[1:] != c_s[:-1]
    t_starts = np.flatnonzero(new)
    t_counts = np.diff(np.append(t_starts, len(c_s)))
    enc = codec.encode_grouped_postings(d_s, t_s, t_starts, t_counts)

    inv = np.empty(len(vocab), dtype=object)
    for t, c in vocab.items():
        inv[c] = t
    out_terms = inv[c_s[t_starts]] if len(c_s) else np.empty(0, object)
    # deterministic segment layout: rows sorted by term string
    t_order = np.argsort(out_terms.astype(str), kind="stable") if len(out_terms) else []
    cf = (
        np.add.reduceat(t_s.astype(np.int64), t_starts)
        if len(c_s)
        else np.empty(0, np.int64)
    )
    seg = pa.Table.from_arrays(
        [
            pa.array(out_terms[t_order], type=pa.string()),
            pa.array(t_counts[t_order], type=pa.int64()),
            pa.array(cf[t_order], type=pa.int64()),
            pa.array([enc[i][0] for i in t_order], type=pa.binary()),
            pa.array([enc[i][1] for i in t_order], type=pa.binary()),
            pa.array([enc[i][2] for i in t_order], type=pa.list_(pa.int32())),
            pa.array([enc[i][3] for i in t_order], type=pa.list_(pa.int64())),
            pa.array([enc[i][4] for i in t_order], type=pa.list_(pa.int32())),
            pa.array([enc[i][5] for i in t_order], type=pa.list_(pa.int32())),
            pa.array([enc[i][6] for i in t_order], type=pa.list_(pa.int32())),
        ],
        schema=SEGMENT_SCHEMA,
    )
    path = segment_file(index_dir, shard, part)
    mf.atomic_write_parquet(seg, path)
    rec = {
        "fingerprint": fingerprint,
        "gkey": gkey,
        "kind": "segment",
        "shard": shard,
        "part": part,
        "n_terms": int(len(t_starts)),
        "n_postings": int(len(d_s)),
        "bytes": int(os.path.getsize(path)),
        "seconds": time.monotonic() - t0,
    }
    mf.write_lineage(index_dir, gkey, rec)
    return _stats_row(rec)


def _stats_row(rec: dict) -> pa.Table:
    return pa.Table.from_pylist(
        [
            {
                "gkey": rec.get("gkey", -1),
                "kind": rec.get("kind", "?"),
                "n_terms": rec.get("n_terms", 0),
                "n_postings": rec.get("n_postings", 0),
                "n_docs": rec.get("n_docs", 0),
                "len_sum": rec.get("len_sum", 0),
                "seconds": float(rec.get("seconds", 0.0)),
            }
        ]
    )


def segment_file(index_dir: str, shard: int, part: int) -> str:
    return os.path.join(
        index_dir, "segments", f"seg-{shard:05d}-{part:04d}.parquet"
    )


# ---------------------------------------------------------------------------
# direct shuffle: map-side hash partition + per-bucket reduce tasks
# ---------------------------------------------------------------------------
#
# gkey = shard*(P+1)+part is a STATIC function of (term, doc_id) known
# at map time, so the term exchange needs no comparison sort at all:
# each fused read+tokenize+partition task returns one object per
# reduce BUCKET (gkey % n_buckets), and each reduce task concatenates
# its bucket across all map tasks and runs the unchanged per-gkey
# encode. vs the Dataset sort-shuffle this drops the map-side sort,
# the shuffle scheduler, and two streaming-executor startups — the
# measured worst-scaling stage of the build (per-stage efficiency 0.52
# at 4->16 cpus vs 0.72 for the bandwidth-bound tokenize itself).
# Segments are byte-identical either way: _reduce_group lexsorts each
# group over globally unique (term, doc) pairs, so routing order
# cannot change the output.


def _plan_map_units(
    files: List[str], target_tasks: int
) -> Optional[List[List[Tuple[str, int]]]]:
    """Split path sources into ~target_tasks row-group unit lists,
    balanced by row count (row groups are the read granularity; a
    source whose files lack row-group structure falls back to the
    Dataset path)."""
    units: List[Tuple[str, int, int]] = []  # (file, rg, rows)
    for f in files:
        try:
            md = pq.ParquetFile(f).metadata
        except OSError:
            return None
        for rg in range(md.num_row_groups):
            units.append((f, rg, md.row_group(rg).num_rows))
    if not units:
        return None
    total = sum(u[2] for u in units)
    per_task = max(1, total // max(1, target_tasks))
    plans: List[List[Tuple[str, int]]] = []
    cur: List[Tuple[str, int]] = []
    acc = 0
    for f, rg, rows in units:
        cur.append((f, rg))
        acc += rows
        if acc >= per_task:
            plans.append(cur)
            cur, acc = [], 0
    if cur:
        plans.append(cur)
    return plans


def _tokenize_partition_task(
    units: List[Tuple[str, int]],
    cfg_json,
    conv_map_ref_boxed,
    num_parts: int,
    shard_docs: int,
    batch_size: int,
    n_buckets: int,
):
    """Fused map side: read own row groups (column-pruned), tokenize
    via the per-worker-cached _TokenizePartials, hash-partition the
    partial postings by reduce bucket. Returns ``n_buckets`` tables
    (Ray ``num_returns``), so each reduce task fetches exactly its
    slice — no sort, no full-block rereads.

    ``conv_map_ref_boxed`` is ``[ObjectRef]``: boxing stops Ray from
    auto-dereferencing the broadcast ref at the task boundary, so the
    worker cache can ray.get it once per process (zero-copy plasma
    read) instead of every task shipping the whole conv map."""
    fn = tokenize_partials_fn(
        cfg_json, conv_map_ref_boxed[0], num_parts, shard_docs
    )
    parts: List[pa.Table] = []
    for f, rg in units:
        tbl = pq.ParquetFile(f).read_row_group(
            rg, columns=["conv_id", "turn_idx", "text"]
        )
        for i in range(0, tbl.num_rows, batch_size):
            parts.append(fn(tbl.slice(i, batch_size)))
    out = pa.concat_tables(parts) if parts else PAIR_SCHEMA.empty_table()
    # sort by (bucket, gkey): every bucket slice arrives at its reduce
    # task already gkey-sorted, so the reduce gathers each gkey's rows
    # with two searchsorted calls per input — no whole-bucket
    # argsort/take/copy on the reduce side
    gk = out.column("gkey").to_numpy()
    bk = gk % n_buckets
    order = np.lexsort((gk, bk))
    srt = out.take(order)
    if n_buckets == 1:
        return srt
    bk_s = bk[order]
    bounds = np.searchsorted(bk_s, np.arange(n_buckets + 1))
    return tuple(
        srt.slice(bounds[b], bounds[b + 1] - bounds[b])
        for b in range(n_buckets)
    )


def _reduce_bucket(
    index_dir: str,
    num_parts: int,
    fingerprint: str,
    shard_docs: int,
    *tables: pa.Table,
) -> pa.Table:
    """Reduce side of the direct shuffle: one task per bucket, running
    the unchanged per-gkey encode (_reduce_group) for every gkey in
    its bucket."""
    live = [t for t in tables if t.num_rows]
    if not live:
        return _stats_row({}).slice(0, 0)
    # each input slice is gkey-sorted by its map task: gather one
    # gkey's rows with searchsorted + zero-copy slices instead of
    # concat+argsort+take over the whole bucket (saves two full copies
    # and a sort of the bucket's postings — the encode kernel
    # canonicalizes per-group row order anyway)
    gks = [t.column("gkey").to_numpy() for t in live]
    uniq = np.unique(np.concatenate([g[np.concatenate(([True], g[1:] != g[:-1]))] if len(g) else g for g in gks]))
    stats = []
    for g in uniq:
        parts = []
        for t, gk in zip(live, gks):
            lo = np.searchsorted(gk, g, side="left")
            hi = np.searchsorted(gk, g, side="right")
            if hi > lo:
                parts.append(t.slice(lo, hi - lo))
        stats.append(
            _reduce_group(
                pa.concat_tables(parts),
                index_dir=index_dir,
                num_parts=num_parts,
                fingerprint=fingerprint,
                shard_docs=shard_docs,
            )
        )
    return pa.concat_tables(stats)


def _run_direct_shuffle(
    plans: List[List[Tuple[str, int]]],
    index_dir: str,
    cfg: SparseConfig,
    conv_map_ref,
    num_parts: int,
    shard_docs: int,
    batch_size: int,
    fingerprint: str,
    n_shards: int,
    offsets_table_ref=None,
    index_dir_to_wipe_on_invalid: Optional[str] = None,
) -> Tuple[pa.Table, float, float, Optional[Tuple[pa.Table, int, float]]]:
    """Drive the direct shuffle; returns (stats, t_map, t_reduce,
    overlapped_offsets). With ``offsets_table_ref`` set (overlapped
    build), the driver fetches the merged offsets table between
    submitting the shuffle and waiting on it; a validation failure in
    the merge task cancels the in-flight shuffle and wipes the index
    dir (partial segments from invalid input must not survive for a
    later resume)."""
    import ray

    n_groups = n_shards * (num_parts + 1)
    n_buckets = int(
        os.environ.get("GRAFT_REDUCE_BUCKETS", "0")
    ) or min(n_groups, 128)
    map_task = ray.remote(num_cpus=1, num_returns=n_buckets)(
        _tokenize_partition_task
    )
    cfg_json = cfg.to_json()
    t0 = time.monotonic()
    map_refs = [
        map_task.remote(
            u, cfg_json, [conv_map_ref], num_parts, shard_docs,
            batch_size, n_buckets,
        )
        for u in plans
    ]
    if n_buckets == 1:
        map_refs = [[r] for r in map_refs]
    # submit the reduces NOW: every reduce depends on every map's
    # bucket, so they stay pending until the map phase completes and
    # then fire straight from Ray's scheduler — no driver round-trip
    # between the phases
    # num_cpus=1: interleaved A/B on the 6.6M-turn input measured the
    # reduce wall HALVING with full reducer concurrency (16 cpus: 20.0s
    # vs 44.5s; 32 cpus: 14.7s vs 23.5s) at identical core-seconds —
    # the encode kernel shows no memory-bandwidth inflation on this
    # path (the num_cpus=2 mitigation measured on the Dataset
    # map_groups fallback does not transfer: direct-path reduces fetch
    # pre-partitioned slices instead of re-reading sorted blocks)
    reduce_cpus = int(os.environ.get("GRAFT_REDUCE_CPUS", "0")) or 1
    reduce_task = ray.remote(num_cpus=reduce_cpus)(_reduce_bucket)
    stats_refs = [
        reduce_task.remote(
            index_dir, num_parts, fingerprint, shard_docs,
            *[map_refs[m][b] for m in range(len(map_refs))],
        )
        for b in range(n_buckets)
    ]
    got = None
    if offsets_table_ref is not None:
        # overlapped offsets: fetch (and thereby validate) the merged
        # table while the map wave runs
        _t_wait = time.monotonic()
        try:
            conv_offsets, doc_count = ray.get(offsets_table_ref)
        except ray.exceptions.RayTaskError as e:
            for refs in map_refs:
                for r in refs:
                    ray.cancel(r, force=True)
            for r in stats_refs:
                ray.cancel(r, force=True)
            if index_dir_to_wipe_on_invalid:
                # reduces may already have written segments computed
                # from never-validated doc_ids; none may survive for a
                # later resume
                ray.wait(stats_refs, num_returns=len(stats_refs), timeout=30)
                shutil.rmtree(index_dir_to_wipe_on_invalid, ignore_errors=True)
            cause = e.as_instanceof_cause()
            raise cause if isinstance(cause, ValueError) else e from None
        got = (conv_offsets, doc_count, time.monotonic() - _t_wait)
    # per-stage walls: waiting on maps loses no overlap (see above)
    flat = [r for refs in map_refs for r in refs]
    ray.wait(flat, num_returns=len(flat), fetch_local=False)
    t_map = time.monotonic() - t0
    t0 = time.monotonic()
    stats = pa.concat_tables(ray.get(stats_refs))
    t_reduce = time.monotonic() - t0
    if stats.num_rows == 0:
        raise ValueError("empty input dataset")
    return stats, t_map, t_reduce, got


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------


def build_index(
    source,
    index_dir: str,
    cfg: Optional[SparseConfig] = None,
    *,
    num_parts: Optional[int] = None,
    shard_docs: int = 1 << 22,
    tokenize_concurrency: Optional[int] = None,
    batch_size: int = 4096,
    resume: bool = True,
    source_token: Optional[str] = None,
) -> mf.IndexManifest:
    """Build an index directory from transcript parquet.

    ``source`` is a path/list of paths (read with column pruning) or a
    ray.data.Dataset with (conv_id, turn_idx, text). Dataset sources
    have no stable content identity for the resume fingerprint, so
    pass ``source_token`` (any caller-chosen content tag) to enable
    resume; without one, resume is disabled (full rebuild) so stale
    lineage from a different Dataset's contents can never be reused.
    """
    import ray
    import ray.data

    _t_begin = time.monotonic()
    cfg = cfg or SparseConfig()
    assert shard_docs <= (1 << 31), "shard-local ids are int32"
    if isinstance(source, (str, list)):
        input_desc = source
    elif source_token is not None:
        input_desc = f"<dataset:{source_token}>"
    else:
        input_desc = "<dataset>"
        resume = False
    est3 = None
    if isinstance(source, (str, list)):
        # ONE metadata size estimate, shared by the num_parts formula
        # and the block budget below (round 1 fetched it twice).
        # Local-path sources read parquet footers directly —
        # uncompressed row-group sizes, same quantity Ray's
        # size_bytes() reports, without a Dataset metadata pass.
        files_est = _list_parquet_files(source)
        if files_est is not None and len(files_est) <= 4096:
            want = {"conv_id", "turn_idx", "text"}
            try:
                est3 = 0
                for f in files_est:
                    md = pq.ParquetFile(f).metadata
                    for rg in range(md.num_row_groups):
                        g = md.row_group(rg)
                        est3 += sum(
                            g.column(c).total_uncompressed_size
                            for c in range(g.num_columns)
                            if g.column(c).path_in_schema.split(".")[0] in want
                        )
            except OSError:
                est3 = None
        if est3 is None:
            est3 = ray.data.read_parquet(
                source, columns=["conv_id", "turn_idx", "text"]
            ).size_bytes()
    if num_parts is None:
        # auto-size term-hash parts to ~2.5M postings per reduce
        # group: big groups anti-scale (allocation/bandwidth storms
        # — measured 36.7s -> 7.5s reduce wall going 32 -> 128 parts
        # on 520M tokens), tiny groups waste per-task overhead.
        if est3 is not None:
            est_tokens = max(1, int(est3) // 7)  # ~7 bytes/token (round-1 calibration; keys add <5%)
            num_parts = int(min(1024, max(16, est_tokens // 2_500_000)))
        else:
            num_parts = 32
    fingerprint = mf.build_fingerprint(
        input_desc, cfg.to_json(), num_parts, shard_docs
    )

    # stale-build guard: a directory built under a different
    # fingerprint is wiped (its segments would pollute the terms table)
    marker = os.path.join(index_dir, "build.json")
    if os.path.exists(marker):
        try:
            with open(marker) as f:
                prev = json.load(f).get("fingerprint")
        except (OSError, json.JSONDecodeError):
            prev = None
        if prev != fingerprint or not resume:
            shutil.rmtree(index_dir)
    elif os.path.exists(index_dir) and not resume:
        shutil.rmtree(index_dir)
    for sub in ("segments", "doc_lens", "lineage", "id_map", "terms"):
        os.makedirs(os.path.join(index_dir, sub), exist_ok=True)
    mf.atomic_write_text(marker, json.dumps({"fingerprint": fingerprint}))

    # Block budget: the sort-shuffle creates O(map_blocks x
    # reduce_blocks) transfer objects, and Ray's default parquet
    # splitting over-fragments small-file inputs (measured 3-5MB
    # blocks -> 2.7x slower shuffle). Target ~4 blocks per core with
    # a ~256MB-per-block ceiling so the same formula holds when the
    # input is 100TB on a big cluster.
    plans = None
    if isinstance(source, (str, list)):
        # cluster-size-independent plan: same partitioning at N and 4N
        block_floor = int(os.environ.get("GRAFT_BLOCK_FLOOR", "64"))
        target_blocks = max(block_floor, int(est3 // (256 << 20)) + 1)
        files = _list_parquet_files(source)
        if (
            files is not None
            and len(files) <= 4096
            and not os.environ.get("GRAFT_FORCE_DATASET_SHUFFLE")
        ):
            plans = _plan_map_units(files, target_blocks)
            if plans is not None and len(plans) > 4096:
                # map_tasks x reduce_buckets bounds the object count
                # (<= 4096 x 128 ~ 500k); past that the Dataset
                # sort-shuffle's hierarchical merge is the right tool
                plans = None
        ds = None
        if plans is None:
            ds = ray.data.read_parquet(
                source,
                columns=["conv_id", "turn_idx", "text"],
                override_num_blocks=target_blocks,
            )
        # offsets pass: path source -> direct per-file tasks reading
        # only the two key columns (no Dataset-executor startup)
        ds_keys = source
    else:
        ds = source.select_columns(["conv_id", "turn_idx", "text"])
        ds_keys = source.select_columns(["conv_id", "turn_idx"])

    _t_stage = time.monotonic()
    t_plan = _t_stage - _t_begin
    offsets_table_ref = None
    # conv-map mode: past the broadcast limit (conversations bounded
    # above by turns; ~400 bytes/turn from the size estimate), the
    # whole-map gather + ray.put would hit the driver/object-size wall,
    # so the map goes bucketed (compute_conv_offsets_sharded).
    conv_mode = os.environ.get("GRAFT_CONV_MAP", "auto")
    conv_limit = int(os.environ.get("GRAFT_CONV_BROADCAST_LIMIT", str(100_000_000)))
    est_turns = (int(est3) // 400) if est3 is not None else None
    use_sharded_conv = conv_mode == "sharded" or (
        conv_mode == "auto" and est_turns is not None and est_turns > conv_limit
    )
    if use_sharded_conv:
        single = os.path.join(index_dir, "id_map", "conv_offsets.parquet")
        if os.path.exists(single):  # other-mode leftover from a resume
            os.remove(single)
        conv_map_ref, doc_count = compute_conv_offsets_sharded(
            source if plans is not None else ds_keys, index_dir
        )
        conv_offsets = None
        t_offsets = time.monotonic() - _t_stage
        t_idmap = 0.0
    elif plans is not None and files is not None:
        # OVERLAPPED offsets (direct path): submit the per-unit offset
        # partials and their merge as Ray tasks and DON'T wait — the
        # tokenize map tasks read + tokenize first and block on the
        # merged (conv_ids, bases) object only at their first
        # partial-aggregation step, so the whole offsets pass hides
        # under the map wave. The driver fetches the offsets TABLE
        # (validation happens in the merge task) after submitting the
        # shuffle; t_offsets below records only the non-overlapped
        # residual wait.
        ncpu_off = int(ray.cluster_resources().get("CPU", 1))
        chunks = _plan_offset_units(files, n_tasks=max(len(files), 2 * ncpu_off))
        ptask = ray.remote(num_cpus=1)(_offsets_partial_from_units)
        mtask = ray.remote(num_cpus=1, num_returns=2)(_merge_offsets_task)
        offsets_table_ref, conv_map_ref = mtask.remote(
            *[ptask.remote(c) for c in chunks]
        )
        conv_offsets = doc_count = None
        t_offsets = time.monotonic() - _t_stage  # submit cost only here
        t_idmap = 0.0
    else:
        conv_offsets, doc_count = compute_conv_offsets(ds_keys)
        t_offsets = time.monotonic() - _t_stage
        _t_stage = time.monotonic()
        id_map_dir = os.path.join(index_dir, "id_map")
        for f in os.listdir(id_map_dir):  # sharded leftovers from a resume
            if f.startswith("conv_offsets-"):
                os.remove(os.path.join(id_map_dir, f))
        mf.atomic_write_parquet(
            conv_offsets, os.path.join(index_dir, "id_map", "conv_offsets.parquet")
        )
        conv_map_ref = ray.put(
            (
                np.asarray(conv_offsets.column("conv_id").to_pylist(), dtype=object),
                conv_offsets.column("base").to_numpy(),
            )
        )
        t_idmap = time.monotonic() - _t_stage

    if plans is not None:
        # Direct shuffle (local-path sources): fused read+tokenize+
        # hash-partition map tasks feeding per-bucket reduce tasks —
        # no comparison sort, no shuffle scheduler, no Dataset
        # executor startups. See the direct-shuffle section above.
        if offsets_table_ref is not None:
            # bucket count from the size estimate (doc_count not yet
            # known): only feeds reduce-task granularity — empty
            # buckets reduce to empty stats, and segment bytes are
            # independent of bucketing
            est_docs = max(1, int(est3) // 400) if est3 else 1
            n_shards_hint = (est_docs + shard_docs - 1) // shard_docs
        else:
            n_shards_hint = (doc_count + shard_docs - 1) // shard_docs or 1
        stats, t_tokenize, t_shuffle_reduce, got = _run_direct_shuffle(
            plans, index_dir, cfg, conv_map_ref, num_parts, shard_docs,
            batch_size, fingerprint,
            offsets_table_ref=offsets_table_ref,
            index_dir_to_wipe_on_invalid=index_dir,
            n_shards=n_shards_hint,
        )
        if got is not None:
            conv_offsets, doc_count, _t_waited = got
            t_offsets += _t_waited
            _t_stage = time.monotonic()
            id_map_dir = os.path.join(index_dir, "id_map")
            for f in os.listdir(id_map_dir):  # sharded leftovers
                if f.startswith("conv_offsets-"):
                    os.remove(os.path.join(id_map_dir, f))
            mf.atomic_write_parquet(
                conv_offsets,
                os.path.join(index_dir, "id_map", "conv_offsets.parquet"),
            )
            t_idmap = time.monotonic() - _t_stage
    else:
        # Dataset sort-shuffle fallback: Dataset sources (no stable
        # file list to plan map units over) and >4k-file inputs.
        #
        # Task pool (not a dedicated actor pool): stage state is
        # rebuilt lazily per worker process via a module cache, so the
        # stage rides Ray's shared warm workers; tokenize_concurrency
        # caps it only if explicitly requested.
        # The explicit materialize() is deliberate: the sort-based
        # shuffle materializes its map outputs in the object store
        # regardless, but letting the tokenize stage fuse into the
        # shuffle's map tasks schedules pathologically here (measured
        # 37-53s vs 17s staged on 1.65M turns) — the barrier costs
        # nothing extra and pins the fast plan. Spilling still bounds
        # memory at scale.
        _t_stage = time.monotonic()
        pairs = ds.map_batches(
            tokenize_partials_fn(
                cfg.to_json(), conv_map_ref, num_parts, shard_docs
            ),
            batch_format="pyarrow",
            batch_size=batch_size,
            **(
                {"concurrency": tokenize_concurrency}
                if tokenize_concurrency
                else {}
            ),
        ).materialize()
        t_tokenize = time.monotonic() - _t_stage

        # num_cpus=2 halves reducer concurrency: the encode kernel is
        # memory-bandwidth/allocation bound, and >cpus/2 concurrent
        # reducers inflate per-task time ~5x (measured 69.5 -> 13.7
        # core-s on a 32-core box). Wall time improves ~1.4x.
        stats_ds = pairs.groupby("gkey").map_groups(
            _reduce_group,
            fn_kwargs=dict(
                index_dir=index_dir, num_parts=num_parts,
                fingerprint=fingerprint, shard_docs=shard_docs,
            ),
            batch_format="pyarrow",
            num_cpus=2,
        )
        _t_stage = time.monotonic()
        stats = pa.Table.from_batches(_gather(stats_ds))
        t_shuffle_reduce = time.monotonic() - _t_stage

    _t_stage = time.monotonic()
    kinds = np.asarray(stats.column("kind").to_pylist())
    n_docs_written = int(stats.column("n_docs").to_numpy()[kinds == "doc_lens"].sum())
    len_sum = int(stats.column("len_sum").to_numpy()[kinds == "doc_lens"].sum())
    n_postings = int(stats.column("n_postings").to_numpy().sum())
    assert n_docs_written == doc_count, (n_docs_written, doc_count)

    # global term stats (+ min_df pruning), written AFTER pruning so the
    # terms table is exactly the query-time vocabulary
    # (reference build_inverted_index.py:35-41: pruning precedes
    # doc_lens; adjustment below replicates that coupling).
    #
    # No shuffle needed: term-hash parts partition the vocabulary, so
    # global df/cf for a term only needs a merge ACROSS SHARDS WITHIN
    # ITS PART — one parallel task per part, each writing
    # terms/part-PPPP.parquet. Driver memory stays bounded by one
    # part's vocabulary slice.
    seg_files = sorted(
        os.path.join(index_dir, "segments", f)
        for f in os.listdir(os.path.join(index_dir, "segments"))
        if f.endswith(".parquet")
    )
    n_terms = 0
    if seg_files:
        by_part: Dict[int, List[str]] = {}
        for f in seg_files:
            part = int(os.path.basename(f)[:-len(".parquet")].split("-")[2])
            by_part.setdefault(part, []).append(f)
        # batch parts into ~2 tasks per CPU: per-part tasks are tiny
        # (2 file reads + one write) and scheduling 100s of them costs
        # more than the work
        items = [
            (files, os.path.join(index_dir, "terms", f"part-{p:04d}.parquet"))
            for p, files in sorted(by_part.items())
        ]
        n_tasks = max(
            1, min(len(items), 2 * int(ray.cluster_resources().get("CPU", 4)))
        )
        merge = ray.remote(_merge_part_terms_many)
        chunks = np.array_split(np.arange(len(items)), n_tasks)
        results_nested = ray.get(
            [
                merge.remote([items[i] for i in sel], cfg.min_df)
                for sel in chunks
                if len(sel)
            ]
        )
        results = [r for rs in results_nested for r in rs]
        n_terms = sum(r[0] for r in results)
        pruned_parts = [r[1] for r in results if r[1] is not None]
        if cfg.min_df > 1 and pruned_parts:
            pruned_tbl = pa.concat_tables(pruned_parts)
            len_sum -= _apply_min_df_pruning(
                index_dir, seg_files, pruned_tbl, cfg.min_df
            )

    avg_doc_len = float(np.float32(len_sum / doc_count)) if doc_count else 0.0
    man = mf.IndexManifest(
        doc_count=doc_count,
        num_parts=num_parts,
        salt_docs=shard_docs,
        avg_doc_len=avg_doc_len,
        n_terms=n_terms,
        n_postings=n_postings,
        config=cfg.to_json(),
        fingerprint=fingerprint,
        stats={
            "len_sum": len_sum,
            "n_groups": stats.num_rows,
            "reduce_seconds": float(stats.column("seconds").to_numpy().sum()),
            # per-stage wall clock, for scaling-efficiency profiling
            "wall_offsets": round(t_offsets, 3),
            "wall_tokenize": round(t_tokenize, 3),
            "wall_shuffle_reduce": round(t_shuffle_reduce, 3),
            # driver-side residual stages (scaling-efficiency profiling)
            "wall_plan": round(t_plan, 3),
            "wall_idmap": round(t_idmap, 3),
            "wall_terms": round(time.monotonic() - _t_stage, 3),
            "wall_total": round(time.monotonic() - _t_begin, 3),
        },
    )
    man.save(index_dir)
    return man


def _merge_part_terms_many(
    items: List[Tuple[List[str], str]], min_df: int
) -> List[Tuple[int, Optional[pa.Table]]]:
    """Run _merge_part_terms for a batch of parts in one task."""
    return [_merge_part_terms(files, out, min_df) for files, out in items]


def _merge_part_terms(files: List[str], out_path: str, min_df: int):
    """Merge one term-hash part's (term, df, cf) across its shard
    segments; write the retained vocabulary slice sorted by term.
    Returns (n_terms_retained, pruned_terms_table_or_None)."""
    import pyarrow.parquet as _pq

    tbl = pa.concat_tables(
        [_pq.read_table(f, columns=["term", "df", "cf"]) for f in files]
    )
    if len(files) > 1:
        # sum df/cf across shards (vectorized run-length merge)
        tbl = tbl.sort_by("term")
        terms = np.asarray(tbl.column("term").to_pylist(), dtype=object)
        df_ = tbl.column("df").to_numpy()
        cf_ = tbl.column("cf").to_numpy()
        new = np.empty(len(terms), dtype=bool)
        if len(terms):
            new[0] = True
            new[1:] = terms[1:] != terms[:-1]
        starts = np.flatnonzero(new)
        tbl = pa.Table.from_arrays(
            [
                pa.array(terms[starts], type=pa.string()),
                pa.array(np.add.reduceat(df_, starts) if len(starts) else df_),
                pa.array(np.add.reduceat(cf_, starts) if len(starts) else cf_),
            ],
            names=["term", "df", "cf"],
        )
    else:
        tbl = tbl.sort_by("term")
    pruned = None
    if min_df > 1:
        import pyarrow.compute as pc

        keep = pc.greater_equal(tbl.column("df"), min_df)
        pruned = tbl.filter(pc.invert(keep)).select(["term"])
        tbl = tbl.filter(keep)
    mf.atomic_write_parquet(tbl, out_path)
    return tbl.num_rows, pruned


def _collect_pruned_mass(
    f: str, pruned: frozenset
) -> Tuple[int, np.ndarray, np.ndarray]:
    """Per-segment task body: decode postings of pruned terms in one
    segment file, return (shard, doc_ids, tf_mass) aggregated per doc.
    Pruned terms have global df < min_df, so the returned arrays are
    tiny."""
    t = pq.read_table(f, columns=["term", "doc_bytes", "tf_bytes", "counts"])
    terms = t.column("term").to_pylist()
    hit = [i for i, term in enumerate(terms) if term in pruned]
    shard = int(os.path.basename(f).split("-")[1])
    if not hit:
        return shard, np.empty(0, np.int64), np.empty(0, np.int64)
    all_d, all_f = [], []
    for i in hit:
        d_ids, tfs = codec.decode_postings(
            t.column("doc_bytes")[i].as_py(),
            t.column("tf_bytes")[i].as_py(),
            np.asarray(t.column("counts")[i].as_py(), dtype=np.int64),
        )
        all_d.append(d_ids.astype(np.int64))
        all_f.append(tfs.astype(np.int64))
    d = np.concatenate(all_d)
    fmass = np.concatenate(all_f)
    uniq, inv = np.unique(d, return_inverse=True)
    agg = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(agg, inv, fmass)
    return shard, uniq, agg


def _apply_shard_doc_len_adjust(
    index_dir: str, shard: int, docs: np.ndarray, subs: np.ndarray
) -> int:
    """Per-shard task body: subtract pruned tf mass from one shard's
    doc_lens file (vectorized searchsorted scatter)."""
    path = os.path.join(index_dir, "doc_lens", f"shard-{shard:05d}.parquet")
    t = pq.read_table(path)
    d = t.column("doc_id").to_numpy()
    l = t.column("doc_len").to_numpy().copy()
    idx = np.searchsorted(d, docs)
    np.subtract.at(l, idx, subs.astype(l.dtype))
    mf.atomic_write_parquet(
        pa.Table.from_arrays(
            [pa.array(d, type=pa.int64()), pa.array(l, type=pa.int32())],
            names=["doc_id", "doc_len"],
        ),
        path,
    )
    return int(subs.sum())


def _apply_min_df_pruning(
    index_dir: str, seg_files: List[str], pruned_tbl: pa.Table, min_df: int
) -> int:
    """min_df > 1: doc_lens must count only retained terms (reference
    build_inverted_index.py:35-63 — pruning happens BEFORE doc_lens).
    Parallelized: one Ray task per segment file collects the pruned tf
    mass; one task per shard applies the adjustment. The pruned term
    set is broadcast once via ray.put (tiny by construction — every
    member has global df < min_df; a trillion-doc build would
    bucket-join instead). Returns the total subtracted mass."""
    import ray

    pruned = frozenset(pruned_tbl.column("term").to_pylist())
    if not pruned:
        return 0
    pruned_ref = ray.put(pruned)
    collect = ray.remote(num_cpus=1)(_collect_pruned_mass)
    parts = ray.get([collect.remote(f, pruned_ref) for f in seg_files])
    adjust: Dict[int, Dict[int, int]] = {}
    for shard, docs, subs in parts:
        sub = adjust.setdefault(shard, {})
        for doc, s in zip(docs.tolist(), subs.tolist()):
            sub[doc] = sub.get(doc, 0) + s
    apply_task = ray.remote(num_cpus=1)(_apply_shard_doc_len_adjust)
    totals = ray.get(
        [
            apply_task.remote(
                index_dir,
                shard,
                np.asarray(sorted(sub), dtype=np.int64),
                np.asarray([sub[k] for k in sorted(sub)], dtype=np.int64),
            )
            for shard, sub in adjust.items()
        ]
    )
    return int(sum(totals))
