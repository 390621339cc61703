"""Offline index merge — Lucene-style segment append.

``merge_indexes(dir_a, dir_b, out_dir)`` combines two complete
indexes whose document ranges are DISJOINT AND ORDERED (every conv_id
of B sorts strictly after every conv_id of A, so merged enumeration
order is "all of A, then all of B" and B's doc ids shift by
A.doc_count). This is the incremental-ingest primitive the reference
lacks entirely (its only update path is a full rebuild,
reference retriv/sparse_retriever/sparse_retriever.py:176-226): index
a new day's partition as its own small index, then merge.

Byte-identity contract (tested): the merged ``segments/``,
``doc_lens/``, ``terms/`` and ``id_map/`` files are byte-identical to
a from-scratch build over the concatenated input. This falls out of
reusing the build's own canonical writers:

- A-shards strictly below the boundary shard are untouched by new doc
  ids -> their segment / doc_lens files are COPIED verbatim.
- The boundary shard (A's last, where B's first docs land when
  A.doc_count % shard_docs != 0) and every B shard are DECODED back
  to (gkey, term, local-doc, tf) partial rows — the exact
  PAIR_SCHEMA the build's reduce consumes — rebased by +A.doc_count,
  re-bucketed by the merged doc-range shards, and re-encoded by the
  unchanged :func:`retriv_ray.index.build._reduce_group` (canonical
  per-group lexsort -> segment bytes independent of input routing).
- ``terms/`` files re-merge from the merged segment files with the
  build's own :func:`_merge_part_terms`.

Cost profile: O(|B| + one A shard) decode+encode work, parallelized
per (shard, part) group as plain Ray tasks — appending a day to a
year never touches the year's segments (except one boundary shard).

Restrictions (validated, loud): identical SparseConfig, num_parts and
shard_docs; ``min_df == 1`` (a global-df prune is NOT incrementally
mergeable: a term pruned in A may cross the threshold after the merge,
and its postings are gone — re-run the full build when min_df > 1).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from typing import Dict, List, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from retriv_ray.index import codec
from retriv_ray.index import manifest as mf
from retriv_ray.index.build import (
    PAIR_SCHEMA,
    _merge_part_terms,
    _reduce_group,
    segment_file,
)


def _load_manifest(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "manifest.json")) as f:
        return json.load(f)


def _decode_segment_rows(
    path: str, offset: int, shard_docs: int, part: int, num_parts: int
) -> pa.Table:
    """One encoded segment file -> PAIR_SCHEMA partial rows with doc
    ids shifted by ``offset`` and re-bucketed into merged (shard,
    part) gkeys (a row per (term, merged-shard) run)."""
    if not os.path.exists(path):
        return PAIR_SCHEMA.empty_table()
    t = pq.read_table(
        path, columns=["term", "doc_bytes", "tf_bytes", "counts"]
    )
    terms = t.column("term").to_pylist()
    g_terms: List[str] = []
    g_gkey: List[int] = []
    offsets = [0]
    docs_parts: List[np.ndarray] = []
    tfs_parts: List[np.ndarray] = []
    last = 0
    for i in range(t.num_rows):
        docs, tfs = codec.decode_postings(
            t.column("doc_bytes")[i].as_py(),
            t.column("tf_bytes")[i].as_py(),
            np.asarray(t.column("counts")[i].as_py(), dtype=np.int64),
        )
        docs = docs.astype(np.int64) + offset
        shard = docs // shard_docs
        brk = np.flatnonzero(
            np.concatenate(([True], shard[1:] != shard[:-1]))
        )
        ends = np.append(brk[1:], len(docs))
        for s, e in zip(brk, ends):
            g_terms.append(terms[i])
            g_gkey.append(int(shard[s]) * (num_parts + 1) + part)
            docs_parts.append((docs[s:e] - shard[s] * shard_docs).astype(np.int32))
            tfs_parts.append(tfs[s:e].astype(np.int32))
            last += e - s
            offsets.append(last)
    if not g_terms:
        return PAIR_SCHEMA.empty_table()
    off = pa.array(np.asarray(offsets, dtype=np.int32))
    return pa.Table.from_arrays(
        [
            pa.array(g_gkey, type=pa.int64()),
            pa.array(g_terms, type=pa.string()),
            pa.ListArray.from_arrays(
                off, pa.array(np.concatenate(docs_parts), type=pa.int32())
            ),
            pa.ListArray.from_arrays(
                off, pa.array(np.concatenate(tfs_parts), type=pa.int32())
            ),
        ],
        schema=PAIR_SCHEMA,
    )


def _doclen_rows(
    path: str, offset: int, shard_docs: int, num_parts: int
) -> pa.Table:
    """One doc_lens shard file -> PAIR_SCHEMA doc-length rows (term
    '', reserved part index) rebased by ``offset``."""
    if not os.path.exists(path):
        return PAIR_SCHEMA.empty_table()
    t = pq.read_table(path)
    docs = t.column("doc_id").to_numpy().astype(np.int64) + offset
    lens = t.column("doc_len").to_numpy().astype(np.int32)
    shard = docs // shard_docs
    brk = np.flatnonzero(np.concatenate(([True], shard[1:] != shard[:-1])))
    ends = np.append(brk[1:], len(docs))
    offsets = [0]
    g_gkey, docs_parts, lens_parts = [], [], []
    last = 0
    for s, e in zip(brk, ends):
        g_gkey.append(int(shard[s]) * (num_parts + 1) + num_parts)
        docs_parts.append((docs[s:e] - shard[s] * shard_docs).astype(np.int32))
        lens_parts.append(lens[s:e])
        last += e - s
        offsets.append(last)
    off = pa.array(np.asarray(offsets, dtype=np.int32))
    return pa.Table.from_arrays(
        [
            pa.array(g_gkey, type=pa.int64()),
            pa.array([""] * len(g_gkey), type=pa.string()),
            pa.ListArray.from_arrays(
                off, pa.array(np.concatenate(docs_parts), type=pa.int32())
            ),
            pa.ListArray.from_arrays(
                off, pa.array(np.concatenate(lens_parts), type=pa.int32())
            ),
        ],
        schema=PAIR_SCHEMA,
    )


def _merge_part_task(
    out_dir: str,
    num_parts: int,
    shard_docs: int,
    fingerprint: str,
    part: int,
    sources: List[Tuple[str, int]],
) -> List[dict]:
    """Re-encode every affected (shard, part) group of one term part
    (or the doc-lens part when ``part == num_parts``): each source
    file decodes ONCE, rows group by merged gkey, and the build's
    canonical reduce writes each group."""
    rows = []
    for path, offset in sources:
        tbl = (
            _doclen_rows(path, offset, shard_docs, num_parts)
            if part == num_parts
            else _decode_segment_rows(path, offset, shard_docs, part, num_parts)
        )
        if tbl.num_rows:
            rows.append(tbl)
    if not rows:
        return []
    all_rows = pa.concat_tables(rows)
    gk = all_rows.column("gkey").to_numpy()
    order = np.argsort(gk, kind="stable")
    srt = all_rows.take(pa.array(order, type=pa.int64()))
    gk_s = gk[order]
    uniq = np.unique(gk_s)
    out = []
    for g in uniq:
        lo = np.searchsorted(gk_s, g, side="left")
        hi = np.searchsorted(gk_s, g, side="right")
        out.append(
            _reduce_group(
                srt.slice(lo, hi - lo),
                index_dir=out_dir,
                num_parts=num_parts,
                fingerprint=fingerprint,
                shard_docs=shard_docs,
            )
        )
    return [t.to_pylist()[0] for t in out]


def _id_map_slices(d: str):
    """(paths, is_single_layout) of an index dir's id_map parquet(s)."""
    base = os.path.join(d, "id_map")
    single = os.path.join(base, "conv_offsets.parquet")
    if os.path.exists(single):
        return [single], True
    parts = sorted(
        f
        for f in os.listdir(base)
        if f.startswith("conv_offsets-") and f.endswith(".parquet")
    )
    if not parts:
        raise FileNotFoundError(single)
    return [os.path.join(base, f) for f in parts], False


def _edge_conv(path: str, last: bool):
    t = pq.read_table(path, columns=["conv_id"])
    if t.num_rows == 0:
        return None
    return t.column("conv_id")[-1 if last else 0].as_py()


def _rebase_offsets_slice(path: str, offset: int, out_path: str) -> None:
    t = pq.read_table(path)
    t = t.set_column(
        t.schema.get_field_index("base"),
        "base",
        pc.add(t.column("base"), pa.scalar(offset, type=pa.int64())),
    )
    mf.atomic_write_parquet(t, out_path)


def _merge_conv_offsets(dir_a: str, dir_b: str, out_dir: str, offset: int, label: str) -> bool:
    """Merge the two inputs' id_maps into ``out_dir`` (B's bases shift
    by ``offset``), validating B's conv range sorts strictly after
    A's. Single+single layout: the original driver concat into one
    parquet (bounded by the broadcast limit by construction, and
    byte-identical to a from-scratch build). Any sharded side: A's
    slices copy verbatim and B's rebase (+offset) in per-slice Ray
    tasks — past the broadcast limit the per-conversation map never
    materializes whole on the driver or any worker, matching the
    sharded build path. Returns True when the output id_map is the
    slice layout."""
    import ray

    sl_a, single_a = _id_map_slices(dir_a)
    sl_b, single_b = _id_map_slices(dir_b)
    last_a = _edge_conv(sl_a[-1], last=True)
    first_b = _edge_conv(sl_b[0], last=False)
    if last_a is None or first_b is None:
        raise ValueError(f"{label}: empty input index")
    if not str(last_a) < str(first_b):
        raise ValueError(
            f"{label}: B's conv_ids must sort strictly after A's "
            "(enumeration order must be 'A then B')"
        )
    os.makedirs(os.path.join(out_dir, "id_map"), exist_ok=True)
    if single_a and single_b:
        ca, cb = pq.read_table(sl_a[0]), pq.read_table(sl_b[0])
        merged_conv = pa.Table.from_arrays(
            [
                pa.concat_arrays(
                    [
                        ca.column("conv_id").combine_chunks(),
                        cb.column("conv_id").combine_chunks(),
                    ]
                ),
                pa.array(
                    np.concatenate(
                        [
                            ca.column("base").to_numpy(),
                            cb.column("base").to_numpy() + offset,
                        ]
                    ),
                    type=pa.int64(),
                ),
                pa.concat_arrays(
                    [
                        ca.column("n_turns").combine_chunks(),
                        cb.column("n_turns").combine_chunks(),
                    ]
                ),
            ],
            names=["conv_id", "base", "n_turns"],
        )
        mf.atomic_write_parquet(
            merged_conv, os.path.join(out_dir, "id_map", "conv_offsets.parquet")
        )
        return False
    task = ray.remote(num_cpus=1)(_rebase_offsets_slice)
    i, refs = 0, []
    for p in sl_a:
        shutil.copyfile(
            p,
            os.path.join(out_dir, "id_map", f"conv_offsets-{i:05d}.parquet"),
        )
        i += 1
    for p in sl_b:
        refs.append(
            task.remote(
                p,
                offset,
                os.path.join(out_dir, "id_map", f"conv_offsets-{i:05d}.parquet"),
            )
        )
        i += 1
    ray.get(refs)
    return True


def merge_indexes(dir_a: str, dir_b: str, out_dir: str) -> dict:
    """Merge two complete, config-identical, range-ordered indexes
    into ``out_dir``; returns the merged manifest."""
    import ray

    t0 = time.monotonic()
    ma, mb = _load_manifest(dir_a), _load_manifest(dir_b)
    if ma["config"] != mb["config"]:
        raise ValueError("merge_indexes: configs differ")
    if (ma["num_parts"], ma["salt_docs"]) != (mb["num_parts"], mb["salt_docs"]):
        raise ValueError("merge_indexes: layout (num_parts/shard_docs) differs")
    if ma["config"].get("min_df", 1) != 1:
        raise NotImplementedError(
            "merge_indexes requires min_df == 1: global-df pruning is not "
            "incrementally mergeable (pruned postings are unrecoverable)"
        )
    if not (ma.get("complete") and mb.get("complete")):
        raise ValueError("merge_indexes: both inputs must be complete")
    P = ma["num_parts"]
    S = ma["salt_docs"]
    offset = ma["doc_count"]
    doc_count = offset + mb["doc_count"]

    # conv offsets: validate range order, concat/copy, rebase B
    # (slice-aware: sharded-layout inputs merge slice-by-slice in Ray
    # tasks without driver materialization)
    _merge_conv_offsets(dir_a, dir_b, out_dir, offset, "merge_indexes")

    boundary = offset // S  # first merged shard that receives B docs
    n_shards_a = (offset + S - 1) // S
    n_shards_out = (doc_count + S - 1) // S
    fingerprint = hashlib.sha1(
        f"merge:{ma['fingerprint']}+{mb['fingerprint']}".encode()
    ).hexdigest()

    # 1) copy untouched A groups verbatim (shards strictly below the
    #    boundary hold only A docs and keep their exact doc ids)
    for sub in ("segments", "doc_lens", "lineage", "terms"):
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)
    for shard in range(min(boundary, n_shards_a)):
        for part in range(P):
            src = segment_file(dir_a, shard, part)
            if os.path.exists(src):
                shutil.copyfile(src, segment_file(out_dir, shard, part))
        dl = os.path.join(dir_a, "doc_lens", f"shard-{shard:05d}.parquet")
        if os.path.exists(dl):
            shutil.copyfile(
                dl, os.path.join(out_dir, "doc_lens", f"shard-{shard:05d}.parquet")
            )

    # 2) re-encode affected groups: boundary shard of A + all B shards
    n_shards_b = (mb["doc_count"] + S - 1) // S
    sources_by_part: Dict[int, List[Tuple[str, int]]] = {}
    for part in range(P):
        srcs = []
        if boundary < n_shards_a:
            srcs.append((segment_file(dir_a, boundary, part), 0))
        for sb in range(n_shards_b):
            srcs.append((segment_file(dir_b, sb, part), offset))
        sources_by_part[part] = srcs
    dl_sources: List[Tuple[str, int]] = []
    if boundary < n_shards_a:
        dl_sources.append(
            (os.path.join(dir_a, "doc_lens", f"shard-{boundary:05d}.parquet"), 0)
        )
    for sb in range(n_shards_b):
        dl_sources.append(
            (os.path.join(dir_b, "doc_lens", f"shard-{sb:05d}.parquet"), offset)
        )

    task = ray.remote(num_cpus=1)(_merge_part_task)
    refs = [
        task.remote(out_dir, P, S, fingerprint, part, sources_by_part[part])
        for part in range(P)
    ]
    refs.append(task.remote(out_dir, P, S, fingerprint, P, dl_sources))
    stats = [s for chunk in ray.get(refs) for s in chunk]

    # 3) terms files: the build's own per-part merge over the merged
    #    segment files (byte-identical writer)
    os.makedirs(os.path.join(out_dir, "terms"), exist_ok=True)
    n_terms = 0
    for part in range(P):
        files = [
            segment_file(out_dir, shard, part)
            for shard in range(n_shards_out)
            if os.path.exists(segment_file(out_dir, shard, part))
        ]
        out_path = os.path.join(out_dir, "terms", f"part-{part:04d}.parquet")
        if files:  # partless parts write no file, like the build
            n, _pruned = _merge_part_terms(files, out_path, min_df=1)
            n_terms += n

    len_sum = int(ma["stats"]["len_sum"]) + int(mb["stats"]["len_sum"])
    man = mf.IndexManifest(
        doc_count=doc_count,
        num_parts=P,
        salt_docs=S,
        avg_doc_len=float(np.float32(len_sum / doc_count)) if doc_count else 0.0,
        n_terms=n_terms,
        n_postings=int(ma["n_postings"]) + int(mb["n_postings"]),
        config=ma["config"],
        fingerprint=fingerprint,
        complete=True,
        stats={
            "len_sum": len_sum,
            "n_groups": len(stats),
            "merged_from": [ma["fingerprint"], mb["fingerprint"]],
            "wall_total": round(time.monotonic() - t0, 3),
        },
        version=ma.get("version", mf.MANIFEST_VERSION),
    )
    with open(os.path.join(out_dir, "build.json"), "w") as f:
        json.dump({"fingerprint": fingerprint}, f)
    man.save(out_dir)
    return dataclasses_asdict(man)


def dataclasses_asdict(man) -> dict:
    import dataclasses

    return dataclasses.asdict(man)


# ---------------------------------------------------------------------------
# positional index merge (same contract as merge_indexes)
# ---------------------------------------------------------------------------


def _decode_pos_rows(
    path: str, shard_src: int, offset: int, shard_docs: int, part: int,
    num_parts: int,
):
    """One positional segment -> POS_PAIR_SCHEMA rows rebased by
    ``offset`` and re-bucketed into merged gkeys (= shard * P + part;
    positional gkeys have no reserved doc-lens part)."""
    from retriv_ray.index.positional import POS_PAIR_SCHEMA

    if not os.path.exists(path):
        return POS_PAIR_SCHEMA.empty_table()
    t = pq.read_table(path)
    terms = t.column("term").to_pylist()
    g_terms, g_gkey = [], []
    doc_offs = [0]
    pos_offs = [0]
    docs_parts, npos_parts, pos_parts = [], [], []
    d_last = p_last = 0
    for i in range(t.num_rows):
        dd = codec.varint_decode(t.column("doc_bytes")[i].as_py()).astype(np.int64)
        docs = np.cumsum(dd) + shard_src * shard_docs + offset
        nps = np.asarray(t.column("npos")[i].as_py(), dtype=np.int64)
        pd = codec.varint_decode(t.column("pos_bytes")[i].as_py()).astype(np.int64)
        if len(pd):
            starts = np.concatenate(([0], np.cumsum(nps)[:-1]))
            c = np.cumsum(pd)
            base = np.zeros(len(nps), dtype=np.int64)
            base[1:] = c[starts[1:] - 1]
            pos = c - np.repeat(base, nps)
        else:
            pos = pd
        shard = docs // shard_docs
        brk = np.flatnonzero(np.concatenate(([True], shard[1:] != shard[:-1])))
        ends = np.append(brk[1:], len(docs))
        p_off = np.concatenate(([0], np.cumsum(nps)))
        for s, e in zip(brk, ends):
            g_terms.append(terms[i])
            g_gkey.append(int(shard[s]) * num_parts + part)
            docs_parts.append((docs[s:e] - shard[s] * shard_docs).astype(np.int32))
            npos_parts.append(nps[s:e].astype(np.int32))
            pos_parts.append(pos[p_off[s] : p_off[e]].astype(np.int32))
            d_last += e - s
            p_last += int(p_off[e] - p_off[s])
            doc_offs.append(d_last)
            pos_offs.append(p_last)
    from retriv_ray.index.positional import POS_PAIR_SCHEMA as _S

    if not g_terms:
        return _S.empty_table()
    do = pa.array(np.asarray(doc_offs, dtype=np.int32))
    po = pa.array(np.asarray(pos_offs, dtype=np.int32))
    return pa.Table.from_arrays(
        [
            pa.array(g_gkey, type=pa.int64()),
            pa.array(g_terms, type=pa.string()),
            pa.ListArray.from_arrays(
                do, pa.array(np.concatenate(docs_parts), type=pa.int32())
            ),
            pa.ListArray.from_arrays(
                do, pa.array(np.concatenate(npos_parts), type=pa.int32())
            ),
            pa.ListArray.from_arrays(
                po, pa.array(np.concatenate(pos_parts), type=pa.int32())
            ),
        ],
        schema=_S,
    )


def _merge_pos_part_task(
    dir_a: str,
    dir_b: str,
    out_dir: str,
    num_parts: int,
    shard_docs: int,
    part: int,
    boundary: int,
    n_shards_a: int,
    n_shards_b: int,
    offset: int,
) -> List[dict]:
    from retriv_ray.index.positional import _encode_pos_group, pos_segment_file

    rows = []
    if boundary < n_shards_a:
        t = _decode_pos_rows(
            pos_segment_file(dir_a, boundary, part), boundary, 0,
            shard_docs, part, num_parts,
        )
        if t.num_rows:
            rows.append(t)
    for sb in range(n_shards_b):
        t = _decode_pos_rows(
            pos_segment_file(dir_b, sb, part), sb, offset,
            shard_docs, part, num_parts,
        )
        if t.num_rows:
            rows.append(t)
    if not rows:
        return []
    all_rows = pa.concat_tables(rows)
    gk = all_rows.column("gkey").to_numpy()
    order = np.argsort(gk, kind="stable")
    srt = all_rows.take(pa.array(order, type=pa.int64()))
    gk_s = gk[order]
    out = []
    for g in np.unique(gk_s):
        lo = np.searchsorted(gk_s, g, side="left")
        hi = np.searchsorted(gk_s, g, side="right")
        out.append(
            _encode_pos_group(srt.slice(lo, hi - lo), out_dir, num_parts)
        )
    return out


def merge_positional_indexes(dir_a: str, dir_b: str, out_dir: str) -> dict:
    """Segment-append merge for POSITIONAL indexes — same contract and
    byte-identity guarantee as :func:`merge_indexes`: B's conv range
    sorts after A's; shards untouched by new ids copy verbatim; the
    boundary shard and all of B decode, rebase by +A.doc_count, and
    re-encode through the canonical positional encode."""
    import ray
    from retriv_ray.index.positional import pos_segment_file

    t0 = time.monotonic()
    with open(os.path.join(dir_a, "pos_manifest.json")) as f:
        ma = json.load(f)
    with open(os.path.join(dir_b, "pos_manifest.json")) as f:
        mb = json.load(f)
    if ma["config"] != mb["config"]:
        raise ValueError("merge_positional_indexes: configs differ")
    if (ma["num_parts"], ma["shard_docs"]) != (mb["num_parts"], mb["shard_docs"]):
        raise ValueError("merge_positional_indexes: layout differs")
    P, S = ma["num_parts"], ma["shard_docs"]
    offset = ma["doc_count"]
    doc_count = offset + mb["doc_count"]

    # each side's id_map may live in the index it reused offsets from
    # (manifest conv_offsets_dir, positional.py) rather than locally
    sliced = _merge_conv_offsets(
        ma.get("conv_offsets_dir") or dir_a,
        mb.get("conv_offsets_dir") or dir_b,
        out_dir,
        offset,
        "merge_positional_indexes",
    )
    os.makedirs(os.path.join(out_dir, "segments"), exist_ok=True)

    boundary = offset // S
    n_shards_a = max(1, (offset + S - 1) // S)
    n_shards_b = max(1, (mb["doc_count"] + S - 1) // S)
    for shard in range(min(boundary, n_shards_a)):
        for part in range(P):
            src = pos_segment_file(dir_a, shard, part)
            if os.path.exists(src):
                shutil.copyfile(src, pos_segment_file(out_dir, shard, part))

    task = ray.remote(num_cpus=1)(_merge_pos_part_task)
    refs = [
        task.remote(
            dir_a, dir_b, out_dir, P, S, part, boundary,
            n_shards_a, n_shards_b, offset,
        )
        for part in range(P)
    ]
    stats = [s for chunk in ray.get(refs) for s in chunk]

    # n_terms convention matches the build: sum of per-(shard, part)
    # term-row counts (copied files counted via parquet metadata)
    n_terms = sum(s["n_terms"] for s in stats)
    for shard in range(min(boundary, n_shards_a)):
        for part in range(P):
            p_ = pos_segment_file(out_dir, shard, part)
            if os.path.exists(p_):
                n_terms += pq.ParquetFile(p_).metadata.num_rows
    manifest = dict(ma)
    manifest.update(
        doc_count=int(doc_count),
        n_shards=int(max(1, (doc_count + S - 1) // S)),
        n_terms=int(n_terms),
        n_postings=int(ma["n_postings"]) + int(mb["n_postings"]),
        n_positions=int(ma["n_positions"]) + int(mb["n_positions"]),
        # the merged id_map lives in out_dir (slice layout when either
        # input was sharded); never inherit A's conv_offsets_dir
        conv_offsets_dir=out_dir if sliced else None,
        wall_sec=round(time.monotonic() - t0, 3),
    )
    with open(os.path.join(out_dir, "pos_manifest.json"), "w") as f:
        json.dump(manifest, f)
    return manifest
