"""Conversation-level deletion: tombstones + compaction.

The reference's only deletion is ``rm -rf`` of the whole index
(reference retriv/base_retriever.py:20-26, S8) — removing documents
means a full rebuild. Here deletion is the standard two-phase engine
mechanism:

1. :func:`delete_conversations` appends conv_ids to a tombstone file —
   an O(deleted) metadata write. Serving masks tombstoned doc-id
   ranges at score time (``exclude_ranges`` in the kernels: scores
   zero before top-k, and the strict >0 admission drops them — no
   posting list is touched, so deletion is immediately visible and
   costs one range-zero per query).
2. :func:`compact_index` rewrites the index without the tombstoned
   conversations, renumbering the surviving docs to the dense
   enumeration a from-scratch build over the survivors would assign —
   and the output is BYTE-IDENTICAL to that rebuild (tested): decode
   segments -> drop deleted ranges -> remap ids by a searchsorted
   prefix-sum of deleted spans -> re-encode through the build's
   canonical reduce, exactly the merge_indexes machinery.

Scale: tombstone masking is O(ranges) per query (ranges = deleted
conversations, coalesced). Compaction decodes/re-encodes every
segment once — the full-rewrite cost is inherent (ids renumber), but
it parallelizes per (shard, part) group like the build's own reduce
and never gathers postings to the driver. min_df must be 1 (global-df
pruning is not replayable after deletion — same restriction as
merge_indexes).
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from typing import Iterable, List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from retriv_ray.index import manifest as mf
from retriv_ray.index.build import (
    PAIR_SCHEMA,
    _merge_part_terms,
    _reduce_group,
    segment_file,
)
from retriv_ray.index import codec

TOMBSTONE_FILE = ("tombstones", "convs.parquet")


def _tombstone_path(index_dir: str) -> str:
    return os.path.join(index_dir, *TOMBSTONE_FILE)


def delete_conversations(index_dir: str, conv_ids: Iterable[str]) -> int:
    """Append conv_ids to the index's tombstone set (idempotent,
    sorted, deduplicated). Returns the total tombstone count."""
    new = {str(c) for c in conv_ids}
    path = _tombstone_path(index_dir)
    if os.path.exists(path):
        new.update(pq.read_table(path).column("conv_id").to_pylist())
    os.makedirs(os.path.dirname(path), exist_ok=True)
    mf.atomic_write_parquet(
        pa.table({"conv_id": pa.array(sorted(new), type=pa.string())}), path
    )
    return len(new)


def read_tombstones(index_dir: str) -> List[str]:
    path = _tombstone_path(index_dir)
    if not os.path.exists(path):
        return []
    return pq.read_table(path).column("conv_id").to_pylist()


def deleted_doc_ranges(
    index_dir: str,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Tombstoned conv_ids -> sorted, coalesced [start, end) global
    doc-id ranges, or None when no tombstones exist. Unknown conv_ids
    are ignored (deleting an absent conversation is a no-op)."""
    convs = read_tombstones(index_dir)
    if not convs:
        return None
    t = pq.read_table(os.path.join(index_dir, "id_map", "conv_offsets.parquet"))
    all_convs = np.asarray(t.column("conv_id").to_pylist(), dtype=object)
    bases = t.column("base").to_numpy()
    n_turns = t.column("n_turns").to_numpy()
    want = np.asarray(sorted(convs), dtype=object)
    pos_full = np.searchsorted(all_convs, want)
    ok = (pos_full < len(all_convs)) & (
        all_convs[np.minimum(pos_full, len(all_convs) - 1)] == want
    )
    pos = pos_full[ok]
    if len(pos) == 0:
        return None
    starts = bases[pos]
    ends = starts + n_turns[pos]
    # coalesce adjacent ranges (pos sorted because want sorted on the
    # same key order as all_convs)
    keep = np.concatenate(([True], starts[1:] != ends[:-1]))
    idx = np.flatnonzero(keep)
    starts_c = starts[idx]
    ends_c = ends[np.append(idx[1:] - 1, len(ends) - 1)]
    return starts_c.astype(np.int64), ends_c.astype(np.int64)


# ---------------------------------------------------------------------------
# compaction
# ---------------------------------------------------------------------------


def _remap(
    docs: np.ndarray, starts: np.ndarray, ends: np.ndarray, cum: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """(keep_mask, new_ids) for global doc ids under deleted ranges.
    ``cum[i]`` = total deleted length in ranges 0..i."""
    idx = np.searchsorted(starts, docs, side="right") - 1
    in_range = (idx >= 0) & (docs < ends[np.maximum(idx, 0)])
    shift = np.where(idx >= 0, cum[np.maximum(idx, 0)], 0)
    return ~in_range, docs - shift


def _compact_part_task(
    src_dir: str,
    out_dir: str,
    num_parts: int,
    shard_docs: int,
    fingerprint: str,
    part: int,
    n_shards_src: int,
    starts: np.ndarray,
    ends: np.ndarray,
    cum: np.ndarray,
) -> List[dict]:
    """Decode one term part (or the doc-lens part when part ==
    num_parts) across all source shards, drop deleted docs, remap ids,
    re-reduce canonically into out_dir."""
    rows_g, rows_t, offs = [], [], [0]
    docs_parts, tfs_parts = [], []
    last = 0

    def emit(term: str, docs: np.ndarray, tfs: np.ndarray) -> None:
        nonlocal last
        keep, new = _remap(docs, starts, ends, cum)
        docs_k, tfs_k = new[keep], tfs[keep]
        if not len(docs_k):
            return
        shard = docs_k // shard_docs
        brk = np.flatnonzero(np.concatenate(([True], shard[1:] != shard[:-1])))
        bends = np.append(brk[1:], len(docs_k))
        for s, e in zip(brk, bends):
            rows_g.append(int(shard[s]) * (num_parts + 1) + part)
            rows_t.append(term)
            docs_parts.append(
                (docs_k[s:e] - shard[s] * shard_docs).astype(np.int32)
            )
            tfs_parts.append(tfs_k[s:e].astype(np.int32))
            last += e - s
            offs.append(last)

    for shard in range(n_shards_src):
        if part == num_parts:
            path = os.path.join(src_dir, "doc_lens", f"shard-{shard:05d}.parquet")
            if not os.path.exists(path):
                continue
            t = pq.read_table(path)
            emit(
                "",
                t.column("doc_id").to_numpy().astype(np.int64),
                t.column("doc_len").to_numpy().astype(np.int64),
            )
        else:
            path = segment_file(src_dir, shard, part)
            if not os.path.exists(path):
                continue
            t = pq.read_table(
                path, columns=["term", "doc_bytes", "tf_bytes", "counts"]
            )
            terms = t.column("term").to_pylist()
            for i in range(t.num_rows):
                docs, tfs = codec.decode_postings(
                    t.column("doc_bytes")[i].as_py(),
                    t.column("tf_bytes")[i].as_py(),
                    np.asarray(t.column("counts")[i].as_py(), dtype=np.int64),
                )
                emit(terms[i], docs.astype(np.int64), tfs.astype(np.int64))
    if not rows_t:
        return []
    off = pa.array(np.asarray(offs, dtype=np.int32))
    tbl = pa.Table.from_arrays(
        [
            pa.array(rows_g, type=pa.int64()),
            pa.array(rows_t, type=pa.string()),
            pa.ListArray.from_arrays(
                off, pa.array(np.concatenate(docs_parts), type=pa.int32())
            ),
            pa.ListArray.from_arrays(
                off, pa.array(np.concatenate(tfs_parts), type=pa.int32())
            ),
        ],
        schema=PAIR_SCHEMA,
    )
    gk = tbl.column("gkey").to_numpy()
    order = np.argsort(gk, kind="stable")
    srt = tbl.take(pa.array(order, type=pa.int64()))
    gk_s = gk[order]
    out = []
    for g in np.unique(gk_s):
        lo = np.searchsorted(gk_s, g, side="left")
        hi = np.searchsorted(gk_s, g, side="right")
        rec = _reduce_group(
            srt.slice(lo, hi - lo),
            index_dir=out_dir,
            num_parts=num_parts,
            fingerprint=fingerprint,
            shard_docs=shard_docs,
        )
        out.append(rec.to_pylist()[0])
    return out


def compact_index(src_dir: str, out_dir: str) -> dict:
    """Rewrite ``src_dir`` without its tombstoned conversations into
    ``out_dir``; byte-identical to a from-scratch build over the
    surviving documents. Returns the new manifest dict."""
    import ray

    t0 = time.monotonic()
    with open(os.path.join(src_dir, "manifest.json")) as f:
        man = json.load(f)
    if man["config"].get("min_df", 1) != 1:
        raise NotImplementedError(
            "compact_index requires min_df == 1 (global-df pruning is "
            "not replayable after deletion)"
        )
    P, S = man["num_parts"], man["salt_docs"]
    ranges = deleted_doc_ranges(src_dir)
    conv = pq.read_table(os.path.join(src_dir, "id_map", "conv_offsets.parquet"))
    tomb = set(read_tombstones(src_dir))
    if ranges is None:
        raise ValueError("compact_index: no tombstones to compact")
    starts, ends = ranges
    cum = np.cumsum(ends - starts)

    # surviving conv offsets, renumbered
    convs = np.asarray(conv.column("conv_id").to_pylist(), dtype=object)
    n_turns = conv.column("n_turns").to_numpy()
    keep = np.asarray([c not in tomb for c in convs], dtype=bool)
    s_convs = convs[keep]
    s_turns = n_turns[keep]
    s_bases = np.concatenate(([0], np.cumsum(s_turns)[:-1])).astype(np.int64)
    doc_count = int(s_turns.sum())
    os.makedirs(os.path.join(out_dir, "id_map"), exist_ok=True)
    for sub in ("segments", "doc_lens", "lineage", "terms"):
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)
    mf.atomic_write_parquet(
        pa.Table.from_arrays(
            [
                pa.array(s_convs, type=pa.string()),
                pa.array(s_bases, type=pa.int64()),
                pa.array(s_turns.astype(np.int64), type=pa.int64()),
            ],
            names=["conv_id", "base", "n_turns"],
        ),
        os.path.join(out_dir, "id_map", "conv_offsets.parquet"),
    )

    fingerprint = hashlib.sha1(
        f"compact:{man['fingerprint']}:{sorted(tomb)}".encode()
    ).hexdigest()
    n_shards_src = (man["doc_count"] + S - 1) // S
    task = ray.remote(num_cpus=1)(_compact_part_task)
    refs = [
        task.remote(
            src_dir, out_dir, P, S, fingerprint, part, n_shards_src,
            starts, ends, cum,
        )
        for part in range(P + 1)
    ]
    stats = [s for chunk in ray.get(refs) for s in chunk]
    len_sum = sum(s["len_sum"] for s in stats if s["kind"] == "doc_lens")
    n_postings = sum(s["n_postings"] for s in stats if s["kind"] == "segment")

    n_shards_out = (doc_count + S - 1) // S if doc_count else 1
    n_terms = 0
    for part in range(P):
        files = [
            segment_file(out_dir, shard, part)
            for shard in range(n_shards_out)
            if os.path.exists(segment_file(out_dir, shard, part))
        ]
        out_path = os.path.join(out_dir, "terms", f"part-{part:04d}.parquet")
        if files:  # partless parts write no file, like the build
            n, _ = _merge_part_terms(files, out_path, min_df=1)
            n_terms += n

    out_man = mf.IndexManifest(
        doc_count=doc_count,
        num_parts=P,
        salt_docs=S,
        avg_doc_len=float(np.float32(len_sum / doc_count)) if doc_count else 0.0,
        n_terms=n_terms,
        n_postings=int(n_postings),
        config=man["config"],
        fingerprint=fingerprint,
        complete=True,
        stats={
            "len_sum": int(len_sum),
            "n_groups": len(stats),
            "compacted_from": man["fingerprint"],
            "n_deleted_convs": len(tomb),
            "wall_total": round(time.monotonic() - t0, 3),
        },
        version=man.get("version", mf.MANIFEST_VERSION),
    )
    with open(os.path.join(out_dir, "build.json"), "w") as f:
        json.dump({"fingerprint": fingerprint}, f)
    out_man.save(out_dir)
    import dataclasses

    return dataclasses.asdict(out_man)


# ---------------------------------------------------------------------------
# positional compaction
# ---------------------------------------------------------------------------


def _compact_pos_part_task(
    src_dir: str,
    out_dir: str,
    num_parts: int,
    shard_docs: int,
    part: int,
    n_shards_src: int,
    starts: np.ndarray,
    ends: np.ndarray,
    cum: np.ndarray,
) -> List[dict]:
    """Positional twin of :func:`_compact_part_task`: decode one term
    part across all source shards, drop deleted docs (their position
    lists go with them), remap ids, re-encode canonically."""
    from retriv_ray.index.positional import (
        POS_PAIR_SCHEMA,
        _encode_pos_group,
        pos_segment_file,
    )

    rows_g, rows_t = [], []
    doc_offs, pos_offs = [0], [0]
    docs_parts, npos_parts, pos_parts = [], [], []
    d_last = p_last = 0
    for shard in range(n_shards_src):
        path = pos_segment_file(src_dir, shard, part)
        if not os.path.exists(path):
            continue
        t = pq.read_table(path)
        terms = t.column("term").to_pylist()
        for i in range(t.num_rows):
            dd = codec.varint_decode(
                t.column("doc_bytes")[i].as_py()
            ).astype(np.int64)
            docs = np.cumsum(dd) + shard * shard_docs
            nps = np.asarray(t.column("npos")[i].as_py(), dtype=np.int64)
            pd = codec.varint_decode(
                t.column("pos_bytes")[i].as_py()
            ).astype(np.int64)
            if len(pd):
                st = np.concatenate(([0], np.cumsum(nps)[:-1]))
                c = np.cumsum(pd)
                base = np.zeros(len(nps), dtype=np.int64)
                base[1:] = c[st[1:] - 1]
                pos = c - np.repeat(base, nps)
            else:
                pos = pd
            keep, new = _remap(docs, starts, ends, cum)
            if not keep.any():
                continue
            docs_k, nps_k = new[keep], nps[keep]
            p_off = np.concatenate(([0], np.cumsum(nps)))
            k_idx = np.flatnonzero(keep)
            g_excl = np.concatenate(([0], np.cumsum(nps_k)[:-1]))
            tot = int(nps_k.sum())
            pos_k = pos[
                np.repeat(p_off[k_idx], nps_k)
                + (np.arange(tot) - np.repeat(g_excl, nps_k))
            ]
            new_shard = docs_k // shard_docs
            brk = np.flatnonzero(
                np.concatenate(([True], new_shard[1:] != new_shard[:-1]))
            )
            bends = np.append(brk[1:], len(docs_k))
            kp_off = np.concatenate(([0], np.cumsum(nps_k)))
            for s, e in zip(brk, bends):
                rows_g.append(int(new_shard[s]) * num_parts + part)
                rows_t.append(terms[i])
                docs_parts.append(
                    (docs_k[s:e] - new_shard[s] * shard_docs).astype(np.int32)
                )
                npos_parts.append(nps_k[s:e].astype(np.int32))
                pos_parts.append(pos_k[kp_off[s] : kp_off[e]].astype(np.int32))
                d_last += e - s
                p_last += int(kp_off[e] - kp_off[s])
                doc_offs.append(d_last)
                pos_offs.append(p_last)
    if not rows_t:
        return []
    do = pa.array(np.asarray(doc_offs, dtype=np.int32))
    po = pa.array(np.asarray(pos_offs, dtype=np.int32))
    tbl = pa.Table.from_arrays(
        [
            pa.array(rows_g, type=pa.int64()),
            pa.array(rows_t, type=pa.string()),
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
        schema=POS_PAIR_SCHEMA,
    )
    gk = tbl.column("gkey").to_numpy()
    order = np.argsort(gk, kind="stable")
    srt = tbl.take(pa.array(order, type=pa.int64()))
    gk_s = gk[order]
    out = []
    for g in np.unique(gk_s):
        lo = np.searchsorted(gk_s, g, side="left")
        hi = np.searchsorted(gk_s, g, side="right")
        out.append(_encode_pos_group(srt.slice(lo, hi - lo), out_dir, num_parts))
    return out


def compact_positional_index(src_dir: str, out_dir: str) -> dict:
    """Rewrite a positional index without its tombstoned conversations;
    byte-identical to a from-scratch positional build over the
    survivors (same contract as :func:`compact_index`)."""
    import ray

    t0 = time.monotonic()
    with open(os.path.join(src_dir, "pos_manifest.json")) as f:
        man = json.load(f)
    P, S = man["num_parts"], man["shard_docs"]
    ranges = deleted_doc_ranges(src_dir)
    if ranges is None:
        raise ValueError("compact_positional_index: no tombstones to compact")
    starts, ends = ranges
    cum = np.cumsum(ends - starts)
    tomb = set(read_tombstones(src_dir))
    conv = pq.read_table(os.path.join(src_dir, "id_map", "conv_offsets.parquet"))
    convs = np.asarray(conv.column("conv_id").to_pylist(), dtype=object)
    n_turns = conv.column("n_turns").to_numpy()
    keep = np.asarray([c not in tomb for c in convs], dtype=bool)
    s_convs, s_turns = convs[keep], n_turns[keep]
    s_bases = np.concatenate(([0], np.cumsum(s_turns)[:-1])).astype(np.int64)
    doc_count = int(s_turns.sum())
    os.makedirs(os.path.join(out_dir, "id_map"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "segments"), exist_ok=True)
    mf.atomic_write_parquet(
        pa.Table.from_arrays(
            [
                pa.array(s_convs, type=pa.string()),
                pa.array(s_bases, type=pa.int64()),
                pa.array(s_turns.astype(np.int64), type=pa.int64()),
            ],
            names=["conv_id", "base", "n_turns"],
        ),
        os.path.join(out_dir, "id_map", "conv_offsets.parquet"),
    )
    n_shards_src = man["n_shards"]
    task = ray.remote(num_cpus=1)(_compact_pos_part_task)
    refs = [
        task.remote(
            src_dir, out_dir, P, S, part, n_shards_src, starts, ends, cum
        )
        for part in range(P)
    ]
    stats = [s for chunk in ray.get(refs) for s in chunk]
    out_man = dict(man)
    out_man.update(
        doc_count=doc_count,
        n_shards=int(max(1, (doc_count + S - 1) // S)),
        n_terms=int(sum(s["n_terms"] for s in stats)),
        n_postings=int(sum(s["n_postings"] for s in stats)),
        n_positions=int(sum(s["n_positions"] for s in stats)),
        wall_sec=round(time.monotonic() - t0, 3),
    )
    with open(os.path.join(out_dir, "pos_manifest.json"), "w") as f:
        json.dump(out_man, f)
    return out_man
