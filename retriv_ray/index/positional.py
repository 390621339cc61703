"""Positional inverted index: phrase and proximity search.

The reference engine stores only (doc_id, tf) postings
(reference retriv/sparse_retriever/build_inverted_index.py:9-26) and
therefore cannot answer phrase ("terms adjacent, in order") or
proximity ("terms within a window") queries. This module adds the
classic positional-postings layout as a sibling index product, built
with the SAME distributed shape as the main build
(:mod:`retriv_ray.index.build`): fused read+tokenize+hash-partition
map tasks (``num_returns`` = reduce buckets, worker-to-worker fetch,
no comparison sort) feeding per-bucket reduce tasks that each encode
and write their (doc-shard, term-part) segment files.

Layout per (shard, part) segment row (one row per term):

    term      : string
    df        : int64   — docs containing the term in this shard
    doc_bytes : binary  — ascending SHARD-LOCAL doc ids, first
                absolute + varint deltas (codec.varint_*)
    npos      : list<int32> — positions per doc (aligned with docs)
    pos_bytes : binary  — per-doc position streams, concatenated;
                within each doc: first absolute + varint deltas

Positions index into the POST-pipeline token stream (after stopword
removal / stemming the surviving tokens are renumbered 0..n-1 —
the Lucene default analyzer behavior with positionIncrement folded
to 1). With the SQL-comparable config (whitespace tokenizer, no
stemmer/stopwords) positions equal raw whitespace-token offsets,
which is what the DuckDB oracle computes.

Scale notes (10^12 turns):
- The exchange volume is one (term, doc, positions) row group per
  (term, doc) — proportional to corpus tokens, the floor for any
  positional index. Doc-range sharding (``shard_docs``) bounds every
  reduce group exactly like the main build: a hot term's postings
  split across shards, so no reduce task ever holds a full hot-term
  posting list.
- conv-id -> doc-id assignment reuses the main build's machinery
  with the SAME mode policy as build_index: broadcast below
  GRAFT_CONV_BROADCAST_LIMIT conversations, the bucketed
  ``compute_conv_offsets_sharded`` map-side hash join above it (or
  with GRAFT_CONV_MAP=sharded), consumed through the shared
  :class:`~retriv_ray.index.build.ConvMapResolver`. Reusing a sharded
  main build's offsets (``conv_offsets_source=``) lifts its id_map
  slices into the object store task-side
  (:func:`sharded_handle_from_slices`) — the per-conversation map
  never touches the driver on either path.
- Query cost: a phrase/proximity query decodes only its terms' rows
  from the parts they hash to (part routing identical to the BM25
  searcher) and intersects ascending doc arrays; the positional
  verify is vectorized over (doc, position) int64 keys.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from retriv_ray.config import SparseConfig
from retriv_ray.index import codec
from retriv_ray.index.build import (
    ConvMapResolver,
    _list_parquet_files,
    _plan_map_units,
    _term_parts_np,
    compute_conv_offsets,
    compute_conv_offsets_sharded,
    read_conv_offsets,
    sharded_handle_from_slices,
)
from retriv_ray.search.kernel import intersect_sorted_multi
from retriv_ray.text.pipeline import TextPreprocessor

POS_PAIR_SCHEMA = pa.schema(
    [
        ("gkey", pa.int64()),
        ("term", pa.string()),
        ("doc_ids", pa.list_(pa.int32())),
        ("npos", pa.list_(pa.int32())),
        ("positions", pa.list_(pa.int32())),
    ]
)

_WORKER_STATE: dict = {}


def pos_segment_file(index_dir: str, shard: int, part: int) -> str:
    return os.path.join(
        index_dir, "segments", f"pos-{shard:05d}-{part:04d}.parquet"
    )


class _PosTokenize:
    """Map-side body: tokenize + per-(term, doc) position lists,
    hash-partitioned by gkey = shard * P + part. Vectorized after
    tokenization (dictionary-encode + one lexsort)."""

    def __init__(self, cfg: SparseConfig, conv_map_ref, num_parts: int, shard_docs: int):
        self.pre = TextPreprocessor(cfg)
        self._resolver = ConvMapResolver(conv_map_ref)
        self.P = num_parts
        self.shard_docs = shard_docs

    def _doc_bases(self, conv: np.ndarray) -> np.ndarray:
        # broadcast searchsorted, or the bucketed map-side hash join
        # on a ("sharded", ...) handle — same contract as the main
        # build's tokenize stage (build.py ConvMapResolver)
        return self._resolver.doc_bases(conv)

    def __call__(self, batch: pa.Table) -> pa.Table:
        P, shard_docs = self.P, self.shard_docs
        texts = batch.column("text").to_pylist()
        n_rows = len(texts)

        # same tokenize shape as the main build (build.py
        # _TokenizePartials): Arrow-side whitespace split when the
        # tokenizer allows, stopword/stem over UNIQUE raw tokens only;
        # positions are then renumbered over the kept sequence (the
        # reference's positions index the post-filter token list)
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

        conv_col = batch.column("conv_id")
        if isinstance(conv_col, pa.ChunkedArray):
            conv_col = conv_col.combine_chunks()
        cenc = conv_col.dictionary_encode()
        u_conv = np.asarray(cenc.dictionary.to_pylist(), dtype=object)
        bases_u = self._doc_bases(u_conv)
        turn = batch.column("turn_idx").to_numpy().astype(np.int64)
        doc_ids = bases_u[cenc.indices.to_numpy().astype(np.int64)] + turn
        if not len(flat_arr):
            return POS_PAIR_SCHEMA.empty_table()

        denc = flat_arr.dictionary_encode()
        raw_codes = denc.indices.to_numpy().astype(np.int64)
        stems = self.pre.stem_or_none_many(denc.dictionary.to_pylist())
        kept_idx = [i for i, s in enumerate(stems) if s is not None]
        senc = pa.array(
            [stems[i] for i in kept_idx], type=pa.string()
        ).dictionary_encode()
        scode_of_raw = np.full(len(stems), -1, dtype=np.int64)
        if kept_idx:
            scode_of_raw[np.asarray(kept_idx, dtype=np.int64)] = (
                senc.indices.to_numpy().astype(np.int64)
            )
        stem_dict = senc.dictionary
        code_all = scode_of_raw[raw_codes]
        keep = code_all >= 0

        # position within the KEPT token sequence of each turn
        k = keep.astype(np.int64)
        pre_kept = np.cumsum(k) - k  # kept strictly before index i
        t_starts = np.concatenate(([0], np.cumsum(reps)[:-1]))
        pos_all = pre_kept - np.repeat(pre_kept[t_starts], reps)

        code = code_all[keep]
        doc_rep = np.repeat(doc_ids, reps)[keep]
        pos = pos_all[keep].astype(np.int32)
        if not len(code):
            return POS_PAIR_SCHEMA.empty_table()

        # sort by (code, doc); the stable argsort preserves the flat
        # order inside each run, which is ascending position
        d_min = int(doc_rep.min())
        span = int(doc_rep.max()) - d_min + 1
        if len(stem_dict) * span < (1 << 62):
            order = np.argsort(code * span + (doc_rep - d_min), kind="stable")
        else:
            order = np.lexsort((pos, doc_rep, code))
        c_s, d_s, p_s = code[order], doc_rep[order], pos[order]

        # (term, doc) run boundaries -> per-doc position counts
        new_doc = np.empty(len(c_s), dtype=bool)
        new_doc[0] = True
        new_doc[1:] = (c_s[1:] != c_s[:-1]) | (d_s[1:] != d_s[:-1])
        dstart = np.flatnonzero(new_doc)
        npos = np.diff(np.append(dstart, len(c_s))).astype(np.int32)
        u_code, u_doc = c_s[dstart], d_s[dstart]

        # (term, shard) row boundaries
        shard = u_doc // shard_docs
        brk = np.empty(len(u_code), dtype=bool)
        brk[0] = True
        brk[1:] = (u_code[1:] != u_code[:-1]) | (shard[1:] != shard[:-1])
        r_start = np.flatnonzero(brk)
        r_end = np.append(r_start[1:], len(u_code))
        run_codes = u_code[r_start]
        r_terms = stem_dict.take(pa.array(run_codes))
        r_parts = _term_parts_np(stem_dict.to_pylist(), P)[run_codes]
        r_gkey = shard[r_start] * P + r_parts

        doc_off = np.concatenate(([0], np.cumsum(npos.astype(np.int64))))
        row_doc_off = np.concatenate(([0], r_end)).astype(np.int32)
        row_pos_off = doc_off[np.concatenate(([0], r_end))].astype(np.int32)
        return pa.Table.from_arrays(
            [
                pa.array(r_gkey, type=pa.int64()),
                r_terms,
                pa.ListArray.from_arrays(
                    pa.array(row_doc_off),
                    pa.array((u_doc % shard_docs).astype(np.int32)),
                ),
                pa.ListArray.from_arrays(pa.array(row_doc_off), pa.array(npos)),
                pa.ListArray.from_arrays(pa.array(row_pos_off), pa.array(p_s)),
            ],
            schema=POS_PAIR_SCHEMA,
        )


def _pos_map_task(
    units: List[Tuple[str, int]],
    cfg_json,
    conv_map_ref_boxed,
    num_parts: int,
    shard_docs: int,
    batch_size: int,
    n_buckets: int,
):
    key = "pos:" + json.dumps(cfg_json, sort_keys=True) + str(conv_map_ref_boxed[0])
    st = _WORKER_STATE.get(key)
    if st is None:
        st = _PosTokenize(
            SparseConfig.from_json(cfg_json),
            conv_map_ref_boxed[0],
            num_parts,
            shard_docs,
        )
        _WORKER_STATE.clear()
        _WORKER_STATE[key] = st
    parts: List[pa.Table] = []
    for f, rg in units:
        tbl = pq.ParquetFile(f).read_row_group(
            rg, columns=["conv_id", "turn_idx", "text"]
        )
        for i in range(0, tbl.num_rows, batch_size):
            parts.append(st(tbl.slice(i, batch_size)))
    out = (
        pa.concat_tables(parts) if parts else POS_PAIR_SCHEMA.empty_table()
    )
    gk = out.column("gkey").to_numpy()
    bk = gk % n_buckets
    order = np.lexsort((gk, bk))
    srt = out.take(order)
    if n_buckets == 1:
        return srt
    bk_s = bk[order]
    bounds = np.searchsorted(bk_s, np.arange(n_buckets + 1))
    return tuple(
        srt.slice(bounds[b], bounds[b + 1] - bounds[b]) for b in range(n_buckets)
    )


def _encode_pos_group(group: pa.Table, index_dir: str, num_parts: int) -> dict:
    """One (shard, part) group -> one positional segment file.
    Canonical per-term encode: rows may arrive from many map tasks in
    any order; (term, doc) pairs are globally unique, so sorting docs
    within each term makes segment bytes batching-independent."""
    gkey = int(group.column("gkey")[0].as_py())
    shard, part = gkey // num_parts, gkey % num_parts
    terms = np.asarray(group.column("term").to_pylist(), dtype=object)
    docs_col = group.column("doc_ids")
    npos_col = group.column("npos")
    pos_col = group.column("positions")
    dlist = docs_col.combine_chunks()
    docs_flat = dlist.flatten().to_numpy().astype(np.int64)
    npos_flat = npos_col.combine_chunks().flatten().to_numpy().astype(np.int64)
    pos_flat = pos_col.combine_chunks().flatten().to_numpy().astype(np.int64)
    row_ndocs = np.diff(dlist.offsets.to_numpy().astype(np.int64))

    # order rows by term (stable), then docs within each term
    row_order = np.argsort(terms, kind="stable")
    # gather doc-level entries row by row (vectorized: repeat + arange)
    row_doc_off = np.concatenate(([0], np.cumsum(row_ndocs)))
    sel_lens = row_ndocs[row_order]
    total_sel = int(sel_lens.sum())
    excl = np.concatenate(([0], np.cumsum(sel_lens)[:-1]))
    gather_docs = (
        np.repeat(row_doc_off[row_order], sel_lens)
        + (np.arange(total_sel) - np.repeat(excl, sel_lens))
        if total_sel
        else np.empty(0, dtype=np.int64)
    )
    docs_o = docs_flat[gather_docs]
    npos_o = npos_flat[gather_docs]
    # position stream offsets per doc-entry (in original layout)
    pos_off = np.concatenate(([0], np.cumsum(npos_flat)))
    t_rep = np.repeat(np.arange(len(terms))[row_order], row_ndocs[row_order])
    terms_sorted = terms[row_order]
    t_ndocs = row_ndocs[row_order]

    # term run boundaries over the doc-entry axis
    t_codes = np.repeat(np.arange(len(row_order)), t_ndocs)
    term_brk = np.empty(len(t_codes), dtype=bool)
    if len(t_codes):
        term_brk[0] = True
        term_brk[1:] = terms_sorted[t_codes[1:]] != terms_sorted[t_codes[:-1]]
    t_starts = np.flatnonzero(term_brk)
    t_ends = np.append(t_starts[1:], len(t_codes))

    # ---- fully vectorized encode (the per-term Python loop measured
    # 6x the map cost; LEB128 is per-value, so one varint_encode over
    # the whole concatenated delta stream == the concatenation of
    # per-term encodes, and per-term byte spans come from reduceat)
    term_gid = np.cumsum(term_brk) - 1 if len(t_codes) else np.empty(0, np.int64)
    order2 = np.lexsort((docs_o, term_gid))
    d_all = docs_o[order2]
    nps_all = npos_o[order2]
    entry_idx_all = gather_docs[order2]

    # doc deltas, first-of-term absolute
    dd = np.diff(d_all, prepend=0)
    dd[t_starts] = d_all[t_starts]
    nbd = codec.varint_nbytes(dd.astype(np.uint64))
    doc_stream = codec.varint_encode(dd.astype(np.uint64), nbd)
    doc_blen = np.add.reduceat(nbd.astype(np.int64), t_starts)

    # global positions gather in (term, doc) order
    g_lens = npos_flat[entry_idx_all]
    g_total = int(g_lens.sum())
    g_excl = np.concatenate(([0], np.cumsum(g_lens)[:-1]))
    pg_all = (
        pos_flat[
            np.repeat(pos_off[entry_idx_all], g_lens)
            + (np.arange(g_total) - np.repeat(g_excl, g_lens))
        ]
        if g_total
        else np.empty(0, dtype=np.int64)
    )
    # per-doc delta encode: first-of-doc absolute
    pd = np.diff(pg_all, prepend=0)
    doc_pos_starts = g_excl  # exclusive cumsum of per-doc counts
    pd[doc_pos_starts] = pg_all[doc_pos_starts]
    nbp = codec.varint_nbytes(pd.astype(np.uint64))
    pos_stream = codec.varint_encode(pd.astype(np.uint64), nbp)
    # per-term spans over the position-value axis
    t_pos_starts = g_excl[t_starts] if len(t_starts) else np.empty(0, np.int64)
    pos_blen = (
        np.add.reduceat(nbp.astype(np.int64), t_pos_starts)
        if g_total
        else np.zeros(len(t_starts), dtype=np.int64)
    )
    n_positions = g_total

    def _bin_col(stream: bytes, blens: np.ndarray) -> pa.Array:
        offs = np.concatenate(([0], np.cumsum(blens))).astype(np.int32)
        return pa.BinaryArray.from_buffers(
            pa.binary(),
            len(blens),
            [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(stream)],
        )

    seg = pa.Table.from_arrays(
        [
            pa.array(terms_sorted[t_codes[t_starts]], type=pa.string()),
            pa.array((t_ends - t_starts).astype(np.int64), type=pa.int64()),
            _bin_col(doc_stream, doc_blen),
            pa.ListArray.from_arrays(
                pa.array(
                    np.concatenate(([0], np.cumsum(t_ends - t_starts))).astype(
                        np.int32
                    )
                ),
                pa.array(nps_all.astype(np.int32), type=pa.int32()),
            ),
            _bin_col(pos_stream, pos_blen),
        ],
        names=["term", "df", "doc_bytes", "npos", "pos_bytes"],
    )
    path = pos_segment_file(index_dir, shard, part)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(seg, tmp)
    os.replace(tmp, path)
    return {
        "shard": shard,
        "part": part,
        "n_terms": int(len(t_starts)),
        "n_postings": int(len(d_all)),
        "n_positions": int(n_positions),
    }


def _pos_reduce_bucket(index_dir: str, num_parts: int, *tables: pa.Table):
    live = [t for t in tables if t.num_rows]
    if not live:
        return []
    gks = [t.column("gkey").to_numpy() for t in live]
    uniq = np.unique(np.concatenate(gks))
    stats = []
    for g in uniq:
        parts = []
        for t, gk in zip(live, gks):
            lo = np.searchsorted(gk, g, side="left")
            hi = np.searchsorted(gk, g, side="right")
            if hi > lo:
                parts.append(t.slice(lo, hi - lo))
        stats.append(
            _encode_pos_group(pa.concat_tables(parts), index_dir, num_parts)
        )
    return stats


def build_positional_index(
    source,
    index_dir: str,
    cfg: Optional[SparseConfig] = None,
    num_parts: int = 8,
    shard_docs: int = 1 << 22,
    batch_size: int = 4096,
    conv_offsets_source: Optional[str] = None,
) -> dict:
    """Build positional segments under ``index_dir`` from a parquet
    path/list source of (conv_id, turn_idx, text). Returns the
    manifest dict (also written to ``pos_manifest.json``).

    ``conv_offsets_source``: an existing index dir whose
    ``id_map/conv_offsets.parquet`` covers the SAME source — reuses
    its doc-id assignment and skips the offsets pass (the positional
    index is usually built beside a main index over identical input;
    the offsets scan is the build's fixed ~1-2s overhead)."""
    import ray

    cfg = cfg or SparseConfig()
    files = _list_parquet_files(source)
    if files is None:
        raise ValueError(
            "build_positional_index needs a parquet path source "
            "(Dataset inputs: write_parquet first)"
        )
    t0 = time.monotonic()
    # conv-map mode: same policy as build_index — past the broadcast
    # limit (GRAFT_CONV_BROADCAST_LIMIT conversations, estimated at
    # ~400 bytes/turn from the parquet footers), the whole-map gather
    # + ray.put would hit the driver/object-size wall, so the map goes
    # bucketed (a ("sharded", boundaries, refs) handle consumed by
    # ConvMapResolver's map-side hash join). GRAFT_CONV_MAP=sharded
    # forces the path at any size.
    conv_mode = os.environ.get("GRAFT_CONV_MAP", "auto")
    conv_limit = int(
        os.environ.get("GRAFT_CONV_BROADCAST_LIMIT", str(100_000_000))
    )
    est_turns = None
    if conv_mode == "auto" and conv_offsets_source is None and len(files) <= 4096:
        try:
            want = {"conv_id", "turn_idx", "text"}
            est = 0
            for f in files:
                md = pq.ParquetFile(f).metadata
                for rg in range(md.num_row_groups):
                    g = md.row_group(rg)
                    est += sum(
                        g.column(c).total_uncompressed_size
                        for c in range(g.num_columns)
                        if g.column(c).path_in_schema.split(".")[0] in want
                    )
            est_turns = est // 400
        except OSError:
            est_turns = None
    conv_offsets_dir = None  # manifest key: where the id_map lives
    os.makedirs(os.path.join(index_dir, "id_map"), exist_ok=True)
    if conv_offsets_source is not None:
        single = os.path.join(
            conv_offsets_source, "id_map", "conv_offsets.parquet"
        )
        if conv_mode != "sharded" and os.path.exists(single):
            conv_offsets = read_conv_offsets(conv_offsets_source)
            doc_count = int(
                conv_offsets.column("base")[-1].as_py()
                + conv_offsets.column("n_turns")[-1].as_py()
            )
        else:
            # the source build was itself sharded (or the sharded path
            # is forced): lift its id_map slices into the object store
            # task-side — the map never touches this driver either
            conv_map_ref, doc_count = sharded_handle_from_slices(
                conv_offsets_source
            )
            conv_offsets = None
            conv_offsets_dir = os.path.abspath(conv_offsets_source)
    elif conv_mode == "sharded" or (
        est_turns is not None and est_turns > conv_limit
    ):
        conv_map_ref, doc_count = compute_conv_offsets_sharded(
            files, index_dir
        )
        conv_offsets = None
        conv_offsets_dir = index_dir
    else:
        conv_offsets, doc_count = compute_conv_offsets(source)
    if conv_offsets is not None:
        pq.write_table(
            conv_offsets,
            os.path.join(index_dir, "id_map", "conv_offsets.parquet"),
        )
        conv_map_ref = ray.put(
            (
                np.asarray(
                    conv_offsets.column("conv_id").to_pylist(), dtype=object
                ),
                conv_offsets.column("base").to_numpy(),
            )
        )
    n_shards = (doc_count + shard_docs - 1) // shard_docs if doc_count else 1
    n_groups = n_shards * num_parts
    n_buckets = min(n_groups, 64)
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    plans = _plan_map_units(files, target_tasks=2 * ncpu) or [
        [(f, rg) for f in files for rg in range(pq.ParquetFile(f).metadata.num_row_groups)]
    ]
    map_task = ray.remote(num_cpus=1, num_returns=n_buckets)(_pos_map_task)
    cfg_json = cfg.to_json()
    map_refs = [
        map_task.remote(
            u, cfg_json, [conv_map_ref], num_parts, shard_docs,
            batch_size, n_buckets,
        )
        for u in plans
    ]
    if n_buckets == 1:
        map_refs = [[r] for r in map_refs]
    reduce_task = ray.remote(num_cpus=1)(_pos_reduce_bucket)
    stat_refs = [
        reduce_task.remote(
            index_dir, num_parts, *[map_refs[m][b] for m in range(len(map_refs))]
        )
        for b in range(n_buckets)
    ]
    stats = [s for chunk in ray.get(stat_refs) for s in chunk]
    manifest = {
        "kind": "positional",
        "num_parts": num_parts,
        "shard_docs": shard_docs,
        "doc_count": int(doc_count),
        "n_shards": int(n_shards),
        "config": cfg.to_json(),
        "n_terms": int(sum(s["n_terms"] for s in stats)),
        "n_postings": int(sum(s["n_postings"] for s in stats)),
        "n_positions": int(sum(s["n_positions"] for s in stats)),
        "wall_sec": round(time.monotonic() - t0, 3),
        # where the conv-offsets id_map lives (absent/None = this
        # index dir's single parquet): sharded builds point at their
        # own slice dir, source-reuse builds at the source index
        "conv_offsets_dir": conv_offsets_dir,
    }
    with open(os.path.join(index_dir, "pos_manifest.json"), "w") as f:
        json.dump(manifest, f)
    return manifest


# ---------------------------------------------------------------------------
# query side
# ---------------------------------------------------------------------------


class PositionalIndex:
    """Lazy reader over positional segments: per-(shard, part) rows
    load on first touch; term rows decode to (global doc_ids asc,
    per-doc position arrays) and are LRU-capped."""

    def __init__(self, index_dir: str, cache_terms: int = 4096):
        self.index_dir = index_dir
        with open(os.path.join(index_dir, "pos_manifest.json")) as f:
            self.manifest = json.load(f)
        self.num_parts = self.manifest["num_parts"]
        self.shard_docs = self.manifest["shard_docs"]
        self.n_shards = self.manifest["n_shards"]
        self.cfg = SparseConfig.from_json(self.manifest["config"])
        self.pre = TextPreprocessor(self.cfg)
        self._segs: Dict[tuple, dict] = {}
        self._terms: Dict[str, tuple] = {}
        self._cache_terms = cache_terms
        self._conv = None
        self._tombstone_ranges: object = False  # False = unloaded

    @property
    def exclude_ranges(self):
        """Tombstoned [start, end) doc-id ranges for this index dir
        (same mechanism as the main index: see
        retriv_ray.index.tombstones), or None."""
        if self._tombstone_ranges is False:
            from retriv_ray.index.tombstones import deleted_doc_ranges

            self._tombstone_ranges = deleted_doc_ranges(self.index_dir)
        return self._tombstone_ranges

    def reload_tombstones(self) -> None:
        self._tombstone_ranges = False

    def _segment(self, shard: int, part: int) -> dict:
        key = (shard, part)
        seg = self._segs.get(key)
        if seg is None:
            path = pos_segment_file(self.index_dir, shard, part)
            seg = {}
            if os.path.exists(path):
                t = pq.read_table(path)
                terms = t.column("term").to_pylist()
                db = t.column("doc_bytes").to_pylist()
                npos = t.column("npos").to_pylist()
                pb = t.column("pos_bytes").to_pylist()
                for i, term in enumerate(terms):
                    seg[term] = (db[i], npos[i], pb[i])
            self._segs[key] = seg
        return seg

    def get(self, term: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(doc_ids int64 asc, pos_offsets int64 [len+1], positions
        int64) — positions[pos_offsets[i]:pos_offsets[i+1]] belong to
        doc_ids[i], ascending."""
        hit = self._terms.get(term)
        if hit is not None:
            return hit
        from retriv_ray.index.build import term_part

        part = term_part(term, self.num_parts)
        docs_all: List[np.ndarray] = []
        npos_all: List[np.ndarray] = []
        pos_all: List[np.ndarray] = []
        for shard in range(self.n_shards):
            row = self._segment(shard, part).get(term)
            if row is None:
                continue
            db, npos, pb = row
            dd = codec.varint_decode(db).astype(np.int64)
            docs = np.cumsum(dd) + shard * self.shard_docs
            nps = np.asarray(npos, dtype=np.int64)
            pd = codec.varint_decode(pb).astype(np.int64)
            # segmented cumsum: absolute positions per doc
            if len(pd):
                starts = np.concatenate(([0], np.cumsum(nps)[:-1]))
                c = np.cumsum(pd)
                base = np.zeros(len(nps), dtype=np.int64)
                base[1:] = c[starts[1:] - 1]
                pos = c - np.repeat(base, nps)
            else:
                pos = pd
            docs_all.append(docs)
            npos_all.append(nps)
            pos_all.append(pos)
        if not docs_all:
            out = (
                np.empty(0, dtype=np.int64),
                np.zeros(1, dtype=np.int64),
                np.empty(0, dtype=np.int64),
            )
        else:
            docs = np.concatenate(docs_all)
            nps = np.concatenate(npos_all)
            pos = np.concatenate(pos_all)
            offs = np.concatenate(([0], np.cumsum(nps)))
            out = (docs, offs, pos)
        if len(self._terms) >= self._cache_terms:
            self._terms.pop(next(iter(self._terms)))
        self._terms[term] = out
        return out

    # -- conv mapping ---------------------------------------------------
    def to_original_ids(self, doc_ids: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        if self._conv is None:
            t = read_conv_offsets(
                self.manifest.get("conv_offsets_dir") or self.index_dir
            )
            self._conv = (
                np.asarray(t.column("conv_id").to_pylist(), dtype=object),
                t.column("base").to_numpy(),
            )
        convs, bases = self._conv
        pos = np.searchsorted(bases, doc_ids, side="right") - 1
        return convs[pos], (doc_ids - bases[pos]).astype(np.int32)

    # -- queries --------------------------------------------------------
    def _restricted_keys(
        self, term: str, cand: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray]:
        """(keys, doc_labels): int64 keys cand_idx * 2^32 + position
        for the term's positions within candidate docs, ascending."""
        docs, offs, pos = self.get(term)
        idx = np.searchsorted(docs, cand)
        lens = (offs[idx + 1] - offs[idx]).astype(np.int64)
        starts = offs[idx]
        total = int(lens.sum())
        if total == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        excl = np.concatenate(([0], np.cumsum(lens)[:-1]))
        gather = np.repeat(starts, lens) + (
            np.arange(total) - np.repeat(excl, lens)
        )
        lab = np.repeat(np.arange(len(cand), dtype=np.int64), lens)
        return (lab << np.int64(32)) | pos[gather], lab

    def phrase(self, terms: Sequence[str]) -> Tuple[np.ndarray, np.ndarray]:
        """Docs containing the exact consecutive term sequence.
        Returns (doc_ids asc, n_occurrences>0); overlapping
        occurrences count."""
        terms = list(terms)
        if not terms:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        posts = [self.get(t) for t in terms]
        cand = intersect_sorted_multi([p[0] for p in posts])
        if self.exclude_ranges is not None:
            from retriv_ray.search.kernel import _drop_ranges

            cand = _drop_ranges(cand, self.exclude_ranges)
        if len(cand) == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        keys0, lab0 = self._restricted_keys(terms[0], cand)
        alive = keys0
        for i, t in enumerate(terms[1:], start=1):
            if len(alive) == 0:
                break
            ki, _ = self._restricted_keys(t, cand)
            want = alive + np.int64(i)
            p = np.searchsorted(ki, want)
            p[p >= len(ki)] = max(len(ki) - 1, 0)
            hit = (ki[p] == want) if len(ki) else np.zeros(len(want), bool)
            alive = alive[hit]
        if len(alive) == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        lab = (alive >> np.int64(32)).astype(np.int64)
        n_occ = np.bincount(lab, minlength=len(cand)).astype(np.int64)
        m = n_occ > 0
        return cand[m], n_occ[m]

    def proximity(
        self, term_a: str, term_b: str, window: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Docs where term_a and term_b co-occur within ``window``
        token positions (|pos_a - pos_b| <= window, distinct positions
        when the terms are equal). Returns (doc_ids asc, n_pairs)."""
        da, _, _ = self.get(term_a)
        db, _, _ = self.get(term_b)
        cand = intersect_sorted_multi([da, db])
        if self.exclude_ranges is not None:
            from retriv_ray.search.kernel import _drop_ranges

            cand = _drop_ranges(cand, self.exclude_ranges)
        if len(cand) == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        ka, laba = self._restricted_keys(term_a, cand)
        kb, _ = self._restricted_keys(term_b, cand)
        pos_a = ka & np.int64((1 << 32) - 1)
        lo_pos = np.maximum(pos_a - window, 0)
        lo = (ka & ~np.int64((1 << 32) - 1)) | lo_pos
        hi = ka + np.int64(window)
        cnt = np.searchsorted(kb, hi, side="right") - np.searchsorted(
            kb, lo, side="left"
        )
        if term_a == term_b:
            cnt = cnt - 1  # remove the self pair
        n = np.bincount(laba, weights=cnt, minlength=len(cand)).astype(np.int64)
        m = n > 0
        return cand[m], n[m]


def phrase_table(index: PositionalIndex, queries: Dict[str, str]) -> pa.Table:
    """{q_id: phrase text} -> (q_id, conv_id, turn_idx, n_occ) ordered
    by (q_id, doc_id). Phrase text runs through the index's own
    preprocessing pipeline (order-preserving)."""
    q_col: List[str] = []
    c_parts, t_parts, n_parts = [], [], []
    for q_id in sorted(queries):
        terms = index.pre.tokens(queries[q_id])
        docs, n_occ = index.phrase(terms)
        convs, turns = index.to_original_ids(docs)
        q_col.extend([q_id] * len(docs))
        c_parts.append(np.asarray(convs, dtype=object))
        t_parts.append(turns)
        n_parts.append(n_occ)
    return _qct_table(q_col, c_parts, t_parts, n_parts, "n_occ")


def proximity_table(
    index: PositionalIndex, queries: Dict[str, tuple]
) -> pa.Table:
    """{q_id: (term_a, term_b, window)} -> (q_id, conv_id, turn_idx,
    n_pairs) ordered by (q_id, doc_id)."""
    q_col: List[str] = []
    c_parts, t_parts, n_parts = [], [], []
    for q_id in sorted(queries):
        ta, tb, w = queries[q_id]
        docs, n = index.proximity(ta, tb, w)
        convs, turns = index.to_original_ids(docs)
        q_col.extend([q_id] * len(docs))
        c_parts.append(np.asarray(convs, dtype=object))
        t_parts.append(turns)
        n_parts.append(n)
    return _qct_table(q_col, c_parts, t_parts, n_parts, "n_pairs")


def _qct_table(q_col, c_parts, t_parts, n_parts, n_name: str) -> pa.Table:
    convs = np.concatenate(c_parts) if c_parts else np.empty(0, dtype=object)
    turns = np.concatenate(t_parts) if t_parts else np.empty(0, dtype=np.int32)
    ns = np.concatenate(n_parts) if n_parts else np.empty(0, dtype=np.int64)
    return pa.Table.from_arrays(
        [
            pa.array(q_col, type=pa.string()),
            pa.array(convs, type=pa.string()),
            pa.array(turns.astype(np.int32), type=pa.int32()),
            pa.array(ns.astype(np.int64), type=pa.int64()),
        ],
        names=["q_id", "conv_id", "turn_idx", n_name],
    )


# ---------------------------------------------------------------------------
# batch serving (Dataset of phrase queries -> Dataset of matches)
# ---------------------------------------------------------------------------

_SERVE_STATE: dict = {}


def _phrase_scorer_fn(index_dir: str):
    """Per-worker-cached PositionalIndex (segments load once per
    worker process and are reused across tasks — the ST3 stateful-
    serving pattern, task-pool form like searcher._query_scorer_fn)."""

    def fn(batch: pa.Table) -> pa.Table:
        px = _SERVE_STATE.get(index_dir)
        if px is None:
            px = PositionalIndex(index_dir)
            _SERVE_STATE.clear()
            _SERVE_STATE[index_dir] = px
        q_ids = batch.column("id").to_pylist()
        texts = batch.column("text").to_pylist()
        return phrase_table(
            px, {str(q): t or "" for q, t in zip(q_ids, texts)}
        )

    return fn


def phrase_msearch_ds(
    index_dir: str,
    queries,
    concurrency: Optional[int] = None,
    batch_size: int = 64,
):
    """Batch phrase serving: a Dataset / list of {id, text} phrase
    queries streams through worker-cached PositionalIndex readers.
    Returns a Dataset (q_id, conv_id, turn_idx, n_occ); each worker
    holds only the segments its queries' terms hash to (lazy per-part
    loads), so the reader fleet memory profile matches the sharded
    BM25 scorers."""
    import ray
    import ray.data

    if concurrency is None:
        concurrency = max(1, int(ray.cluster_resources().get("CPU", 4)) - 1)
    if isinstance(queries, (list, tuple)):
        n = len(queries)
        queries = ray.data.from_items(
            [{"id": q["id"], "text": q["text"]} for q in queries]
        )
        target_blocks = max(1, min(n // 8, 4 * concurrency))
        if queries.num_blocks() < target_blocks:
            queries = queries.repartition(target_blocks)
    return queries.map_batches(
        _phrase_scorer_fn(index_dir),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def _prox_scorer_fn(index_dir: str):
    """Worker-cached proximity twin of :func:`_phrase_scorer_fn`;
    query rows carry (id, term_a, term_b, window)."""

    def fn(batch: pa.Table) -> pa.Table:
        px = _SERVE_STATE.get(index_dir)
        if px is None:
            px = PositionalIndex(index_dir)
            _SERVE_STATE.clear()
            _SERVE_STATE[index_dir] = px
        qs = {
            str(q): (a, b, int(w))
            for q, a, b, w in zip(
                batch.column("id").to_pylist(),
                batch.column("term_a").to_pylist(),
                batch.column("term_b").to_pylist(),
                batch.column("window").to_pylist(),
            )
        }
        return proximity_table(px, qs)

    return fn


def proximity_msearch_ds(
    index_dir: str,
    queries,
    concurrency: Optional[int] = None,
    batch_size: int = 64,
):
    """Batch proximity serving: Dataset / list of {id, term_a, term_b,
    window} rows -> Dataset (q_id, conv_id, turn_idx, n_pairs); same
    worker-cached reader fleet as :func:`phrase_msearch_ds`."""
    import ray
    import ray.data

    if concurrency is None:
        concurrency = max(1, int(ray.cluster_resources().get("CPU", 4)) - 1)
    if isinstance(queries, (list, tuple)):
        n = len(queries)
        queries = ray.data.from_items(list(queries))
        target_blocks = max(1, min(n // 8, 4 * concurrency))
        if queries.num_blocks() < target_blocks:
            queries = queries.repartition(target_blocks)
    return queries.map_batches(
        _prox_scorer_fn(index_dir),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def phrase_bm25_table(
    index: PositionalIndex,
    main_index,
    queries: Dict[str, str],
    b: float = 0.75,
    k1: float = 1.2,
    cutoff: int = 10,
) -> pa.Table:
    """Ranked phrase retrieval: the phrase is scored as a pseudo-term
    (tf = occurrence count from the positional verify, df = number of
    matching docs) through the standard BM25 formula — the classic
    phrase-query scoring model. Doc-length statistics come from the
    sibling main index over the same source (identical doc-id
    assignment by construction). Returns (q_id, rank, conv_id,
    turn_idx) ordered by (q_id, rank); ranks break ties by doc_id like
    the scoring kernels."""
    N = np.float64(main_index.doc_count)
    # float64 relative doc lengths: the SQL oracle computes
    # dl / (sum(dl)/N) in float64, so derive avg from the manifest's
    # exact integer len_sum when present (falls back to the float32
    # serving array otherwise)
    stats = getattr(main_index.manifest, "stats", None) or {}
    if "len_sum" in stats:
        avg = np.float64(stats["len_sum"]) / N
        rel = main_index.doc_lens.astype(np.float64) / avg
    else:
        rel = main_index.relative_doc_lens
    q_col, r_col, c_parts, t_parts = [], [], [], []
    for q_id in sorted(queries):
        terms = index.pre.tokens(queries[q_id])
        docs, n_occ = index.phrase(terms)
        if len(docs) == 0:
            continue
        df = np.float64(len(docs))
        idf = np.log(1.0 + (N - df + 0.5) / (df + 0.5))
        tf = n_occ.astype(np.float64)
        denom = tf + k1 * (1.0 - b + b * rel[docs].astype(np.float64))
        score = idf * tf * (k1 + 1.0) / denom
        order = np.lexsort((docs, -score))[:cutoff]
        convs, turns = index.to_original_ids(docs[order])
        q_col.extend([q_id] * len(order))
        r_col.extend(range(1, len(order) + 1))
        c_parts.append(np.asarray(convs, dtype=object))
        t_parts.append(turns)
    convs = np.concatenate(c_parts) if c_parts else np.empty(0, dtype=object)
    turns = np.concatenate(t_parts) if t_parts else np.empty(0, dtype=np.int32)
    return pa.Table.from_arrays(
        [
            pa.array(q_col, type=pa.string()),
            pa.array(r_col, type=pa.int64()),
            pa.array(convs, type=pa.string()),
            pa.array(turns.astype(np.int32), type=pa.int32()),
        ],
        names=["q_id", "rank", "conv_id", "turn_idx"],
    )
