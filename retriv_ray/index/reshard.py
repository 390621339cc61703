"""Reshard a built index to a different term-hash part count —
`ES _shrink`/`_split` for the term dimension — WITHOUT re-reading or
re-tokenizing the corpus.

Why this exists: ``num_parts`` fixes the serving fan-out (one
TermStats/scorer slice per part). A fleet resize at 100 TB should not
cost a corpus re-index (reading 10^12 turns) when the index itself
already holds everything needed: each encoded segment row is a
complete, partition-independent (term, shard) unit — doc_bytes /
tf_bytes never mention the part — so resharding is a pure METADATA
move: route every row to ``term_part(term, new_parts)``, re-sort each
new file by term, and regenerate the (term, df, cf) tables. No
posting is decoded, let alone re-encoded.

Cost: one read + one write of the segments (the index, typically
~10% of corpus bytes), embarrassingly parallel per doc-shard, zero
all-to-all (each shard's rows only re-bucket WITHIN that shard's
files). The result is BYTE-IDENTICAL to a from-scratch build at
``new_parts`` (segment and terms files; pinned by test) because the
build's segment writer sorts rows by term and this module writes
through the same ``atomic_write_parquet``.

Tombstones, doc_lens, and the id_map are part-independent and copy
verbatim. min_df pruning is already baked into the segments, so the
terms tables regenerate with no re-pruning.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from typing import List

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from retriv_ray.index import manifest as mf
from retriv_ray.index.build import SEGMENT_SCHEMA, _term_parts_np, segment_file


def _reshard_shard(
    src_dir: str, out_dir: str, shard: int, old_parts: int, new_parts: int
) -> List[int]:
    """Re-bucket one doc shard's segment rows; returns the new part
    ids written (a part with no terms in this shard writes no file,
    matching the builder)."""
    tables = []
    for p in range(old_parts):
        f = segment_file(src_dir, shard, p)
        if os.path.exists(f):
            tables.append(pq.read_table(f))
    if not tables:
        return []
    t = pa.concat_tables(tables)
    terms = np.asarray(t.column("term").to_pylist(), dtype=object)
    dest = _term_parts_np(terms, new_parts)
    written = []
    for p2 in np.unique(dest):
        sub = t.filter(pa.array(dest == p2)).sort_by("term")
        # parquet read-back renames list children item -> element;
        # cast restores the builder's exact schema for byte parity
        sub = sub.combine_chunks().cast(SEGMENT_SCHEMA)
        mf.atomic_write_parquet(sub, segment_file(out_dir, shard, int(p2)))
        written.append(int(p2))
    return written


def reshard_index(src_dir: str, out_dir: str, new_parts: int) -> dict:
    """Rewrite ``src_dir`` at ``new_parts`` term-hash parts into
    ``out_dir``; returns the new manifest dict."""
    import ray

    from retriv_ray.index.build import _merge_part_terms

    t0 = time.monotonic()
    with open(os.path.join(src_dir, "manifest.json")) as f:
        man = json.load(f)
    if not man.get("complete"):
        raise ValueError("reshard_index: source index is incomplete")
    if new_parts < 1:
        raise ValueError("new_parts must be >= 1")
    old_parts = man["num_parts"]

    for sub in ("segments", "terms", "doc_lens", "id_map", "lineage"):
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)
    # part-independent state copies verbatim
    for sub in ("doc_lens", "id_map"):
        for name in os.listdir(os.path.join(src_dir, sub)):
            shutil.copyfile(
                os.path.join(src_dir, sub, name),
                os.path.join(out_dir, sub, name),
            )
    tomb = os.path.join(src_dir, "tombstones", "convs.parquet")
    if os.path.exists(tomb):
        os.makedirs(os.path.join(out_dir, "tombstones"), exist_ok=True)
        shutil.copyfile(
            tomb, os.path.join(out_dir, "tombstones", "convs.parquet")
        )

    shards = sorted(
        {
            int(name[4:9])
            for name in os.listdir(os.path.join(src_dir, "segments"))
            if name.startswith("seg-")
        }
    )
    shard_task = ray.remote(num_cpus=1)(_reshard_shard)
    written = ray.get(
        [
            shard_task.remote(src_dir, out_dir, s, old_parts, new_parts)
            for s in shards
        ]
    )

    terms_task = ray.remote(num_cpus=1)(_merge_part_terms)
    jobs = []
    for p2 in range(new_parts):
        files = [
            segment_file(out_dir, s, p2)
            for s, parts in zip(shards, written)
            if p2 in parts
        ]
        if files:
            jobs.append(
                terms_task.remote(
                    files,
                    os.path.join(out_dir, "terms", f"part-{p2:04d}.parquet"),
                    1,  # pruning is baked into the segments already
                )
            )
    n_terms = sum(r[0] for r in ray.get(jobs))

    out_man = mf.IndexManifest(
        doc_count=man["doc_count"],
        num_parts=new_parts,
        salt_docs=man["salt_docs"],
        avg_doc_len=man["avg_doc_len"],
        n_terms=n_terms,
        n_postings=man["n_postings"],
        config=man["config"],
        fingerprint=hashlib.sha1(
            f"reshard:{man['fingerprint']}:{new_parts}".encode()
        ).hexdigest(),
        stats={
            "resharded_from": old_parts,
            "wall_total": round(time.monotonic() - t0, 3),
        },
    )
    out_man.save(out_dir)
    import dataclasses

    return dataclasses.asdict(out_man)
