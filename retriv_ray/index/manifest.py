"""Index manifest + per-partition lineage records.

Replaces the reference's single pickled ``sr_state.npz``
(reference sparse_retriever.py:124-174) with a directory layout that
scales and resumes:

    index_dir/
      manifest.json                 build config, stats, fingerprint
      id_map/conv_offsets.parquet   (conv_id, base, n_turns) — doc_id
                                    <-> (conv_id, turn_idx) in O(log C)
      doc_lens/dl-*.parquet         (doc_id, doc_len) fragments
      doc_lens/_COMPLETE            stage marker (JSON: doc_count)
      segments/part-NNNNN.parquet   term -> compressed postings
      lineage/part-NNNNN.json       per-partition lineage: build
                                    fingerprint + row counts + digest

A crashed build resumes by re-running only partitions whose lineage
record is missing or was written under a different fingerprint
(input files + config + partitioning parameters).
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
from typing import Any, Dict, List, Optional

MANIFEST_VERSION = 3  # v3: per-block byte lengths in segments (block-skip decode)


def atomic_write_text(path: str, text: str) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(text)
    os.replace(tmp, path)


def atomic_write_parquet(table, path: str) -> None:
    import pyarrow.parquet as pq

    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)


def build_fingerprint(
    input_desc: Any, cfg_json: Dict, num_parts: int, salt_docs: int
) -> str:
    payload = json.dumps(
        {
            "input": input_desc,
            "cfg": cfg_json,
            "num_parts": num_parts,
            "salt_docs": salt_docs,
            "version": MANIFEST_VERSION,
        },
        sort_keys=True,
        default=str,
    )
    return hashlib.sha1(payload.encode()).hexdigest()


@dataclasses.dataclass
class IndexManifest:
    doc_count: int
    num_parts: int
    salt_docs: int
    avg_doc_len: float
    n_terms: int
    n_postings: int
    config: Dict[str, Any]
    fingerprint: str
    complete: bool = True
    stats: Optional[Dict[str, Any]] = None
    version: int = MANIFEST_VERSION

    def save(self, index_dir: str) -> None:
        atomic_write_text(
            os.path.join(index_dir, "manifest.json"),
            json.dumps(dataclasses.asdict(self), indent=2),
        )

    @classmethod
    def load(cls, index_dir: str) -> "IndexManifest":
        with open(os.path.join(index_dir, "manifest.json")) as f:
            d = json.load(f)
        return cls(**d)


def segment_path(index_dir: str, part: int) -> str:
    return os.path.join(index_dir, "segments", f"part-{part:05d}.parquet")


def lineage_path(index_dir: str, part: int) -> str:
    return os.path.join(index_dir, "lineage", f"part-{part:05d}.json")


def write_lineage(index_dir: str, part: int, record: Dict) -> None:
    atomic_write_text(lineage_path(index_dir, part), json.dumps(record))


def completed_parts(index_dir: str, fingerprint: str) -> List[int]:
    """Parts whose lineage record matches this build's fingerprint AND
    whose segment file exists."""
    lin_dir = os.path.join(index_dir, "lineage")
    done = []
    if not os.path.isdir(lin_dir):
        return done
    for name in os.listdir(lin_dir):
        if not (name.startswith("part-") and name.endswith(".json")):
            continue
        try:
            with open(os.path.join(lin_dir, name)) as f:
                rec = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        part = int(name[len("part-") : -len(".json")])
        if rec.get("fingerprint") == fingerprint and (
            rec.get("empty") or os.path.exists(segment_path(index_dir, part))
        ):
            done.append(part)
    return sorted(done)
