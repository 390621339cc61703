"""Training-data preparation operators: text cleaning, deterministic
split assignment, and document chunking.

All are single-pass ``map_batches``/``flat_map``-style transforms —
no shuffle, no driver materialization — and each is expressible in
ANSI SQL for the driver's oracle gate:
- :func:`clean_text` uses ``pyarrow.compute`` regex kernels, which are
  RE2 — the same engine DuckDB's ``regexp_replace`` uses, so the
  Python and SQL sides share one regex dialect exactly.
- :func:`split_by_hash` buckets on the md5 of a key column (low 8
  digest bytes, little-endian — DuckDB ``md5_number_lower``), so the
  assignment is reproducible anywhere, including in SQL.
- :func:`chunk_documents` windows the whitespace token stream with
  overlap (the standard embedding/packing prep step).
"""

from __future__ import annotations

import hashlib
from typing import Dict, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# cleaning passes, applied in order (each a (pattern, replacement));
# RE2 syntax only — no lookarounds/backrefs — so DuckDB replicates it
_CLEAN_PASSES = [
    (r"https?://\S+", " "),  # URLs
    (r"\S+@\S+\.\S+", " "),  # emails
    (r"[\x00-\x08\x0b-\x1f\x7f]", " "),  # control chars (keep \t\n)
    (r"\s+", " "),  # collapse whitespace
]


def clean_text(ds, text_col: str = "text", id_col: str = "doc_id"):
    """(id, clean) with URLs/emails/control chars removed and
    whitespace collapsed+trimmed. Vectorized RE2 over Arrow batches."""

    def fn(batch: pa.Table) -> pa.Table:
        col = pc.cast(batch.column(text_col), pa.string())
        col = pc.fill_null(col, "")
        for pat, repl in _CLEAN_PASSES:
            col = pc.replace_substring_regex(col, pattern=pat, replacement=repl)
        col = pc.utf8_trim_whitespace(col)
        return pa.Table.from_arrays(
            [batch.column(id_col), col], names=[id_col, "clean"]
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def _md5_low64(values) -> np.ndarray:
    """DuckDB ``md5_number_lower`` equivalent: low 8 digest bytes,
    little-endian, as uint64."""
    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        out[i] = int.from_bytes(
            hashlib.md5(str(v).encode()).digest()[8:16], "little"
        )
    return out


def split_by_hash(
    ds,
    ratios: Dict[str, int] | None = None,
    key_col: str = "doc_id",
    buckets: int = 100,
):
    """Deterministic dataset split: bucket = md5_low64(key) % buckets,
    assigned to named splits by cumulative ratio (default
    train/val/test = 90/5/5). Content-independent of partitioning and
    cluster size — the property that matters when the same corpus is
    re-split on a different cluster. Adds a ``split`` column."""
    ratios = ratios or {"train": 90, "val": 5, "test": 5}
    assert sum(ratios.values()) == buckets, "ratios must sum to buckets"
    names = list(ratios)
    bounds = np.cumsum([ratios[n] for n in names])

    def fn(batch: pa.Table) -> pa.Table:
        h = _md5_low64(batch.column(key_col).to_pylist()) % np.uint64(buckets)
        idx = np.searchsorted(bounds, h, side="right")
        split = np.asarray(names, dtype=object)[idx]
        return batch.append_column("split", pa.array(split, type=pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")


def chunk_documents(
    ds,
    max_tokens: int = 64,
    stride: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Split each document's whitespace token stream into windows of
    ``max_tokens`` tokens advancing by ``stride`` (default: no
    overlap). Emits (id, chunk_idx, chunk, n_tokens); empty docs emit
    nothing. One streaming pass; output rows are independent, so
    downstream embedding/packing stages parallelize freely."""
    stride = stride or max_tokens
    assert stride > 0

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        out_id, out_ci, out_ch, out_n = [], [], [], []
        for did, t in zip(ids, texts):
            toks = (t or "").split()
            ci = 0
            for start in range(0, len(toks), stride):
                window = toks[start : start + max_tokens]
                out_id.append(did)
                out_ci.append(ci)
                out_ch.append(" ".join(window))
                out_n.append(len(window))
                ci += 1
                if start + max_tokens >= len(toks):
                    break
        return pa.Table.from_arrays(
            [
                pa.array(out_id),
                pa.array(out_ci, type=pa.int64()),
                pa.array(out_ch, type=pa.string()),
                pa.array(out_n, type=pa.int64()),
            ],
            names=[id_col, "chunk_idx", "chunk", "n_tokens"],
        )

    return ds.map_batches(fn, batch_format="pyarrow")
