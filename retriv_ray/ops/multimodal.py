"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with metadata
columns alongside (mime, width/height or sample_rate, n_bytes). The
decode libraries (PIL / torchaudio / av) are NOT in this container,
so the decode kernel is stubbed behind an import-try with a
deterministic fake (payload bytes -> uint8 grid) — the Ray-side
plumbing (actor-pool stage, small batch sizes for wide rows, Arrow
binary round-trip, output schema) is real and tested.

Scale notes: binary rows are wide — the stage runs with a small
``batch_size`` and the caller should raise
``DataContext.target_max_block_size`` if payloads exceed ~8 MB so
blocks aren't split pathologically small.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

try:  # decode libs absent in this environment — plumbing still real
    from PIL import Image  # type: ignore

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


def attach_payload(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Test/bench helper: synthesize a deterministic binary payload
    column from the text bytes (stand-in for real image bytes)."""

    def mk(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        payloads = [(t or "").encode("utf-8") * 3 for t in texts]
        return pa.Table.from_arrays(
            [
                batch.column(id_col),
                pa.array(payloads, type=pa.binary()),
                pa.array([len(p) for p in payloads], type=pa.int64()),
                pa.array(["application/x-fake-image"] * len(payloads)),
            ],
            names=[id_col, "payload", "n_bytes", "mime"],
        )

    return ds.map_batches(mk, batch_format="pyarrow")


class ImageFeatures:
    """Actor-pool decode + feature-extract stage.

    ``__init__`` loads the (stubbed) decoder once per actor;
    ``__call__`` processes a batch of binary payloads into fixed-size
    feature rows. With PIL present this would decode real images; the
    fake decoder reshapes the payload bytes into a uint8 grid so the
    full pipeline shape (schema in/out, memory profile) is exercised.
    """

    def __init__(self, side: int = 16):
        self.side = side
        self.have_decoder = _HAVE_PIL

    def _decode(self, payload: bytes) -> np.ndarray:
        if self.have_decoder:
            raise NotImplementedError(
                "real image decode requires PIL — not available in this container"
            )
        side = self.side
        buf = np.frombuffer(payload, dtype=np.uint8)
        need = side * side
        if len(buf) < need:
            buf = np.pad(buf, (0, need - len(buf)))
        return buf[:need].reshape(side, side)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(batch.schema.names[0])
        payloads = batch.column("payload").to_pylist()
        means = np.empty(len(payloads), dtype=np.float64)
        stds = np.empty(len(payloads), dtype=np.float64)
        edges = np.empty(len(payloads), dtype=np.float64)
        for i, p in enumerate(payloads):
            img = self._decode(p or b"")
            f = img.astype(np.float64)
            means[i] = f.mean()
            stds[i] = f.std()
            edges[i] = np.abs(np.diff(f, axis=1)).mean()
        return pa.Table.from_arrays(
            [ids, pa.array(means), pa.array(stds), pa.array(edges)],
            names=[batch.schema.names[0], "px_mean", "px_std", "edge_energy"],
        )


def image_features(ds, concurrency: int = 4, batch_size: int = 64):
    """documents-with-payload -> per-image feature rows (actor pool:
    decoder state loaded once per actor, small batches for wide rows)."""
    return ds.map_batches(
        ImageFeatures,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
