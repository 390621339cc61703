"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with metadata
columns alongside (mime, width/height or sample_rate, n_bytes). Each
stage decodes for real when its library (PIL / soundfile / PyAV) is
importable and the payload is decodable, and falls back to a
deterministic fake (payload bytes -> uint8 grid / PCM / byte-chunk
frames) otherwise — never raising on decoder presence. The libraries
are absent in this container, so tests exercise the real branch via a
monkeypatched decoder; the Ray-side plumbing (actor-pool stage, small
batch sizes for wide rows, Arrow binary round-trip, output schema) is
identical on both branches.

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

    ``__init__`` loads the decoder once per actor; ``__call__``
    processes a batch of binary payloads into fixed-size feature
    rows. With PIL present, payloads are decoded as real images
    (grayscale, resized to ``side``x``side``); without it — or when a
    payload isn't a decodable image — the deterministic fake reshapes
    the payload bytes into a uint8 grid, so the full pipeline shape
    (schema in/out, memory profile) is exercised either way.
    """

    def __init__(self, side: int = 16, id_col: str = "doc_id"):
        self.side = side
        self.id_col = id_col
        self.have_decoder = _HAVE_PIL

    def _fake_decode(self, payload: bytes) -> np.ndarray:
        side = self.side
        buf = np.frombuffer(payload, dtype=np.uint8)
        need = side * side
        if len(buf) < need:
            buf = np.pad(buf, (0, need - len(buf)))
        return buf[:need].reshape(side, side)

    def _decode(self, payload: bytes) -> np.ndarray:
        if self.have_decoder:
            import io

            try:
                img = Image.open(io.BytesIO(payload))
                img = img.convert("L").resize((self.side, self.side))
                return np.asarray(img, dtype=np.uint8)
            except Exception:
                # not a decodable image (e.g. the synthetic payloads) —
                # fall through to the deterministic fake
                pass
        return self._fake_decode(payload)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col)
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
            names=[self.id_col, "px_mean", "px_std", "edge_energy"],
        )


def image_features(ds, concurrency: int = 4, batch_size: int = 64, id_col: str = "doc_id"):
    """documents-with-payload -> per-image feature rows (actor pool:
    decoder state loaded once per actor, small batches for wide rows)."""
    return ds.map_batches(
        ImageFeatures,
        fn_constructor_kwargs=dict(id_col=id_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class AudioFeatures:
    """Actor-pool audio decode + frame-level feature stage.

    Mirrors :class:`ImageFeatures` for audio payloads: the real
    decoder (torchaudio / soundfile, absent here) is gated behind an
    import-try; the deterministic fake treats payload bytes as int16
    PCM and computes real windowed features (RMS energy + zero
    crossings per frame) so the Ray-side plumbing — actor signature,
    frame windowing, list-column output — is exercised end to end.
    """

    def __init__(self, frame: int = 256, sample_rate: int = 16000, id_col: str = "doc_id"):
        try:  # pragma: no cover - not present in this container
            import soundfile  # type: ignore  # noqa: F401

            self._have_decoder = True
        except ImportError:
            self._have_decoder = False
        self.frame = frame
        self.sample_rate = sample_rate
        self.id_col = id_col

    def _decode_pcm(self, payload: bytes) -> np.ndarray:
        if self._have_decoder:  # pragma: no cover - soundfile absent here
            import io

            try:
                import soundfile  # type: ignore

                data, _sr = soundfile.read(io.BytesIO(payload), dtype="float32")
                if data.ndim > 1:  # downmix to mono
                    data = data.mean(axis=1)
                return np.asarray(data, dtype=np.float32)
            except Exception:
                pass  # not a decodable container — deterministic fake below
        buf = payload[: (len(payload) // 2) * 2]
        return np.frombuffer(buf, dtype="<i2").astype(np.float32) / 32768.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col)
        payloads = batch.column("payload").to_pylist()
        rms_rows, zc_rows, n_frames = [], [], []
        for p in payloads:
            x = self._decode_pcm(p or b"")
            n = len(x) // self.frame
            if n == 0:
                rms_rows.append([]); zc_rows.append([]); n_frames.append(0)
                continue
            fr = x[: n * self.frame].reshape(n, self.frame)
            rms_rows.append(np.sqrt((fr ** 2).mean(axis=1)).tolist())
            zc_rows.append(
                (np.abs(np.diff(np.signbit(fr), axis=1)).sum(axis=1)).astype(
                    np.int64
                ).tolist()
            )
            n_frames.append(n)
        return pa.Table.from_arrays(
            [
                ids,
                pa.array(n_frames, type=pa.int64()),
                pa.array(rms_rows, type=pa.list_(pa.float64())),
                pa.array(zc_rows, type=pa.list_(pa.int64())),
            ],
            names=[self.id_col, "n_frames", "frame_rms", "frame_zero_crossings"],
        )


def audio_features(ds, concurrency: int = 4, batch_size: int = 32, id_col: str = "doc_id"):
    """Audio payloads -> per-frame features (actor pool; small batches
    because binary rows are wide)."""
    return ds.map_batches(
        AudioFeatures,
        fn_constructor_kwargs=dict(id_col=id_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class VideoFrameSampler:
    """Actor-pool frame-sampling stage for video payloads.

    Real decode (PyAV) is gated; the fake treats the payload as a
    byte stream of fixed-size "frames" and samples every k-th one,
    emitting per-sampled-frame byte offsets + digests — the shape a
    real frame sampler produces (frame index, timestamp, thumbnail
    bytes) without the codec dependency.
    """

    def __init__(
        self,
        frame_bytes: int = 1024,
        every_k: int = 10,
        fps: float = 30.0,
        id_col: str = "doc_id",
    ):
        try:  # pragma: no cover
            import av  # type: ignore  # noqa: F401

            self._have_decoder = True
        except ImportError:
            self._have_decoder = False
        self.frame_bytes = frame_bytes
        self.every_k = every_k
        self.fps = fps
        self.id_col = id_col

    def _sample(self, payload: bytes):
        """Yield (frame_idx, ts_sec, frame_bytes) every k-th frame —
        real container decode when PyAV is present, byte-chunk fake
        otherwise (never raises on decoder presence)."""
        if self._have_decoder:  # pragma: no cover - av absent here
            import io

            try:
                import av  # type: ignore

                with av.open(io.BytesIO(payload)) as container:
                    for fi, frame in enumerate(container.decode(video=0)):
                        if fi % self.every_k == 0:
                            ts = float(frame.time) if frame.time is not None else fi / self.fps
                            yield fi, ts, bytes(frame.planes[0])
                return
            except Exception:
                pass  # undecodable container — deterministic fake below
        n_frames = len(payload) // self.frame_bytes
        for fi in range(0, n_frames, self.every_k):
            chunk = payload[fi * self.frame_bytes : (fi + 1) * self.frame_bytes]
            yield fi, fi / self.fps, chunk

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        id_name = self.id_col
        ids = batch.column(id_name).to_pylist()
        payloads = batch.column("payload").to_pylist()
        out_id, out_fi, out_ts, out_dg = [], [], [], []
        for d, p in zip(ids, payloads):
            for fi, ts, chunk in self._sample(p or b""):
                out_id.append(d)
                out_fi.append(fi)
                out_ts.append(ts)
                out_dg.append(hashlib.blake2b(chunk, digest_size=8).hexdigest())
        return pa.Table.from_arrays(
            [
                pa.array(out_id),
                pa.array(out_fi, type=pa.int64()),
                pa.array(out_ts, type=pa.float64()),
                pa.array(out_dg, type=pa.string()),
            ],
            names=[id_name, "frame_idx", "ts_sec", "frame_digest"],
        )


def video_frame_samples(
    ds, every_k: int = 10, concurrency: int = 4, batch_size: int = 16, id_col: str = "doc_id"
):
    """Video payloads -> sampled frame rows (flat_map-style expansion
    inside an actor pool)."""
    return ds.map_batches(
        VideoFrameSampler,
        fn_constructor_kwargs=dict(every_k=every_k, id_col=id_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
