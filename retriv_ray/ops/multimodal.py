"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with metadata
columns alongside (mime, width/height or sample_rate, n_bytes).

Decode is LAYERED per payload, never raising on decoder presence:
1. third-party decoders (PIL / soundfile / PyAV) when importable —
   absent in this container, exercised in tests via monkeypatching;
2. dependency-free REAL decoders for self-describing formats: binary
   PPM/PGM (P6/P5) and uncompressed BMP for images (pure numpy over
   the raster bytes), RIFF/WAV via stdlib ``wave`` for audio — so the
   image and audio stages compute features from genuinely decoded
   bytes in this environment;
3. a deterministic fake (payload bytes -> uint8 grid / PCM /
   byte-chunk frames) only for formats that genuinely need the
   third-party codecs (JPEG/PNG/MP3/MP4...).

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


# ---------------------------------------------------------------------------
# dependency-free decoders (real byte-level decode, no third-party libs)
# ---------------------------------------------------------------------------


def _ppm_tokens(payload: bytes, pos: int, want: int):
    """Read ``want`` whitespace-separated ASCII integer tokens from a
    PNM header starting at ``pos``, honoring ``#`` comments. Returns
    (values, pos_after_single_whitespace) or None on malformed input."""
    vals = []
    n = len(payload)
    while len(vals) < want:
        while pos < n and payload[pos : pos + 1].isspace():
            pos += 1
        if pos < n and payload[pos] == 0x23:  # '#' comment to EOL
            while pos < n and payload[pos] not in (0x0A, 0x0D):
                pos += 1
            continue
        start = pos
        while pos < n and payload[pos : pos + 1].isdigit():
            pos += 1
        if pos == start:
            return None
        vals.append(int(payload[start:pos]))
    # exactly ONE whitespace byte separates the header from the raster
    if pos >= n or not payload[pos : pos + 1].isspace():
        return None
    return vals, pos + 1


def decode_pnm(payload: bytes) -> Optional[np.ndarray]:
    """Binary PPM (P6) / PGM (P5) -> grayscale uint8 [h, w], decoded
    with numpy over the raster bytes. P6 converts via the ITU-R 601
    integer luma PIL's ``convert("L")`` uses: (299R + 587G + 114B) //
    1000. Returns None when the payload isn't a binary PNM (caller
    falls through to the next decoder)."""
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        return None
    got = _ppm_tokens(payload, 2, 3)
    if got is None:
        return None
    (w, h, maxval), pos = got
    if not (0 < w and 0 < h and 0 < maxval < 256):
        return None
    ch = 3 if magic == b"P6" else 1
    need = w * h * ch
    raster = np.frombuffer(payload, dtype=np.uint8, count=-1, offset=pos)
    if len(raster) < need:
        return None
    raster = raster[:need]
    if ch == 1:
        return raster.reshape(h, w)
    rgb = raster.reshape(h, w, 3).astype(np.uint32)
    return (
        (rgb[..., 0] * 299 + rgb[..., 1] * 587 + rgb[..., 2] * 114) // 1000
    ).astype(np.uint8)


def decode_bmp(payload: bytes) -> Optional[np.ndarray]:
    """Uncompressed 24/32-bit BI_RGB BMP -> grayscale uint8 [h, w]
    (same integer luma as :func:`decode_pnm`). Handles bottom-up and
    top-down rasters and 4-byte row padding. Returns None when the
    payload isn't such a BMP."""
    if payload[:2] != b"BM" or len(payload) < 54:
        return None
    off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if compression != 0 or bpp not in (24, 32) or w <= 0 or h == 0:
        return None
    top_down = h < 0
    h = abs(h)
    nb = bpp // 8
    stride = ((w * nb + 3) // 4) * 4
    need = stride * h
    if off + need > len(payload):
        return None
    rows = np.frombuffer(payload, dtype=np.uint8, count=need, offset=off)
    rows = rows.reshape(h, stride)[:, : w * nb].reshape(h, w, nb)
    if not top_down:
        rows = rows[::-1]
    bgr = rows[..., :3].astype(np.uint32)  # BMP stores B,G,R
    return (
        (bgr[..., 2] * 299 + bgr[..., 1] * 587 + bgr[..., 0] * 114) // 1000
    ).astype(np.uint8)


def decode_wav(payload: bytes) -> Optional[np.ndarray]:
    """RIFF/WAV -> float32 mono samples in [-1, 1) via stdlib ``wave``
    (8/16/32-bit integer PCM; channels downmixed by mean). Returns
    None when the payload isn't a WAV the stdlib parses."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(payload)) as f:
            nch, sw = f.getnchannels(), f.getsampwidth()
            raw = f.readframes(f.getnframes())
    except (wave.Error, EOFError, OSError):
        return None
    if sw == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif sw == 1:  # 8-bit WAV is unsigned
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif sw == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    else:
        return None
    if nch > 1:
        x = x[: len(x) // nch * nch].reshape(-1, nch).mean(axis=1)
    return x


def _resize_nearest(img: np.ndarray, side: int) -> np.ndarray:
    """Deterministic nearest-neighbor resample to side x side."""
    h, w = img.shape
    yi = (np.arange(side) * h) // side
    xi = (np.arange(side) * w) // side
    return img[yi][:, xi]


# ---------------------------------------------------------------------------
# deterministic payload synthesis (fixtures / bench inputs)
# ---------------------------------------------------------------------------


def synth_ppm(seed: bytes, w: int = 16, h: int = 16) -> bytes:
    """A real binary P6 PPM whose raster repeats ``seed`` bytes."""
    need = w * h * 3
    pat = np.frombuffer((seed or b"\0") * (need // max(len(seed), 1) + 1), np.uint8)
    return b"P6\n%d %d\n255\n" % (w, h) + pat[:need].tobytes()


def synth_wav(seed: bytes, n_samples: int = 2048, rate: int = 16000) -> bytes:
    """A real 16-bit mono WAV whose samples derive from ``seed``."""
    import io
    import wave

    pat = np.frombuffer(
        (seed or b"\0") * (2 * n_samples // max(len(seed), 1) + 2), np.uint8
    )[: 2 * n_samples]
    samples = (pat.astype(np.int16) - 128) * 256
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(samples[:n_samples].astype("<i2").tobytes())
    return buf.getvalue()


def attach_payload(
    ds, text_col: str = "text", id_col: str = "doc_id", kind: str = "ppm"
):
    """Test/bench helper: synthesize a deterministic binary payload
    column from the text bytes. ``kind="ppm"`` (default) emits REAL
    binary P6 images so the image stage exercises genuine byte-level
    decode; ``kind="wav"`` emits real RIFF/WAV; ``kind="raw"`` keeps
    the opaque-bytes stand-in."""

    def mk(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        if kind == "ppm":
            payloads = [synth_ppm((t or " ").encode("utf-8")) for t in texts]
            mime = "image/x-portable-pixmap"
        elif kind == "wav":
            payloads = [synth_wav((t or " ").encode("utf-8")) for t in texts]
            mime = "audio/wav"
        else:
            payloads = [(t or "").encode("utf-8") * 3 for t in texts]
            mime = "application/octet-stream"
        return pa.Table.from_arrays(
            [
                batch.column(id_col),
                pa.array(payloads, type=pa.binary()),
                pa.array([len(p) for p in payloads], type=pa.int64()),
                pa.array([mime] * len(payloads)),
            ],
            names=[id_col, "payload", "n_bytes", "mime"],
        )

    return ds.map_batches(mk, batch_format="pyarrow")


class ImageFeatures:
    """Actor-pool decode + feature-extract stage.

    ``__init__`` loads the decoder once per actor; ``__call__``
    processes a batch of binary payloads into fixed-size feature
    rows. Decode layering: PIL when importable, then the dependency-
    free PPM/PGM and BMP byte decoders (real decode in this
    container), then — only for formats that genuinely need PIL — the
    deterministic fake that reshapes payload bytes into a uint8 grid,
    so the full pipeline shape (schema in/out, memory profile) is
    exercised on every branch.
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
                # not a PIL-decodable image — try the stdlib formats
                pass
        # dependency-free real decode: binary PPM/PGM, then BMP
        img = decode_pnm(payload)
        if img is None:
            img = decode_bmp(payload)
        if img is not None:
            return _resize_nearest(img, self.side)
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
                pass  # not a soundfile container — try stdlib wave
        x = decode_wav(payload)  # real RIFF/WAV decode, no third-party libs
        if x is not None:
            return x
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
        # ceil: a trailing partial chunk is still a frame, so payloads
        # shorter than frame_bytes sample one frame instead of zero
        n_frames = -(-len(payload) // self.frame_bytes)
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
