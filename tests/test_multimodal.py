"""Multimodal stages: real-decode branch (monkeypatched decoder libs,
since PIL/soundfile are absent in this container), fake fallback, and
id-column explicitness (no first-column assumption)."""

import sys
import types

import numpy as np
import pyarrow as pa

import retriv_ray.ops.multimodal as mm


def _payload_batch(ids, payloads, id_col="doc_id", id_first=True):
    cols = [pa.array(ids, type=pa.int64()), pa.array(payloads, type=pa.binary())]
    names = [id_col, "payload"]
    if not id_first:
        cols, names = cols[::-1], names[::-1]
    return pa.Table.from_arrays(cols, names=names)


class _FakeDecoded:
    """Stands in for a PIL image: convert/resize chain + __array__."""

    def __init__(self, side=None):
        self.side = side

    def convert(self, mode):
        assert mode == "L"
        return self

    def resize(self, wh):
        return _FakeDecoded(side=wh[0])

    def __array__(self, dtype=None):
        s = self.side or 4
        return np.full((s, s), 7, dtype=dtype or np.uint8)


def test_image_real_decode_branch_used_when_pil_present(monkeypatch):
    opened = []

    class _FakeImageModule:
        @staticmethod
        def open(fp):
            opened.append(fp.read())
            return _FakeDecoded()

    monkeypatch.setattr(mm, "_HAVE_PIL", True)
    monkeypatch.setattr(mm, "Image", _FakeImageModule, raising=False)
    st = mm.ImageFeatures(side=4, id_col="doc_id")
    assert st.have_decoder
    out = st(_payload_batch([1, 2], [b"imgbytes1", b"imgbytes2"]))
    # real branch: every pixel 7 -> mean 7, std 0, edge 0
    assert out.column("px_mean").to_pylist() == [7.0, 7.0]
    assert out.column("px_std").to_pylist() == [0.0, 0.0]
    assert opened == [b"imgbytes1", b"imgbytes2"]


def test_image_real_branch_falls_back_on_undecodable_payload(monkeypatch):
    class _RaisingImageModule:
        @staticmethod
        def open(fp):
            raise ValueError("not an image")

    monkeypatch.setattr(mm, "_HAVE_PIL", True)
    monkeypatch.setattr(mm, "Image", _RaisingImageModule, raising=False)
    st = mm.ImageFeatures(side=4, id_col="doc_id")
    out = st(_payload_batch([1], [bytes(range(16))]))
    # fake branch: bytes 0..15 reshaped -> mean 7.5
    assert out.column("px_mean").to_pylist() == [7.5]


def test_image_id_col_not_positional(monkeypatch):
    monkeypatch.setattr(mm, "_HAVE_PIL", False)
    st = mm.ImageFeatures(side=4, id_col="doc_id")
    out = st(_payload_batch([5], [bytes(16)], id_first=False))
    assert out.column("doc_id").to_pylist() == [5]
    assert out.schema.names[0] == "doc_id"


def test_audio_real_decode_branch(monkeypatch):
    fake_sf = types.ModuleType("soundfile")

    def _read(fp, dtype="float32"):
        # stereo -> the stage must downmix to mono
        return np.ones((512, 2), dtype=np.float32), 16000

    fake_sf.read = _read
    monkeypatch.setitem(sys.modules, "soundfile", fake_sf)
    st = mm.AudioFeatures(frame=256, id_col="doc_id")
    assert st._have_decoder
    out = st(_payload_batch([9], [b"wavbytes"]))
    assert out.column("n_frames").to_pylist() == [2]
    rms = out.column("frame_rms").to_pylist()[0]
    assert all(abs(v - 1.0) < 1e-6 for v in rms)


def test_video_real_decode_branch(monkeypatch):
    class _FakeFrame:
        def __init__(self, i):
            self.time = i / 30.0
            self.planes = [bytes([i]) * 8]

    class _FakeContainer:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def decode(self, video=0):
            return iter(_FakeFrame(i) for i in range(10))

    fake_av = types.ModuleType("av")
    fake_av.open = lambda fp: _FakeContainer()
    monkeypatch.setitem(sys.modules, "av", fake_av)
    st = mm.VideoFrameSampler(every_k=5, id_col="doc_id")
    st._have_decoder = True
    out = st(_payload_batch([3], [b"mp4bytes"]))
    assert out.column("frame_idx").to_pylist() == [0, 5]
    assert out.column("doc_id").to_pylist() == [3, 3]


# ---------------------------------------------------------------------------
# dependency-free real decoders (VERDICT r3 #5): PPM/PGM, BMP, WAV
# ---------------------------------------------------------------------------


def test_decode_pnm_p6_exact():
    # 2x2 P6 with a comment line; known luma values
    raster = bytes([255, 0, 0,  0, 255, 0,  0, 0, 255,  10, 20, 30])
    payload = b"P6\n# comment\n2 2\n255\n" + raster
    img = mm.decode_pnm(payload)
    # (299R + 587G + 114B) // 1000
    want = np.array([[76, 149], [29, (10*299 + 20*587 + 30*114)//1000]], np.uint8)
    assert img.dtype == np.uint8 and np.array_equal(img, want)


def test_decode_pnm_p5_and_malformed():
    img = mm.decode_pnm(b"P5\n3 1\n255\n" + bytes([9, 8, 7]))
    assert np.array_equal(img, np.array([[9, 8, 7]], np.uint8))
    assert mm.decode_pnm(b"P6\n2 2\n255\nshort") is None  # truncated raster
    assert mm.decode_pnm(b"JFIF....") is None  # not a PNM


def test_decode_bmp_bottom_up_with_padding():
    # 2x2, 24bpp: rows padded to 4 bytes (2*3=6 -> stride 8),
    # stored bottom-up as B,G,R
    row_bottom = bytes([0, 0, 255,  0, 255, 0]) + b"\0\0"   # red, green
    row_top = bytes([255, 0, 0,  30, 20, 10]) + b"\0\0"     # blue, (10,20,30)
    raster = row_bottom + row_top
    header = (
        b"BM" + (54 + len(raster)).to_bytes(4, "little") + b"\0\0\0\0"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + (2).to_bytes(4, "little", signed=True)
        + (2).to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + bytes(20)
    )
    img = mm.decode_bmp(header + raster)
    want = np.array(
        [[29, (10*299 + 20*587 + 30*114)//1000], [76, 149]], np.uint8
    )
    assert np.array_equal(img, want)
    assert mm.decode_bmp(b"BMtooshort") is None


def test_decode_wav_roundtrip_16bit_stereo_downmix():
    import io
    import wave

    samples = np.array([1000, -1000, 32767, -32768, 0, 16384], dtype="<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(2)
        f.setsampwidth(2)
        f.setframerate(8000)
        f.writeframes(samples.tobytes())
    x = mm.decode_wav(buf.getvalue())
    want = samples.astype(np.float32).reshape(-1, 2).mean(axis=1) / 32768.0
    assert np.allclose(x, want, rtol=0, atol=0)
    assert mm.decode_wav(b"RIFFnot-a-wav") is None


def test_synth_ppm_pins_image_features_without_pil():
    """The synthesized P6 payload decodes through the REAL byte
    decoder: px_mean equals the luma of the known raster, not the
    fake's raw-byte mean."""
    seed = b"hello world"
    payload = mm.synth_ppm(seed, w=16, h=16)
    img = mm.decode_pnm(payload)
    assert img.shape == (16, 16)
    stage = mm.ImageFeatures(side=16)
    assert not stage.have_decoder  # PIL absent in this container
    out = stage(_payload_batch([1], [payload]))
    got_mean = out.column("px_mean")[0].as_py()
    assert got_mean == float(img.astype(np.float64).mean())
    # and differs from the fake branch's raw-byte mean
    fake = stage._fake_decode(payload).astype(np.float64).mean()
    assert got_mean != fake


def test_synth_wav_pins_audio_features_without_soundfile():
    payload = mm.synth_wav(b"abc", n_samples=1024, rate=16000)
    stage = mm.AudioFeatures(frame=256)
    assert not stage._have_decoder
    out = stage(_payload_batch([1], [payload]))
    assert out.column("n_frames")[0].as_py() == 4
    x = mm.decode_wav(payload)
    fr = x[:1024].reshape(4, 256)  # float32, same dtype path as the stage
    want_rms = np.sqrt((fr ** 2).mean(axis=1))
    assert np.allclose(out.column("frame_rms")[0].as_py(), want_rms, rtol=0, atol=0)
