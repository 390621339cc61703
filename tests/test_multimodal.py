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
