"""Positional build over the sharded conv-map path (build.py
ConvMapResolver / compute_conv_offsets_sharded /
sharded_handle_from_slices): segments byte-identical to the broadcast
build, id_map reuse from either layout, reverse id mapping through
the manifest's conv_offsets_dir."""

import hashlib
import os
import random

import numpy as np
import pyarrow as pa
import pytest

from retriv_ray.config import SparseConfig
from retriv_ray.index.positional import (
    PositionalIndex,
    build_positional_index,
    phrase_table,
)

CFG = SparseConfig(tokenizer="whitespace", stemmer=None, stopwords=None)
VOCAB = ["alpha", "beta", "gamma", "delta", "run", "tool", "call", "ok"]


def _make_turns():
    rng = random.Random(7)
    conv_ids, turn_idx, texts = [], [], []
    for c in range(30):
        for t in range(rng.randint(1, 4)):
            conv_ids.append(f"conv{c:04d}")
            turn_idx.append(t)
            texts.append(
                " ".join(rng.choice(VOCAB) for _ in range(rng.randint(3, 12)))
            )
    return pa.table(
        {
            "conv_id": conv_ids,
            "turn_idx": pa.array(turn_idx, type=pa.int32()),
            "text": texts,
        }
    )


def _write_src(tmp_path):
    import ray.data

    src = str(tmp_path / "src")
    ray.data.from_arrow(_make_turns()).write_parquet(src)
    return src


def _seg_digest(idx: str) -> str:
    h = hashlib.sha256()
    segdir = os.path.join(idx, "segments")
    for f in sorted(os.listdir(segdir)):
        h.update(f.encode())
        with open(os.path.join(segdir, f), "rb") as fh:
            h.update(fh.read())
    return h.hexdigest()


def test_sharded_conv_map_byte_identical(ray_session, tmp_path, monkeypatch):
    src = _write_src(tmp_path)
    idx_a = str(tmp_path / "idx_bcast")
    build_positional_index(src, idx_a, CFG, num_parts=3, shard_docs=16)
    assert os.path.exists(
        os.path.join(idx_a, "id_map", "conv_offsets.parquet")
    )

    monkeypatch.setenv("GRAFT_CONV_MAP", "sharded")
    monkeypatch.setenv("GRAFT_CONV_BUCKETS", "3")
    idx_b = str(tmp_path / "idx_sharded")
    m_b = build_positional_index(src, idx_b, CFG, num_parts=3, shard_docs=16)

    # sharded build writes slice parquets, not the single file
    slices = [
        f
        for f in os.listdir(os.path.join(idx_b, "id_map"))
        if f.startswith("conv_offsets-")
    ]
    assert len(slices) >= 2
    assert not os.path.exists(
        os.path.join(idx_b, "id_map", "conv_offsets.parquet")
    )
    assert m_b["conv_offsets_dir"] == idx_b
    assert _seg_digest(idx_a) == _seg_digest(idx_b)

    # reverse id mapping resolves through the slice layout
    pi_a, pi_b = PositionalIndex(idx_a), PositionalIndex(idx_b)
    docs_a, n_a = pi_a.phrase(["alpha", "beta"])
    docs_b, n_b = pi_b.phrase(["alpha", "beta"])
    np.testing.assert_array_equal(docs_a, docs_b)
    np.testing.assert_array_equal(n_a, n_b)
    assert len(docs_a) > 0
    conv_a, t_a = pi_a.to_original_ids(docs_a)
    conv_b, t_b = pi_b.to_original_ids(docs_b)
    np.testing.assert_array_equal(conv_a, conv_b)
    np.testing.assert_array_equal(t_a, t_b)


def test_reuse_sharded_source_id_map(ray_session, tmp_path, monkeypatch):
    src = _write_src(tmp_path)
    idx_a = str(tmp_path / "idx_bcast")
    build_positional_index(src, idx_a, CFG, num_parts=2, shard_docs=32)

    # sharded-handle reuse over a SINGLE-parquet source layout
    monkeypatch.setenv("GRAFT_CONV_MAP", "sharded")
    idx_b = str(tmp_path / "idx_reuse_single")
    m_b = build_positional_index(
        src, idx_b, CFG, num_parts=2, shard_docs=32, conv_offsets_source=idx_a
    )
    assert m_b["conv_offsets_dir"] == os.path.abspath(idx_a)
    assert _seg_digest(idx_a) == _seg_digest(idx_b)

    # sharded-handle reuse over a MULTI-slice source layout
    monkeypatch.setenv("GRAFT_CONV_BUCKETS", "4")
    idx_c = str(tmp_path / "idx_sharded_own")
    build_positional_index(src, idx_c, CFG, num_parts=2, shard_docs=32)
    monkeypatch.delenv("GRAFT_CONV_BUCKETS")
    idx_d = str(tmp_path / "idx_reuse_slices")
    m_d = build_positional_index(
        src, idx_d, CFG, num_parts=2, shard_docs=32, conv_offsets_source=idx_c
    )
    assert m_d["conv_offsets_dir"] == os.path.abspath(idx_c)
    assert _seg_digest(idx_a) == _seg_digest(idx_d)

    # phrase results + reverse mapping agree across all four layouts
    pis = [PositionalIndex(p) for p in (idx_a, idx_b, idx_d)]
    ref_docs, ref_n = pis[0].phrase(["run", "tool"])
    ref_conv, ref_t = pis[0].to_original_ids(ref_docs)
    for pi in pis[1:]:
        docs, n = pi.phrase(["run", "tool"])
        np.testing.assert_array_equal(docs, ref_docs)
        np.testing.assert_array_equal(n, ref_n)
        conv, t = pi.to_original_ids(docs)
        np.testing.assert_array_equal(conv, ref_conv)
        np.testing.assert_array_equal(t, ref_t)


def test_broadcast_reuse_unchanged(ray_session, tmp_path):
    """Default-mode reuse (single parquet, no env) still broadcasts
    and copies the id_map locally — the round-3 behavior."""
    src = _write_src(tmp_path)
    idx_a = str(tmp_path / "idx_a")
    build_positional_index(src, idx_a, CFG, num_parts=2, shard_docs=32)
    idx_b = str(tmp_path / "idx_b")
    m_b = build_positional_index(
        src, idx_b, CFG, num_parts=2, shard_docs=32, conv_offsets_source=idx_a
    )
    assert m_b["conv_offsets_dir"] is None
    assert os.path.exists(
        os.path.join(idx_b, "id_map", "conv_offsets.parquet")
    )
    assert _seg_digest(idx_a) == _seg_digest(idx_b)


def test_phrase_table_on_sharded_index(ray_session, tmp_path, monkeypatch):
    """The Dataset-level phrase_table op works over a sharded-map
    positional index (conv ids resolved via conv_offsets_dir)."""
    src = _write_src(tmp_path)
    monkeypatch.setenv("GRAFT_CONV_MAP", "sharded")
    monkeypatch.setenv("GRAFT_CONV_BUCKETS", "3")
    idx = str(tmp_path / "idx")
    build_positional_index(src, idx, CFG, num_parts=2, shard_docs=32)
    out = phrase_table(
        PositionalIndex(idx), {"q0": "alpha beta", "q1": "run tool"}
    )
    assert out.num_rows > 0
    assert set(out.column_names) >= {"conv_id", "turn_idx"}
