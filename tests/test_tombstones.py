"""Tombstone deletion + compaction: serving masks deleted docs
immediately; compact_index output is byte-identical to a rebuild over
the survivors."""

import filecmp
import os

import numpy as np
import pyarrow as pa
import pytest

from retriv_ray.config import SparseConfig
from retriv_ray.index.build import build_index
from retriv_ray.index.tombstones import (
    compact_index,
    delete_conversations,
    deleted_doc_ranges,
    read_tombstones,
)
from retriv_ray.search.searcher import RaySparseRetriever

WORDS = ["red", "green", "blue", "yellow", "purple", "cyan"]
CFG = SparseConfig(tokenizer="whitespace", stemmer=None, stopwords=None)


def _rows(n, seed=5):
    rng = np.random.RandomState(seed)
    out = []
    for i in range(n):
        k = int(rng.randint(3, 10))
        out.append(
            {
                "conv_id": f"c{i:05d}",
                "turn_idx": 0,
                "text": " ".join(
                    WORDS[int(rng.randint(len(WORDS)))] for _ in range(k)
                ),
            }
        )
    return out


def _write(tmp, rows, name):
    import ray.data

    src = str(tmp / name)
    ray.data.from_arrow(
        pa.table(
            {
                "conv_id": [r["conv_id"] for r in rows],
                "turn_idx": pa.array([0] * len(rows), type=pa.int32()),
                "text": [r["text"] for r in rows],
            }
        )
    ).write_parquet(src)
    return src


def _tree(d):
    out = {}
    for root, _dirs, files in os.walk(d):
        for f in files:
            p = os.path.join(root, f)
            out[os.path.relpath(p, d)] = p
    return out


def test_delete_masks_serving_and_compact_equals_rebuild(ray_session, tmp_path):
    rows = _rows(40)
    deleted = {"c00003", "c00004", "c00017", "c00031"}  # incl. adjacent pair
    src = _write(tmp_path, rows, "src")
    idx = str(tmp_path / "idx")
    build_index(src, idx, CFG, num_parts=3, shard_docs=16, resume=False)

    r = RaySparseRetriever(idx, CFG)
    before = r.search("red blue", cutoff=40)
    assert any(c in deleted for c, _t in before.keys())

    n = delete_conversations(idx, deleted)
    assert n == 4
    # idempotent + accumulating
    assert delete_conversations(idx, ["c00003"]) == 4
    assert set(read_tombstones(idx)) == deleted
    starts, ends = deleted_doc_ranges(idx)
    # c00003/c00004 coalesce into one range
    assert len(starts) == 3 and (ends - starts).sum() == 4

    r.index.reload_tombstones()
    after = r.search("red blue", cutoff=40)
    assert not any(c in deleted for c, _t in after.keys())

    # compacted index == rebuild over survivors, byte for byte
    surv = [x for x in rows if x["conv_id"] not in deleted]
    rebuild_src = _write(tmp_path, surv, "surv")
    rebuilt = str(tmp_path / "rebuilt")
    build_index(rebuild_src, rebuilt, CFG, num_parts=3, shard_docs=16, resume=False)
    compacted = str(tmp_path / "compacted")
    man = compact_index(idx, compacted)
    assert man["doc_count"] == len(surv)
    t_full, t_c = _tree(rebuilt), _tree(compacted)
    for sub in ("segments", "doc_lens", "terms", "id_map"):
        keys_f = sorted(k for k in t_full if k.startswith(sub))
        keys_c = sorted(k for k in t_c if k.startswith(sub))
        assert keys_f == keys_c, (sub, keys_f, keys_c)
        for k in keys_f:
            assert filecmp.cmp(t_full[k], t_c[k], shallow=False), k

    # compacted index serves identically to the rebuild (scores too)
    rc = RaySparseRetriever(compacted, CFG)
    rr = RaySparseRetriever(rebuilt, CFG)
    for q in ["red blue", "purple cyan yellow", "green"]:
        assert rc.search(q, cutoff=20) == rr.search(q, cutoff=20)
    # ...and returns the same RESULT SET as the tombstone-masked view.
    # (Ranks may differ: the masked view scores with pre-deletion
    # corpus stats — df/avgdl still count deleted docs until
    # compaction, the standard Lucene deleted-docs semantics.)
    masked = {c for c, _t in after.keys()}
    compact_res = {c for c, _t in rc.search("red blue", cutoff=40).keys()}
    assert masked == compact_res


def test_delete_unknown_conv_is_noop(ray_session, tmp_path):
    rows = _rows(10, seed=8)
    src = _write(tmp_path, rows, "src2")
    idx = str(tmp_path / "idx2")
    build_index(src, idx, CFG, num_parts=2, resume=False)
    delete_conversations(idx, ["zz-not-there"])
    assert deleted_doc_ranges(idx) is None
    r = RaySparseRetriever(idx, CFG)
    assert len(r.search("red", cutoff=5)) > 0


def test_tombstones_in_sharded_view(ray_session, tmp_path):
    rows = _rows(30, seed=13)
    src = _write(tmp_path, rows, "src3")
    idx = str(tmp_path / "idx3")
    build_index(src, idx, CFG, num_parts=2, shard_docs=8, resume=False)
    delete_conversations(idx, ["c00001", "c00020"])
    full = RaySparseRetriever(idx, CFG)
    full.index.reload_tombstones()
    # shard views: ranges clip to local ids; union of shard results
    # must exclude deleted docs
    lo = RaySparseRetriever(idx, CFG, shard_range=(0, 1))   # docs 0..15
    hi = RaySparseRetriever(idx, CFG, shard_range=(2, 3))   # docs 16..29
    got = set()
    for rshard in (lo, hi):
        for c, _t in rshard.search("red", cutoff=30).keys():
            got.add(c)
    assert "c00001" not in got and "c00020" not in got
    full_set = {c for c, _t in full.search("red", cutoff=30).keys()}
    assert got == full_set


def test_positional_compact_equals_rebuild(ray_session, tmp_path):
    import filecmp as _fc

    from retriv_ray.index.positional import PositionalIndex, build_positional_index
    from retriv_ray.index.tombstones import compact_positional_index

    rows = _rows(36, seed=17)
    deleted = {"c00002", "c00003", "c00019"}
    src = _write(tmp_path, rows, "psrc")
    idx = str(tmp_path / "pidx")
    build_positional_index(src, idx, CFG, num_parts=3, shard_docs=16)

    delete_conversations(idx, deleted)
    px = PositionalIndex(idx)
    # masked serving first
    d0, _ = px.phrase(["red"])
    assert 2 not in d0.tolist() and 3 not in d0.tolist()

    surv = [x for x in rows if x["conv_id"] not in deleted]
    rb_src = _write(tmp_path, surv, "psurv")
    rebuilt = str(tmp_path / "prebuilt")
    build_positional_index(rb_src, rebuilt, CFG, num_parts=3, shard_docs=16)
    compacted = str(tmp_path / "pcompacted")
    man = compact_positional_index(idx, compacted)
    assert man["doc_count"] == len(surv)

    t_full, t_c = _tree(rebuilt), _tree(compacted)
    seg_f = sorted(k for k in t_full if k.startswith("segments"))
    seg_c = sorted(k for k in t_c if k.startswith("segments"))
    assert seg_f == seg_c
    for k in seg_f:
        assert _fc.cmp(t_full[k], t_c[k], shallow=False), k
    assert _fc.cmp(
        t_full["id_map/conv_offsets.parquet"],
        t_c["id_map/conv_offsets.parquet"],
        shallow=False,
    )
    pr, pc_ = PositionalIndex(rebuilt), PositionalIndex(compacted)
    for phrase in (["red", "green"], ["blue"]):
        dr, nr = pr.phrase(phrase)
        dc, nc = pc_.phrase(phrase)
        assert dr.tolist() == dc.tolist() and nr.tolist() == nc.tolist()
