"""Resumable partitioned parquet sink (ops/io.py)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from retriv_ray.ops.io import (
    read_resumable,
    resumable_write_parquet,
)


def _ds(n=500, blocks=4):
    import ray.data

    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "val": [f"v{i}" for i in range(n)],
        }
    )
    return ray.data.from_arrow(t).repartition(blocks)


def test_roundtrip_and_layout(ray_session, tmp_path):
    out = str(tmp_path / "out")
    s = resumable_write_parquet(_ds(), out, "doc_id", n_buckets=8)
    assert s["skipped"] == 0 and s["rows"] == 500
    back = read_resumable(out).to_pandas().sort_values("doc_id")
    assert list(back["doc_id"]) == list(range(500))
    assert sorted(os.listdir(out))[0] == "bucket-00000"
    assert all(
        os.path.exists(os.path.join(out, d, "_DONE"))
        for d in os.listdir(out)
        if d.startswith("bucket-")
    )


def test_resume_skips_done_buckets(ray_session, tmp_path):
    out = str(tmp_path / "out")
    resumable_write_parquet(_ds(), out, "doc_id", n_buckets=8)
    # tamper with one completed bucket: a resumed run must NOT touch it
    victim = os.path.join(out, "bucket-00003")
    sentinel = pq.read_table(os.path.join(victim, "part.parquet")).slice(0, 1)
    pq.write_table(sentinel, os.path.join(victim, "part.parquet"))
    # delete two buckets entirely (simulate the job dying mid-write)
    import shutil

    for i in (1, 6):
        shutil.rmtree(os.path.join(out, f"bucket-{i:05d}"))
    s = resumable_write_parquet(_ds(), out, "doc_id", n_buckets=8)
    assert s["written"] == 2 and s["skipped"] == 6
    # the tampered bucket kept its sentinel row -> proven untouched
    assert pq.read_table(os.path.join(victim, "part.parquet")).num_rows == 1


@pytest.mark.parametrize("blocks", [1, 7])
def test_bucket_contents_partition_independent(ray_session, tmp_path, blocks):
    a = str(tmp_path / f"a{blocks}")
    resumable_write_parquet(
        _ds(blocks=blocks), a, "doc_id", n_buckets=5,
        sort_within_bucket="doc_id",
    )
    b = str(tmp_path / f"b{blocks}")
    resumable_write_parquet(
        _ds(blocks=3), b, "doc_id", n_buckets=5, sort_within_bucket="doc_id"
    )
    for i in range(5):
        ta = pq.read_table(os.path.join(a, f"bucket-{i:05d}", "part.parquet"))
        tb = pq.read_table(os.path.join(b, f"bucket-{i:05d}", "part.parquet"))
        assert ta.equals(tb), i


def test_read_requires_completed_buckets(ray_session, tmp_path):
    with pytest.raises(FileNotFoundError):
        read_resumable(str(tmp_path))


def test_validates_buckets(ray_session, tmp_path):
    with pytest.raises(ValueError, match="n_buckets"):
        resumable_write_parquet(_ds(), str(tmp_path / "x"), "doc_id", n_buckets=0)


def test_incremental_sum_agg_folds_and_recovers(ray_session, tmp_path):
    """Delta folds match a from-scratch rebuild; unchanged inputs are
    a no-op; a torn publish (manifest/state mismatch) rebuilds."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from retriv_ray.ops.io import incremental_sum_agg

    f1 = str(tmp_path / "a.parquet")
    f2 = str(tmp_path / "b.parquet")
    pq.write_table(pa.table({"k": ["x", "y"], "v": pa.array([1, 2], pa.int64())}), f1)
    pq.write_table(pa.table({"k": ["x", "z"], "v": pa.array([10, 5], pa.int64())}), f2)
    st = str(tmp_path / "state")

    r1 = incremental_sum_agg([f1], st, ["k"], ["v"])
    assert dict(zip(r1.column("k").to_pylist(), r1.column("v").to_pylist())) == {
        "x": 1, "y": 2,
    }
    r2 = incremental_sum_agg([f1, f2], st, ["k"], ["v"])
    want = {"x": 11, "y": 2, "z": 5}
    assert dict(zip(r2.column("k").to_pylist(), r2.column("v").to_pylist())) == want
    # idempotent no-op when nothing changed
    r3 = incremental_sum_agg([f1, f2], st, ["k"], ["v"])
    assert r3.to_pydict() == r2.to_pydict()
    # torn publish: corrupt the manifest -> mismatch -> full rebuild
    man = st + "/manifest.json"
    with open(man) as f:
        m = json.load(f)
    m["bogus"] = "entry"
    with open(man, "w") as f:
        json.dump(m, f)
    r4 = incremental_sum_agg([f1, f2], st, ["k"], ["v"])
    assert dict(zip(r4.column("k").to_pylist(), r4.column("v").to_pylist())) == want


def test_incremental_sum_agg_changed_file_rebuilds(ray_session, tmp_path):
    """A previously-folded file whose content changed triggers a full
    rebuild — never a double-count."""
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from retriv_ray.ops.io import incremental_sum_agg

    f1 = str(tmp_path / "a.parquet")
    pq.write_table(pa.table({"k": ["x"], "v": pa.array([1], pa.int64())}), f1)
    st = str(tmp_path / "state")
    incremental_sum_agg([f1], st, ["k"], ["v"])
    time.sleep(0.02)
    pq.write_table(
        pa.table({"k": ["x", "y"], "v": pa.array([1, 2], pa.int64())}), f1
    )
    r = incremental_sum_agg([f1], st, ["k"], ["v"])
    assert dict(zip(r.column("k").to_pylist(), r.column("v").to_pylist())) == {
        "x": 1, "y": 2,
    }  # x folded once, not twice


def test_incremental_sum_agg_empty_inputs_no_state(ray_session, tmp_path):
    """Empty input_files with no prior state short-circuits to the
    typed-empty path instead of reaching read_parquet([])."""
    from retriv_ray.ops.io import incremental_sum_agg

    st = str(tmp_path / "state0")
    r = incremental_sum_agg([], st, ["k"], ["v"])
    assert r.num_rows == 0
    assert r.column_names == ["k", "v"]
    # and the published empty state folds correctly on the next call
    import pyarrow as pa
    import pyarrow.parquet as pq

    f1 = str(tmp_path / "a0.parquet")
    pq.write_table(
        pa.table({"k": ["x"], "v": pa.array([7], pa.int64())}), f1
    )
    r2 = incremental_sum_agg([f1], st, ["k"], ["v"])
    assert r2.to_pydict() == {"k": ["x"], "v": [7]}


def test_incremental_sum_agg_same_size_rewrite_detected(ray_session, tmp_path):
    """An in-place rewrite with identical file size must move the
    st_mtime_ns fingerprint and trigger a rebuild (stale-aggregate
    guard)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from retriv_ray.ops.io import incremental_sum_agg

    f1 = str(tmp_path / "s.parquet")
    pq.write_table(
        pa.table({"k": ["x"], "v": pa.array([1], pa.int64())}), f1
    )
    st = str(tmp_path / "state1")
    r1 = incremental_sum_agg([f1], st, ["k"], ["v"])
    assert r1.to_pydict() == {"k": ["x"], "v": [1]}
    sz = __import__("os").path.getsize(f1)
    pq.write_table(
        pa.table({"k": ["x"], "v": pa.array([9], pa.int64())}), f1
    )
    assert __import__("os").path.getsize(f1) == sz  # same size rewrite
    r2 = incremental_sum_agg([f1], st, ["k"], ["v"])
    assert r2.to_pydict() == {"k": ["x"], "v": [9]}
