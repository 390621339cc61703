"""Index resharding (index/reshard.py): byte-identical to a fresh
build at the target part count, search-equivalent, tombstones carried.
"""

import filecmp
import os

import numpy as np
import pyarrow as pa
import pytest

from retriv_ray.config import SparseConfig
from retriv_ray.index.build import build_index
from retriv_ray.index.reshard import reshard_index
from retriv_ray.search.searcher import RaySparseRetriever

N_DOCS = 120


def _mk_source(tmp):
    import ray.data

    rng = np.random.default_rng(11)
    words = [f"w{i:02d}" for i in range(60)] + ["shared", "üben"]
    texts = [
        " ".join(rng.choice(words, size=rng.integers(3, 20)))
        for _ in range(N_DOCS)
    ]
    src = str(tmp / "src")
    tbl = pa.table(
        {
            "conv_id": [f"c{i:04d}" for i in range(N_DOCS)],
            "turn_idx": pa.array([0] * N_DOCS, type=pa.int32()),
            "text": texts,
        }
    )
    ray.data.from_arrow(tbl).write_parquet(src)
    return src


@pytest.fixture(scope="module")
def setup(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("reshard")
    src = _mk_source(tmp)
    cfg = SparseConfig(tokenizer="whitespace", stemmer=None, stopwords=None)
    built = {}
    for p in (5, 3, 1):
        d = str(tmp / f"idx_p{p}")
        build_index(src, d, cfg, num_parts=p, resume=False, shard_docs=64)
        built[p] = d
    return tmp, cfg, built


def _tree_files(d, sub):
    root = os.path.join(d, sub)
    return sorted(os.listdir(root)) if os.path.isdir(root) else []


@pytest.mark.parametrize("target", [3, 1])
def test_reshard_byte_identical_to_fresh_build(setup, target):
    tmp, cfg, built = setup
    out = str(tmp / f"resharded_5_to_{target}")
    man = reshard_index(built[5], out, target)
    assert man["num_parts"] == target and man["complete"]
    fresh = built[target]
    for sub in ("segments", "terms", "doc_lens", "id_map"):
        got, want = _tree_files(out, sub), _tree_files(fresh, sub)
        assert got == want, (sub, got, want)
        for name in got:
            assert filecmp.cmp(
                os.path.join(out, sub, name),
                os.path.join(fresh, sub, name),
                shallow=False,
            ), (sub, name)
    fm = RaySparseRetriever(fresh, cfg).index
    rm = RaySparseRetriever(out, cfg).index
    assert fm.doc_count == rm.doc_count


def test_reshard_search_equivalent_and_upshard(setup):
    tmp, cfg, built = setup
    out = str(tmp / "resharded_3_to_7")
    reshard_index(built[3], out, 7)
    a = RaySparseRetriever(built[3], cfg)
    b = RaySparseRetriever(out, cfg)
    for q in ("w01 w02 shared", "üben w59", "w10"):
        ra = a.search(q, cutoff=20)
        rb = b.search(q, cutoff=20)
        assert list(ra.items()) == list(rb.items())


def test_reshard_carries_tombstones(setup):
    tmp, cfg, built = setup
    from retriv_ray.index.tombstones import delete_conversations

    src_idx = str(tmp / "tomb_src")
    import shutil

    shutil.copytree(built[3], src_idx)
    delete_conversations(src_idx, ["c0001", "c0002"])
    out = str(tmp / "tomb_resharded")
    reshard_index(src_idx, out, 2)
    from retriv_ray.index.tombstones import read_tombstones

    assert sorted(read_tombstones(out)) == ["c0001", "c0002"]


def test_reshard_rejects_incomplete(setup):
    tmp, cfg, built = setup
    import json
    import shutil

    bad = str(tmp / "incomplete")
    shutil.copytree(built[1], bad)
    with open(os.path.join(bad, "manifest.json")) as f:
        man = json.load(f)
    man["complete"] = False
    with open(os.path.join(bad, "manifest.json"), "w") as f:
        json.dump(man, f)
    with pytest.raises(ValueError):
        reshard_index(bad, str(tmp / "nope"), 2)
