"""Score-safety of block-max pruned BM25: top-k ids AND scores must be
IDENTICAL to the exhaustive kernel for every query/hyperparam mix
(the WAND exactness guarantee, retriv_ray/search/pruned.py)."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from retriv_ray.config import SparseConfig
from retriv_ray.index.build import build_index
from retriv_ray.search.searcher import RaySparseRetriever
from retriv_ray.sources.transcripts import transcripts_table


@pytest.fixture(scope="module")
def index_dir(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("pruned")
    src = os.path.join(d, "t.parquet")
    pq.write_table(transcripts_table(1200, seed=9, profile="heavy"), src)
    idx = os.path.join(d, "idx")
    build_index(src, idx, SparseConfig(), num_parts=4)
    return idx


@pytest.mark.parametrize(
    "hyper", [dict(b=0.75, k1=1.2), dict(b=0.3, k1=0.5), dict(b=1.0, k1=4.0)]
)
@pytest.mark.parametrize("cutoff", [5, 37, 100])
def test_pruned_equals_exhaustive(index_dir, hyper, cutoff):
    from retriv_ray.sources.transcripts import _VOCAB_HEAVY

    on = RaySparseRetriever(
        index_dir, SparseConfig(hyperparams=dict(hyper), use_block_max=True)
    )
    off = RaySparseRetriever(
        index_dir, SparseConfig(hyperparams=dict(hyper), use_block_max=False)
    )
    rng = np.random.default_rng(41)
    pruned_hits = 0
    for i in range(40):
        k = int(rng.integers(1, 5))
        terms = rng.choice(
            np.asarray(_VOCAB_HEAVY, dtype=object), size=k, replace=False
        )
        q = " ".join(terms)
        a = on.search(q, cutoff=cutoff)
        b_res = off.search(q, cutoff=cutoff)
        assert list(a.keys()) == list(b_res.keys()), q
        av, bv = list(a.values()), list(b_res.values())
        assert av == bv, (q, av[:3], bv[:3])
        pruned_hits += 1
    assert pruned_hits == 40


def test_pruned_path_actually_prunes(index_dir):
    """At least some queries must take the pruned path and skip real
    blocks (otherwise the test above proves nothing)."""
    from retriv_ray.search import pruned as P

    r = RaySparseRetriever(index_dir, SparseConfig(use_block_max=True))
    taken = {"n": 0}
    orig = P.bm25_pruned

    def spy(*a, **k):
        out = orig(*a, **k)
        if out is not None:
            taken["n"] += 1
        return out

    P.bm25_pruned = spy  # searcher imports it at call time
    try:
        for q in ["tok0001 running the file", "error test deployment", "tok0100 tok0200 code"]:
            r.search(q, cutoff=5)
    finally:
        P.bm25_pruned = orig
    assert taken["n"] >= 1
