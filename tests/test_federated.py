"""Federated multi-index search (search/federated.py): local
(query_then_fetch) vs global (dfs_query_then_fetch) stats, and the
global-mode == monolithic invariant."""

import numpy as np
import pyarrow as pa
import pytest

from retriv_ray.config import SparseConfig
from retriv_ray.index.build import build_index
from retriv_ray.search.federated import federated_msearch, federated_search
from retriv_ray.search.searcher import RaySparseRetriever

DOCS = [
    "alpha beta gamma",
    "alpha alpha delta",
    "beta beta beta epsilon",
    "gamma delta",
    "alpha beta",
    "delta delta epsilon zeta",
    "zeta alpha",
    "beta gamma delta epsilon",
]


def _build(tmp, name, rows):
    import ray.data

    src = str(tmp / f"src_{name}")
    tbl = pa.table(
        {
            "conv_id": [f"c{i:03d}" for i, _ in rows],
            "turn_idx": pa.array([0] * len(rows), type=pa.int32()),
            "text": [t for _, t in rows],
        }
    )
    ray.data.from_arrow(tbl).write_parquet(src)
    idx = str(tmp / f"idx_{name}")
    cfg = SparseConfig(
        tokenizer="whitespace", stemmer=None, stopwords=None,
        score_dtype="float64",
    )
    build_index(src, idx, cfg, num_parts=2, resume=False)
    return RaySparseRetriever(idx, cfg)


@pytest.fixture(scope="module")
def setup(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("fed")
    rows = list(enumerate(DOCS))
    mono = _build(tmp, "mono", rows)
    a = _build(tmp, "a", [r for r in rows if r[0] % 2 == 0])
    b = _build(tmp, "b", [r for r in rows if r[0] % 2 == 1])
    return mono, a, b


def _rows(t):
    return list(
        zip(
            t.column("conv_id").to_pylist(),
            t.column("rank").to_pylist(),
            [round(s, 9) for s in t.column("score").to_pylist()],
        )
    )


def test_global_mode_equals_monolithic(setup):
    mono, a, b = setup
    for q in ("alpha beta", "delta", "epsilon zeta alpha", "beta beta"):
        got = federated_search([a, b], q, cutoff=10, mode="global")
        want = federated_search([mono], q, cutoff=10, mode="global")
        assert _rows(got) == _rows(want), q
        # and bit-identical scores, not just rounded
        assert got.column("score").to_pylist() == want.column(
            "score"
        ).to_pylist()


def test_local_mode_uses_per_index_stats(setup):
    mono, a, b = setup
    got = federated_search([a, b], "alpha", cutoff=10, mode="local")
    glob = federated_search([a, b], "alpha", cutoff=10, mode="global")
    # same matching docs either way
    assert sorted(got.column("conv_id").to_pylist()) == sorted(
        glob.column("conv_id").to_pylist()
    )
    # but different scores (df(alpha) differs between the splits)
    assert got.column("score").to_pylist() != glob.column(
        "score"
    ).to_pylist()


def test_local_mode_matches_per_index_bruteforce(setup):
    _mono, a, b = setup
    import math

    q = "alpha delta"
    got = federated_search([a, b], q, cutoff=10, mode="local")
    want = {}
    for sub in ([r for r in enumerate(DOCS) if r[0] % 2 == 0],
                [r for r in enumerate(DOCS) if r[0] % 2 == 1]):
        texts = [t.split() for _, t in sub]
        n = len(texts)
        avgdl = sum(map(len, texts)) / n
        for (i, _), toks in zip(sub, texts):
            s = 0.0
            for term in q.split():
                tf = toks.count(term)
                if not tf:
                    continue
                df = sum(term in t for t in texts)
                idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
                s += idf * tf * 2.2 / (
                    tf + 1.2 * (1 - 0.75 + 0.75 * len(toks) / avgdl)
                )
            if s:
                want[f"c{i:03d}"] = s
    got_map = dict(
        zip(got.column("conv_id").to_pylist(), got.column("score").to_pylist())
    )
    assert set(got_map) == set(want)
    for k in want:
        assert got_map[k] == pytest.approx(want[k], rel=1e-12)


def test_cross_index_tiebreak_and_msearch(setup):
    _mono, a, b = setup
    t = federated_msearch([a, b], {"q1": "alpha", "q2": "nosuchterm"})
    qs = t.column("q_id").to_pylist()
    assert "q2" not in qs
    ranks = [r for q, r in zip(qs, t.column("rank").to_pylist()) if q == "q1"]
    assert ranks == list(range(1, len(ranks) + 1))
    scores = [
        s for q, s in zip(qs, t.column("score").to_pylist()) if q == "q1"
    ]
    assert scores == sorted(scores, reverse=True)


def test_bad_mode_raises(setup):
    _mono, a, b = setup
    with pytest.raises(ValueError):
        federated_search([a, b], "alpha", mode="both")
