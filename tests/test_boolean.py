"""Boolean retrieval (must/should/must_not) against a brute-force
Python oracle over the same tiny corpus."""

import numpy as np
import pyarrow as pa
import pytest

from retriv_ray.config import SparseConfig
from retriv_ray.index.build import build_index
from retriv_ray.search.boolean import boolean_candidates, boolean_search_table
from retriv_ray.search.searcher import RaySparseRetriever

DOCS = [
    "red green blue",
    "red red yellow",
    "green yellow purple",
    "blue purple",
    "red blue purple yellow",
    "orange",
]


@pytest.fixture(scope="module")
def retriever(ray_session, tmp_path_factory):
    import ray.data

    tmp = tmp_path_factory.mktemp("bool_idx")
    src = str(tmp / "src")
    ray.data.from_arrow(
        pa.table(
            {
                "conv_id": [f"c{i:04d}" for i in range(len(DOCS))],
                "turn_idx": pa.array([0] * len(DOCS), type=pa.int32()),
                "text": DOCS,
            }
        )
    ).write_parquet(src)
    idx = str(tmp / "idx")
    cfg = SparseConfig(tokenizer="whitespace", stemmer=None, stopwords=None)
    build_index(src, idx, cfg, num_parts=2, resume=False)
    return RaySparseRetriever(idx, cfg)


def _brute(must=(), should=(), must_not=()):
    out = []
    for i, d in enumerate(DOCS):
        toks = set(d.split())
        if any(t not in toks for t in must):
            continue
        if not must and should and not (toks & set(should)):
            continue
        if must or should:
            if toks & set(must_not):
                continue
            out.append((i, len(toks & set(should))))
    return out


@pytest.mark.parametrize(
    "must,should,must_not",
    [
        (["red"], [], []),
        (["red", "blue"], [], []),
        (["red"], [], ["yellow"]),
        ([], ["green", "purple"], []),
        ([], ["green", "purple"], ["yellow"]),
        (["purple"], ["red", "green", "blue"], []),
        (["nosuchterm"], [], []),
        ([], ["nosuchterm"], []),
        (["red"], ["nosuchterm"], []),
        ([], [], ["red"]),  # nothing positive -> empty
    ],
)
def test_boolean_matches_brute_force(retriever, must, should, must_not):
    cand, n_should = boolean_candidates(
        retriever.index, must=must, should=should, must_not=must_not
    )
    convs, _ = retriever.index.to_original_ids(cand)
    got = [(int(c[1:]), int(n)) for c, n in zip(convs, n_should)]
    assert got == _brute(must, should, must_not)


def test_boolean_search_table_shape(retriever):
    t = boolean_search_table(
        retriever,
        {
            "qa": {"must": ["red blue"]},
            "qb": {"should": ["green purple"], "must_not": ["yellow"]},
        },
    )
    assert t.column_names == ["q_id", "conv_id", "turn_idx", "n_should"]
    rows = list(
        zip(t.column("q_id").to_pylist(), t.column("conv_id").to_pylist())
    )
    assert rows == sorted(rows)
    got_a = [c for q, c in rows if q == "qa"]
    assert got_a == ["c0000", "c0004"]
    got_b = [c for q, c in rows if q == "qb"]
    assert got_b == ["c0000", "c0003"]  # c0002/c0004 have yellow


def test_boolean_dedups_terms(retriever):
    a, na = boolean_candidates(retriever.index, should=["red", "red"])
    b, nb = boolean_candidates(retriever.index, should=["red"])
    assert np.array_equal(a, b) and np.array_equal(na, nb)


@pytest.mark.parametrize(
    "must,should,must_not,msm",
    [
        ([], ["red", "green", "blue"], [], 2),
        ([], ["red", "green", "blue"], [], 3),
        (["purple"], ["red", "green", "blue"], [], 2),
        ([], ["green", "purple"], ["yellow"], 2),
        ([], ["red", "nosuchterm"], [], 2),  # absent term can't count
        ([], ["red", "green"], [], 0),  # msm=0 keeps default behavior
    ],
)
def test_minimum_should_match(retriever, must, should, must_not, msm):
    cand, n_should = boolean_candidates(
        retriever.index,
        must=must,
        should=should,
        must_not=must_not,
        minimum_should_match=msm,
    )
    convs, _ = retriever.index.to_original_ids(cand)
    got = [(int(c[1:]), int(n)) for c, n in zip(convs, n_should)]
    want = [(i, n) for i, n in _brute(must, should, must_not) if n >= msm]
    assert got == want
    assert (n_should >= msm).all()
