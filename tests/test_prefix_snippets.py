"""Prefix term expansion + KWIC snippet extraction."""

import numpy as np
import pyarrow as pa
import pytest

from retriv_ray.config import SparseConfig
from retriv_ray.index.build import build_index
from retriv_ray.search.prefix import (
    prefix_doc_counts,
    prefix_search_table,
    prefix_terms,
)
from retriv_ray.search.searcher import RaySparseRetriever
from retriv_ray.search.snippets import kwic_snippets

DOCS = [
    "alpha alarm beta albatross",
    "beta gamma albedo",
    "delta alpha alpha",
    "zeta eta theta",
    "albedo albino al",
]


@pytest.fixture(scope="module")
def setup(ray_session, tmp_path_factory):
    import ray.data

    tmp = tmp_path_factory.mktemp("prefix_idx")
    src = str(tmp / "src")
    tbl = pa.table(
        {
            "conv_id": [f"c{i:03d}" for i in range(len(DOCS))],
            "turn_idx": pa.array([0] * len(DOCS), type=pa.int32()),
            "text": DOCS,
        }
    )
    ray.data.from_arrow(tbl).write_parquet(src)
    idx = str(tmp / "idx")
    cfg = SparseConfig(tokenizer="whitespace", stemmer=None, stopwords=None)
    build_index(src, idx, cfg, num_parts=3, resume=False)
    ds = ray.data.from_arrow(tbl)
    return RaySparseRetriever(idx, cfg), ds


def _brute_prefix(prefix):
    out = {}
    for i, d in enumerate(DOCS):
        n = len({t for t in d.split() if t.startswith(prefix)})
        if n:
            out[i] = n
    return out


@pytest.mark.parametrize("prefix", ["al", "alb", "a", "beta", "x", "albatross"])
def test_prefix_terms_and_counts(setup, prefix):
    r, _ = setup
    vocab = {t for d in DOCS for t in d.split()}
    assert prefix_terms(r.index.term_df, prefix) == sorted(
        t for t in vocab if t.startswith(prefix)
    )
    docs, n = prefix_doc_counts(r.index, prefix)
    convs, _ = r.index.to_original_ids(docs)
    got = {int(c[1:]): int(k) for c, k in zip(convs, n)}
    assert got == _brute_prefix(prefix)


def test_prefix_expansion_guard(setup):
    r, _ = setup
    with pytest.raises(ValueError):
        prefix_terms(r.index.term_df, "a", limit=1)
    with pytest.raises(ValueError):
        prefix_terms(r.index.term_df, "")


def test_prefix_long_prefix_beyond_8_bytes(setup):
    r, _ = setup
    # 9+ byte prefix exercises the exact startswith check past the
    # 8-byte bracket resolution
    assert prefix_terms(r.index.term_df, "albatross"[:9]) == ["albatross"]
    assert prefix_terms(r.index.term_df, "albatrosz"[:9]) == []


def test_prefix_search_table_shape(setup):
    r, _ = setup
    t = prefix_search_table(r, {"q": "al"})
    assert t.column_names == ["q_id", "conv_id", "turn_idx", "n_terms"]
    assert t.num_rows == len(_brute_prefix("al"))


def test_kwic_snippets(setup):
    r, ds = setup
    t = kwic_snippets(r, ds, {"q1": "albedo", "q2": "alpha gamma"}, cutoff=3)
    rows = {
        (q, c): s
        for q, c, s in zip(
            t.column("q_id").to_pylist(),
            t.column("conv_id").to_pylist(),
            t.column("snippet").to_pylist(),
        )
    }
    # q1 hits docs 1 and 4; first occurrence windows (before=2, after=2)
    assert rows[("q1", "c001")] == "beta gamma albedo"
    assert rows[("q1", "c004")] == "albedo albino al"
    # q2: doc 0 first query-term occurrence is 'alpha' at 0
    assert rows[("q2", "c000")] == "alpha alarm beta"
    # doc 2: 'alpha' at position 1 -> window starts at 0
    assert rows[("q2", "c002")] == "delta alpha alpha"
    # doc 1: 'gamma' at position 1
    assert rows[("q2", "c001")] == "beta gamma albedo"
    # ranks are contiguous from 1 per query
    for q in ("q1", "q2"):
        ranks = [r_ for q_, r_ in zip(t.column("q_id").to_pylist(), t.column("rank").to_pylist()) if q_ == q]
        assert ranks == list(range(1, len(ranks) + 1))


def test_kwic_no_hits(setup):
    r, ds = setup
    t = kwic_snippets(r, ds, {"q": "nosuchterm"}, cutoff=3)
    assert t.num_rows == 0
