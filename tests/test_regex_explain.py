"""Regex term queries (search/regex.py) and score explanation
(search/explain.py)."""

import re

import numpy as np
import pyarrow as pa
import pytest

from retriv_ray.config import SparseConfig
from retriv_ray.index.build import build_index
from retriv_ray.search.explain import explain, explain_queries
from retriv_ray.search.regex import regex_search_table, regex_terms
from retriv_ray.search.searcher import RaySparseRetriever

DOCS = [
    "alpha alarm beta albatross",
    "beta gamma albedo",
    "delta alpha alpha",
    "zeta eta theta",
    "albedo albino al",
]
VOCAB = sorted({t for d in DOCS for t in d.split()})


@pytest.fixture(scope="module")
def setup(ray_session, tmp_path_factory):
    import ray.data

    tmp = tmp_path_factory.mktemp("regex_idx")
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
    return RaySparseRetriever(idx, cfg)


@pytest.mark.parametrize(
    "pattern", ["al.*", "a l.*|beta", ".*a", "(al|be).*o", "zz+", "[abd].*a"]
)
def test_regex_terms_vs_bruteforce(setup, pattern):
    want = sorted(t for t in VOCAB if re.fullmatch(pattern, t))
    assert regex_terms(setup.index.term_df, pattern) == want


def test_regex_search_counts(setup):
    t = regex_search_table(setup, {"q": "al.*"})
    got = dict(
        zip(t.column("conv_id").to_pylist(), t.column("n_terms").to_pylist())
    )
    want = {}
    for i, d in enumerate(DOCS):
        n = len({w for w in d.split() if re.fullmatch("al.*", w)})
        if n:
            want[f"c{i:03d}"] = n
    assert got == want


def test_regex_expansion_limit(setup):
    with pytest.raises(ValueError):
        regex_terms(setup.index.term_df, ".*", limit=3)


def _ref_explain(query, doc_idx, b=0.75, k1=1.2):
    n = len(DOCS)
    toks = [d.split() for d in DOCS]
    avg = np.float32(sum(len(t) for t in toks) / n)
    rel = len(toks[doc_idx]) / avg
    out = {}
    for t in sorted(set(query.split())):
        tf = toks[doc_idx].count(t)
        if tf == 0:
            continue
        df = sum(1 for d in toks if t in d)
        idf = np.log(1 + (n - df + 0.5) / (df + 0.5))
        satur = tf * (k1 + 1) / (tf + k1 * (1 - b + b * rel))
        out[t] = (tf, df, int(np.floor(1e6 * idf * satur)))
    return out


def test_explain_matches_reference(setup):
    t = explain(setup, "alpha beta albedo", 1)  # doc 1: beta gamma albedo
    got = {
        r["term"]: (r["tf"], r["df"], r["score_e6"]) for r in t.to_pylist()
    }
    assert got == _ref_explain("alpha beta albedo", 1)
    assert "alpha" not in got  # not in doc 1


def test_explain_queries_top1_consistency(setup):
    t = explain_queries(setup, {"q": "alpha beta"})
    ids, _ = setup._score(["alpha", "beta"], 1)
    assert set(t.column("doc_id").to_pylist()) == {int(ids[0])}
    # contributions sum (quantized) must be within quantization error
    # of the kernel's own score
    _ids, scores = setup._score(["alpha", "beta"], 1)
    total_e6 = sum(t.column("score_e6").to_pylist())
    assert abs(total_e6 - 1e6 * float(scores[0])) <= len(t) + 1


def test_explain_unknown_terms_empty(setup):
    t = explain(setup, "qqq", 0)
    assert t.num_rows == 0
