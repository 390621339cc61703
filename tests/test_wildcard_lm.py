"""Wildcard term queries (search/wildcard.py) and LM-Dirichlet
retrieval (search/lm.py)."""

import fnmatch
import math

import numpy as np
import pyarrow as pa
import pytest

from retriv_ray.config import SparseConfig
from retriv_ray.index.build import build_index
from retriv_ray.search.lm import lm_dirichlet_table, lm_dirichlet_topk
from retriv_ray.search.searcher import RaySparseRetriever
from retriv_ray.search.wildcard import (
    wildcard_search_table,
    wildcard_terms,
    wildcard_to_like,
    wildcard_to_re2,
)

DOCS = [
    "alpha alarm beta albatross",
    "beta gamma albedo",
    "delta alpha alpha",
    "zeta eta theta",
    "albedo albino al über übrig",
    "integration nation station alpha",
]
VOCAB = sorted({t for d in DOCS for t in d.split()})


@pytest.fixture(scope="module")
def setup(ray_session, tmp_path_factory):
    import ray.data

    tmp = tmp_path_factory.mktemp("wild_idx")
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
    "pattern",
    [
        "al*",          # prefix, 2-byte run -> full-scan fallback
        "*tion*",       # infix, trigram path
        "*ation",       # suffix
        "al?a*",        # ? + trigram-free runs
        "*edo",         # 3-byte suffix run
        "üb*",          # multi-byte: 4 utf-8 bytes -> trigram path
        "*zzz*",        # absent trigram -> empty
        "alpha",        # no wildcard: exact whole-term match
        "*a*a*",        # multiple short runs -> fallback
    ],
)
def test_wildcard_terms_vs_fnmatch(setup, pattern):
    want = sorted(
        t
        for t in VOCAB
        if fnmatch.fnmatchcase(t, pattern)
    )
    assert wildcard_terms(setup.index.term_df, pattern) == want


def test_wildcard_search_counts(setup):
    t = wildcard_search_table(setup, {"q": "al*"})
    got = dict(
        zip(t.column("conv_id").to_pylist(), t.column("n_terms").to_pylist())
    )
    want = {}
    for i, d in enumerate(DOCS):
        n = len({w for w in set(d.split()) if w.startswith("al")})
        if n:
            want[f"c{i:03d}"] = n
    assert got == want


def test_wildcard_translations():
    assert wildcard_to_re2("a*b?c.") == "a.*b.c\\."
    assert wildcard_to_like("a*b?c%_!") == "a%b_c!%!_!!"


def _brute_lm(docs, query_terms, mu, cutoff):
    """Independent float64 reference with the same quantization."""
    toks = [d.split() for d in docs]
    dl = [len(t) for t in toks]
    total = sum(dl)
    vocab_cf = {}
    for t in toks:
        for w in t:
            vocab_cf[w] = vocab_cf.get(w, 0) + 1
    terms = [w for w in query_terms if w in vocab_cf]
    scores = {}
    for d, t in enumerate(toks):
        s = 0
        hit = False
        for w in terms:
            tf = t.count(w)
            if tf:
                hit = True
                p = vocab_cf[w] / total
                s += math.floor(1e6 * math.log(1 + tf / (mu * p)))
        if hit:
            s += len(terms) * math.floor(
                1e6 * math.log(mu / (dl[d] + mu))
            )
            scores[d] = s
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:cutoff]


def test_lm_dirichlet_vs_bruteforce(setup):
    query = "alpha beta alpha zzz"  # dup term + OOV term
    docs, score = lm_dirichlet_topk(setup, query, cutoff=10, mu=500.0)
    convs, _ = setup.index.to_original_ids(docs)
    got = list(zip([int(c[1:]) for c in convs], score.tolist()))
    want = _brute_lm(DOCS, query.split(), 500.0, 10)
    assert got == want


def test_lm_dirichlet_table_shape(setup):
    t = lm_dirichlet_table(setup, {"a": "alpha", "b": "zzz"}, cutoff=3)
    assert t.column_names == [
        "q_id", "rank", "conv_id", "turn_idx", "score_e6",
    ]
    by_q = t.column("q_id").to_pylist()
    assert by_q.count("b") == 0  # OOV-only query ranks nothing
    ranks = [
        r for q, r in zip(by_q, t.column("rank").to_pylist()) if q == "a"
    ]
    assert ranks == list(range(1, len(ranks) + 1))


def test_lm_scores_negative_and_ordered(setup):
    """Dirichlet scores are typically negative — the kernel must not
    clamp at zero like the strict-positive BM25 heap."""
    docs, score = lm_dirichlet_topk(setup, "alpha", cutoff=10)
    assert len(docs) == 3
    assert (np.diff(score) <= 0).all()
    # multi-term query where most docs match only a subset: the |q|
    # length norm drives totals negative — a strict-positive heap
    # would have dropped them (verified against _brute_lm too)
    q = "alpha beta gamma zeta"
    docs2, score2 = lm_dirichlet_topk(setup, q, cutoff=10, mu=100.0)
    assert (score2 < 0).any() and (score2 > 0).any()
    convs2, _ = setup.index.to_original_ids(docs2)
    got = list(zip([int(c[1:]) for c in convs2], score2.tolist()))
    assert got == _brute_lm(DOCS, q.split(), 100.0, 10)


def test_facades(setup):
    t = setup.wildcard_search({"w": "*tion*"})
    assert t.num_rows == 1 and t.column("n_terms")[0].as_py() == 3
    t2 = setup.lm_search({"q": "alpha beta"}, cutoff=5)
    assert t2.num_rows > 0
