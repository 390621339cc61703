"""Fuzzy (edit-distance) term expansion + BM25-over-expansion search."""

import random

import numpy as np
import pyarrow as pa
import pytest

from retriv_ray.config import SparseConfig
from retriv_ray.index.build import build_index
from retriv_ray.search.fuzzy import (
    _levenshtein_batch,
    _levenshtein_rows,
    fuzzy_search_table,
    fuzzy_term_matches,
    fuzzy_terms,
    suggest_term,
)
from retriv_ray.search.searcher import RaySparseRetriever

DOCS = [
    "alpha alarm beta albatross",
    "beta gamma albedo",
    "delta alpha alpha",
    "zeta eta theta",
    "albedo albino al",
]


def _ref_lev(a: bytes, b: bytes) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a):
        cur = [i + 1]
        for j, cb in enumerate(b):
            cur.append(min(prev[j] + (ca != cb), prev[j + 1] + 1, cur[-1] + 1))
        prev = cur
    return prev[-1]


def _pack(cands):
    L = max((len(c) for c in cands), default=1)
    mat = np.zeros((len(cands), L), dtype=np.uint8)
    lens = np.array([len(c) for c in cands], dtype=np.int64)
    for i, c in enumerate(cands):
        mat[i, : len(c)] = np.frombuffer(c, dtype=np.uint8)
    return mat, lens


def test_bitparallel_matches_dp_randomized():
    rng = random.Random(7)
    for _ in range(300):
        pat = bytes(rng.choice(b"abcde") for _ in range(rng.randint(1, 12)))
        cands = [
            bytes(rng.choice(b"abcde") for _ in range(rng.randint(1, 14)))
            for _ in range(rng.randint(1, 8))
        ]
        mat, lens = _pack(cands)
        got = list(_levenshtein_batch(pat, mat, lens))
        assert got == [_ref_lev(pat, c) for c in cands]


def test_bitparallel_64_byte_pattern_boundary():
    rng = random.Random(1)
    pat = bytes(rng.choice(b"xy") for _ in range(64))
    cands = [bytes(rng.choice(b"xy") for _ in range(70)) for _ in range(5)]
    mat, lens = _pack(cands)
    got = list(_levenshtein_batch(pat, mat, lens))
    assert got == [_ref_lev(pat, c) for c in cands]


def test_dp_fallback_rows():
    rng = random.Random(3)
    pat = bytes(rng.choice(b"abc") for _ in range(80))
    cands = [bytes(rng.choice(b"abc") for _ in range(rng.randint(0, 90))) for _ in range(6)]
    assert _levenshtein_rows(pat, cands) == [_ref_lev(pat, c) for c in cands]


@pytest.fixture(scope="module")
def setup(ray_session, tmp_path_factory):
    import ray.data

    tmp = tmp_path_factory.mktemp("fuzzy_idx")
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


VOCAB = sorted({t for d in DOCS for t in d.split()})


@pytest.mark.parametrize(
    "term,d",
    [
        ("albedo", 0),
        ("albedo", 1),
        ("alpha", 2),
        ("beta", 1),
        ("al", 2),
        ("qqqq", 1),
        ("theta", 3),
    ],
)
def test_fuzzy_terms_vs_bruteforce(setup, term, d):
    want = sorted(
        t
        for t in VOCAB
        if _ref_lev(term.encode(), t.encode()) <= d
    )
    assert fuzzy_terms(setup.index.term_df, term, d) == want


def test_fuzzy_terms_expansion_limit(setup):
    with pytest.raises(ValueError):
        fuzzy_terms(setup.index.term_df, "al", 10, limit=3)


def test_fuzzy_search_matches_expanded_or_query(setup):
    # expansion of 'beta'~1 is {beta, eta, zeta}; ranking must equal
    # the kernel's own disjunctive scoring of that term set
    terms = fuzzy_terms(setup.index.term_df, "beta", 1)
    assert terms == ["beta", "eta", "zeta"]
    ids, scores = setup._score(terms, 10)
    t = fuzzy_search_table(setup, {"q": ("beta", 1)}, cutoff=10)
    convs, _turns = setup.index.to_original_ids(ids)
    assert t.column("conv_id").to_pylist() == list(convs)
    assert t.column("rank").to_pylist() == list(range(1, len(ids) + 1))


def test_fuzzy_term_matches_carries_dist_and_df(setup):
    got = dict(
        (t, (d, df)) for t, d, df in fuzzy_term_matches(
            setup.index.term_df, "beta", 1
        )
    )
    # df: 'beta' in docs 0,1; 'eta' in doc 3; 'zeta' in doc 3
    assert got == {"beta": (0, 2), "eta": (1, 1), "zeta": (1, 1)}


def test_suggest_term_prefers_distance_then_df(setup):
    # exact hit wins at distance 0
    assert suggest_term(setup.index.term_df, "beta") == ("beta", 0, 2)
    # 'betb'~1 -> beta (d1); eta/zeta are d2: distance dominates
    assert suggest_term(setup.index.term_df, "betb") == ("beta", 1, 2)
    # 'albedx'~1 -> albedo; df tie-break: 'zet_'~1 has zeta(df1) and
    # eta d2 -- construct a real tie instead: 'et'~2 matches beta(d2,
    # df2), eta(d1), zeta(d2), theta(d3 out)...: eta wins on distance
    assert suggest_term(setup.index.term_df, "et") == ("eta", 1, 1)
    # true df tie at equal distance: 'aeta'~1 -> beta(d1,df2),
    # eta(d1,df1), zeta(d1,df1): beta wins on df
    assert suggest_term(setup.index.term_df, "aeta") == ("beta", 1, 2)
    # nothing in range
    assert suggest_term(setup.index.term_df, "qqqqqq", 1) is None


def test_fuzzy_search_empty_expansion(setup):
    t = fuzzy_search_table(setup, {"q": ("zzzzzz", 1)}, cutoff=10)
    assert t.num_rows == 0
    assert t.column_names == ["q_id", "rank", "conv_id", "turn_idx"]


def test_fuzzy_msearch_ds_equals_table_path(setup):
    from retriv_ray.search.fuzzy import fuzzy_msearch_ds

    queries = {"a": ("beta", 1), "b": ("alpha", 2), "c": ("zzzz", 1)}
    want = fuzzy_search_table(setup, queries, cutoff=10).to_pandas()
    got = (
        fuzzy_msearch_ds(
            setup,
            [
                {"id": q, "term": t, "max_dist": d}
                for q, (t, d) in queries.items()
            ],
            cutoff=10,
            concurrency=2,
        )
        .to_pandas()
        .sort_values(["q_id", "rank"])
        .reset_index(drop=True)
    )
    cols = ["q_id", "rank", "conv_id", "turn_idx"]
    assert got[cols].astype(str).equals(want[cols].astype(str))
    # the serving path also carries the scores
    ids, scores = setup._score(["beta", "eta", "zeta"], 10)
    import numpy as _np

    _np.testing.assert_array_equal(
        got[got.q_id == "a"]["score"].to_numpy(),
        scores.astype(_np.float64),
    )
