"""Decay scoring (search/decay.py), sort-by-field (search/fieldsort.py),
grouped bucket ranking (search/groupscore.py) and term vectors
(search/termvectors.py) — checked against brute-force recomputation
over a small corpus."""

import math

import numpy as np
import pyarrow as pa
import pytest

from retriv_ray.config import SparseConfig
from retriv_ray.index.build import build_index
from retriv_ray.search.decay import decay_topk
from retriv_ray.search.fieldsort import sort_topk
from retriv_ray.search.groupscore import grouped_topk
from retriv_ray.search.metadata import build_metadata
from retriv_ray.search.searcher import RaySparseRetriever
from retriv_ray.search.termvectors import term_vectors_ds

#         conv    source  n_chars  text
DOCS = [
    ("c000", "web", 100, "table scan join"),
    ("c001", "web", 300, "table table scan"),
    ("c002", "book", 500, "table join join"),
    ("c003", "book", 200, "merge filter"),
    ("c004", "chat", 400, "table scan scan join"),
    ("c005", "chat", 250, "nothing relevant here"),
    ("c006", "web", 350, "table"),
]
CFG = SparseConfig(
    tokenizer="whitespace", stemmer=None, stopwords=None, score_dtype="float64"
)


@pytest.fixture(scope="module")
def rt(ray_session, tmp_path_factory):
    import ray.data

    tmp = tmp_path_factory.mktemp("extras")
    src = str(tmp / "src")
    ray.data.from_arrow(
        pa.table(
            {
                "conv_id": [c for c, _, _, _ in DOCS],
                "turn_idx": pa.array([0] * len(DOCS), type=pa.int32()),
                "text": [t for _, _, _, t in DOCS],
            }
        )
    ).write_parquet(src)
    idx = str(tmp / "idx")
    build_index(src, idx, CFG, num_parts=2, resume=False)
    meta_src = ray.data.from_arrow(
        pa.table(
            {
                "conv_id": [c for c, _, _, _ in DOCS],
                "turn_idx": pa.array([0] * len(DOCS), type=pa.int32()),
                "source": [s for _, s, _, _ in DOCS],
                "n_chars": [n for _, _, n, _ in DOCS],
            }
        )
    )
    build_metadata(meta_src, idx, {"source": "keyword", "n_chars": "number"})
    return RaySparseRetriever(idx, CFG)


def _bm25_scores(rt, query):
    """doc_id -> float64 score via the engine's own kernel at full
    cutoff (the modules under test transform THIS ranking)."""
    terms = rt.query_terms(query)
    ids, scores = rt._score(terms, cutoff=rt.index.local_count)
    return dict(zip(ids.tolist(), scores.tolist()))


def test_decay_reorders_by_field_distance(rt):
    base = _bm25_scores(rt, "table scan join")
    n_chars = {i: DOCS[i][2] for i in range(len(DOCS))}
    expect = sorted(
        (
            (-(s * 0.5 ** (abs(n_chars[d] - 300.0) / 100.0)), d)
            for d, s in base.items()
        ),
    )
    out = decay_topk(
        rt, "table scan join", "n_chars", origin=300.0, scale=100.0,
        decay=0.5, cutoff=10,
    )
    got = out.column("doc_id").to_pylist()
    assert got == [d for _, d in expect]
    assert out.column("rank").to_pylist() == list(range(1, len(got) + 1))


def test_decay_validates_params(rt):
    with pytest.raises(ValueError):
        decay_topk(rt, "table", "n_chars", 0.0, 0.0)
    with pytest.raises(ValueError):
        decay_topk(rt, "table", "n_chars", 0.0, 10.0, decay=1.5)
    with pytest.raises(ValueError):
        decay_topk(rt, "table", "source", 0.0, 10.0)  # keyword field


def test_sort_by_field_orders_matching_set(rt):
    out = sort_topk(rt, "table scan join", "n_chars", cutoff=10)
    # matching set: docs containing table|scan|join = 0,1,2,4,6;
    # n_chars desc -> 2 (500), 4 (400), 6 (350), 1 (300), 0 (100)
    assert out.column("doc_id").to_pylist() == [2, 4, 6, 1, 0]
    assert out.column("value").to_pylist() == [500, 400, 350, 300, 100]
    asc = sort_topk(rt, "table scan join", "n_chars", descending=False)
    assert asc.column("doc_id").to_pylist() == [0, 1, 6, 4, 2]


def test_sort_cutoff_and_empty_query(rt):
    assert sort_topk(rt, "table", "n_chars", cutoff=2).num_rows == 2
    assert sort_topk(rt, "zzz", "n_chars").num_rows == 0


def test_grouped_max_ranks_buckets(rt):
    base = _bm25_scores(rt, "table scan join")
    src = {i: DOCS[i][1] for i in range(len(DOCS))}
    gmax = {}
    gbest = {}
    for d in sorted(base):
        v = src[d]
        if base[d] > gmax.get(v, -math.inf):
            gmax[v] = base[d]
            gbest[v] = d
    expect = sorted(((-s, v) for v, s in gmax.items()))
    out = grouped_topk(rt, "table scan join", "source", mode="max", cutoff=10)
    assert out.column("value").to_pylist() == [v for _, v in expect]
    assert out.column("doc_id").to_pylist() == [
        gbest[v] for _, v in expect
    ]


def test_grouped_sum_aggregates(rt):
    base = _bm25_scores(rt, "table scan join")
    src = {i: DOCS[i][1] for i in range(len(DOCS))}
    gsum = {}
    for d, s in base.items():
        gsum[src[d]] = gsum.get(src[d], 0.0) + s
    expect = [v for _, v in sorted((-s, v) for v, s in gsum.items())]
    out = grouped_topk(rt, "table scan join", "source", mode="sum", cutoff=10)
    assert out.column("value").to_pylist() == expect
    # sum mode reports the lowest-id member per bucket
    members = {}
    for d in base:
        members.setdefault(src[d], []).append(d)
    assert out.column("doc_id").to_pylist() == [
        min(members[v]) for v in expect
    ]


def test_grouped_empty_query(rt):
    out = grouped_topk(rt, "zzz", "source")
    assert out.num_rows == 0
    assert out.column_names == ["q_id", "rank", "value", "doc_id"]


def test_term_vectors_match_bruteforce(rt, ray_session):
    import ray.data

    subset = [0, 2, 4]
    tbl = pa.table(
        {
            "conv_id": [DOCS[i][0] for i in subset],
            "turn_idx": pa.array([0] * len(subset), type=pa.int32()),
            "text": [DOCS[i][3] for i in subset],
        }
    )
    out = term_vectors_ds(rt, ray.data.from_arrow(tbl), concurrency=2)
    df_pd = out.to_pandas().sort_values(["conv_id", "term"]).reset_index(drop=True)
    # brute force: tf by counting, df over the WHOLE corpus
    all_toks = [d[3].split() for d in DOCS]
    dfs = {}
    for toks in all_toks:
        for t in set(toks):
            dfs[t] = dfs.get(t, 0) + 1
    expect = []
    for i in subset:
        toks = DOCS[i][3].split()
        for t in sorted(set(toks)):
            expect.append((DOCS[i][0], t, toks.count(t), dfs[t]))
    got = list(
        zip(df_pd["conv_id"], df_pd["term"], df_pd["tf"], df_pd["df"])
    )
    assert got == expect


def test_term_vectors_empty_text(rt, ray_session):
    import ray.data

    tbl = pa.table(
        {
            "conv_id": ["cX"],
            "turn_idx": pa.array([0], type=pa.int32()),
            "text": [""],
        }
    )
    out = term_vectors_ds(rt, ray.data.from_arrow(tbl), concurrency=1)
    assert out.count() == 0


def test_facade_methods(rt):
    assert rt.decay_search(
        "table", "n_chars", 300.0, 100.0
    ).column_names == ["q_id", "rank", "doc_id"]
    assert rt.sort_by_field("table", "n_chars").num_rows > 0
    assert rt.grouped_search("table", "source").num_rows > 0
