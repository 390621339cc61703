"""Two-phase rescoring (search/rescore.py): BM25 candidate window +
proximity boost vs a brute-force float64 oracle."""

import math

import numpy as np
import pyarrow as pa
import pytest

from retriv_ray.config import SparseConfig
from retriv_ray.index.build import build_index
from retriv_ray.index.positional import PositionalIndex, build_positional_index
from retriv_ray.search.rescore import rescore_topk
from retriv_ray.search.searcher import RaySparseRetriever

DOCS = [
    "hash join hash join table",          # adjacent pairs -> big boost
    "hash table scan table scan join",    # pair at distance 5
    "table scan merge filter",            # no pair
    "join order sort key hash",           # pair at distance 4
    "scan scan scan table table",         # no pair, strong bm25 tf
    "hash x x x join",                    # pair at distance 4
    "the quick brown fox",                # no query terms
    "table hash join scan hash join",     # multiple adjacent pairs
]
CFG = SparseConfig(
    tokenizer="whitespace", stemmer=None, stopwords=None, score_dtype="float64"
)


def _write_src(tmp_path, docs):
    import ray.data

    src = str(tmp_path / "src")
    ray.data.from_arrow(
        pa.table(
            {
                "conv_id": [f"c{i:03d}" for i in range(len(docs))],
                "turn_idx": pa.array([0] * len(docs), type=pa.int32()),
                "text": docs,
            }
        )
    ).write_parquet(src)
    return src


@pytest.fixture(scope="module")
def indexes(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("rescore")
    src = _write_src(tmp, DOCS)
    main = str(tmp / "main")
    pos = str(tmp / "pos")
    build_index(src, main, CFG, num_parts=2, resume=False)
    build_positional_index(src, pos, CFG, num_parts=2)
    return RaySparseRetriever(main, CFG), PositionalIndex(pos)


def _brute(docs, qtext, ta, tb, w, first_n, boost, cutoff):
    toks = [d.split() for d in docs]
    n = float(len(docs))
    dls = np.array([len(t) for t in toks], dtype=np.float64)
    avg = dls.sum() / n
    terms = qtext.split()
    scores = {}
    for i, t in enumerate(toks):
        s = 0.0
        for q in terms:
            tf = float(t.count(q))
            if tf == 0:
                continue
            df = float(sum(1 for x in toks if q in x))
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            s += idf * tf * (1.2 + 1) / (tf + 1.2 * (1 - 0.75 + 0.75 * dls[i] / avg))
        if s > 0:
            scores[i] = s
    cand = sorted(scores, key=lambda d: (-scores[d], d))[:first_n]
    final = []
    for d in cand:
        t = toks[d]
        pairs = sum(
            1
            for pi, x in enumerate(t)
            for pj, y in enumerate(t)
            if x == ta and y == tb and abs(pi - pj) <= w and (ta != tb or pi != pj)
        )
        final.append((d, scores[d] + boost * math.log1p(pairs)))
    final.sort(key=lambda p: (-p[1], p[0]))
    return [d for d, _ in final[:cutoff]]


@pytest.mark.parametrize("first_n,cutoff", [(8, 4), (3, 3), (8, 8)])
def test_rescore_matches_brute(indexes, first_n, cutoff):
    r, px = indexes
    out = rescore_topk(
        r,
        px,
        {"q": ("hash join table", "hash", "join", 2)},
        first_n=first_n,
        boost=0.7,
        cutoff=cutoff,
    )
    got = [int(c[1:]) for c in out.column("conv_id").to_pylist()]
    ref = _brute(DOCS, "hash join table", "hash", "join", 2, first_n, 0.7, cutoff)
    assert got == ref
    assert list(out.column("rank").to_pylist()) == list(range(1, len(ref) + 1))


def test_rescore_boost_changes_order(indexes):
    r, px = indexes
    # docs 1 and 7 have adjacent 'scan join' pairs; doc 1 is the
    # weakest bm25 hit, so a heavy boost must strictly promote it
    q = {"q": ("hash join", "scan", "join", 1)}
    plain = rescore_topk(r, px, q, first_n=8, boost=0.0, cutoff=5)
    boosted = rescore_topk(r, px, q, first_n=8, boost=5.0, cutoff=5)
    p = plain.column("conv_id").to_pylist()
    bo = boosted.column("conv_id").to_pylist()
    assert p != bo
    assert bo.index("c001") < p.index("c001")


def test_rescore_window_narrows_candidates(indexes):
    r, px = indexes
    # first_n=1 -> rescoring can only reorder within the single
    # candidate; result == the bm25 top-1 regardless of boost
    q = {"q": ("hash join", "hash", "join", 1)}
    one = rescore_topk(r, px, q, first_n=1, boost=100.0, cutoff=1)
    ids, _ = r._score(["hash", "join"], 1)
    assert [int(c[1:]) for c in one.column("conv_id").to_pylist()] == list(ids)


def test_rescore_validates_window(indexes):
    r, px = indexes
    with pytest.raises(ValueError, match="first_n"):
        rescore_topk(r, px, {"q": ("a", "a", "b", 1)}, first_n=2, cutoff=5)


def test_rescore_no_matches_is_empty(indexes):
    r, px = indexes
    out = rescore_topk(
        r, px, {"q": ("zzz qqq", "zzz", "qqq", 3)}, first_n=8, cutoff=5
    )
    assert out.num_rows == 0
    assert out.column_names == ["q_id", "rank", "conv_id", "turn_idx", "doc_id"]
