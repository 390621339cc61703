"""More-like-this retrieval (search/mlt.py)."""

import math
from collections import Counter

import pyarrow as pa
import pytest

from retriv_ray.config import SparseConfig
from retriv_ray.index.build import build_index
from retriv_ray.search.mlt import mlt_terms, more_like_this
from retriv_ray.search.searcher import RaySparseRetriever

DOCS = [
    "alpha beta beta gamma",
    "beta gamma delta",
    "alpha alpha epsilon zeta",
    "gamma delta epsilon",
    "zeta eta alpha beta",
]


@pytest.fixture(scope="module")
def setup(ray_session, tmp_path_factory):
    import ray.data

    tmp = tmp_path_factory.mktemp("mlt_idx")
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
    build_index(src, idx, cfg, num_parts=2, resume=False)
    return RaySparseRetriever(idx, cfg)


def _brute_terms(doc_text, k):
    n = len(DOCS)
    df = Counter()
    for d in DOCS:
        df.update(set(d.split()))
    tf = Counter(doc_text.split())
    scored = sorted(
        (
            (-math.floor(1e4 * f * math.log(n / df[t])), t)
            for t, f in tf.items()
        )
    )
    return [t for _w, t in scored[:k]]


@pytest.mark.parametrize("doc", range(len(DOCS)))
def test_mlt_terms_match_bruteforce(setup, doc):
    assert mlt_terms(setup, DOCS[doc], 3) == _brute_terms(DOCS[doc], 3)


def test_mlt_equals_expanded_query_minus_source(setup):
    terms = mlt_terms(setup, DOCS[0], 3)
    ids, _ = setup._score(terms, 10)
    t = more_like_this(setup, DOCS[0], exclude_doc=0, top_terms=3, cutoff=10)
    assert 0 not in t.column("doc_id").to_pylist()
    assert t.column("doc_id").to_pylist() == [i for i in ids if i != 0]
    assert t.column("rank").to_pylist() == list(
        range(1, t.num_rows + 1)
    )


def test_mlt_unseen_text_returns_empty(setup):
    t = more_like_this(setup, "qqq www", cutoff=5)
    assert t.num_rows == 0
    assert t.column_names == ["rank", "conv_id", "turn_idx", "doc_id"]
