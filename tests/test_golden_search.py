"""Golden BM25 score parity with the reference.

Expected values are the reference's own test constants:
- tests/sparse_retriever/search_engine_test.py:34-111 (Shane/Connelly)
- README.md:98-123 ("witches masses" example, defaults b=0.75 k1=1.2)

These pin the full stack: preprocessing chain -> index build semantics
-> float32 BM25 kernel -> top-k. rel_tol 1e-6 as in the reference.
"""

from math import isclose

import pytest

from retriv_ray.config import SparseConfig
from retriv_ray.index.inmem import LocalSparseRetriever

REL_TOL = 1e-6


@pytest.fixture
def collection():
    return [
        {"id": 1, "text": "Shane"},
        {"id": 2, "text": "Shane C"},
        {"id": 3, "text": "Shane P Connelly"},
        {"id": 4, "text": "Shane Connelly"},
        {"id": 5, "text": "Shane Shane Connelly Connelly"},
        {"id": 6, "text": "Shane Shane Shane Connelly Connelly Connelly"},
    ]


def _engine(b, k1):
    return LocalSparseRetriever(SparseConfig(hyperparams=dict(b=b, k1=k1)))


def test_search_bm25_golden(collection):
    se = _engine(b=0.5, k1=0).index_collection(collection)
    results = se.search("shane")
    for d in range(1, 7):
        assert isclose(results[d], 0.07410797, rel_tol=REL_TOL)

    se = _engine(b=0, k1=10).index_collection(collection)
    results = se.search("shane")
    for d in range(1, 5):
        assert isclose(results[d], 0.07410797, rel_tol=REL_TOL)
    assert isclose(results[5], 0.13586462, rel_tol=REL_TOL)
    assert isclose(results[6], 0.18812023, rel_tol=REL_TOL)

    se = _engine(b=1, k1=5).index_collection(collection)
    results = se.search("shane")
    assert isclose(results[1], 0.16674294, rel_tol=REL_TOL)
    assert isclose(results[2], 0.10261103, rel_tol=REL_TOL)
    assert isclose(results[3], 0.07410797, rel_tol=REL_TOL)
    assert isclose(results[4], 0.10261103, rel_tol=REL_TOL)
    assert isclose(results[5], 0.10261103, rel_tol=REL_TOL)
    assert isclose(results[6], 0.10261105, rel_tol=REL_TOL)


def test_msearch_bm25_golden(collection):
    queries = [
        {"id": "q_1", "text": "shane"},
        {"id": "q_2", "text": "connelly"},
    ]

    se = _engine(b=0.5, k1=0).index_collection(collection)
    r = se.msearch(queries)
    for d in range(1, 7):
        assert isclose(r["q_1"][d], 0.07410797, rel_tol=REL_TOL)
    for d in range(3, 7):
        assert isclose(r["q_2"][d], 0.44183275, rel_tol=REL_TOL)

    se = _engine(b=0, k1=10).index_collection(collection)
    r = se.msearch(queries)
    for d in range(1, 5):
        assert isclose(r["q_1"][d], 0.07410797, rel_tol=REL_TOL)
    assert isclose(r["q_1"][5], 0.13586462, rel_tol=REL_TOL)
    assert isclose(r["q_1"][6], 0.18812023, rel_tol=REL_TOL)
    assert isclose(r["q_2"][3], 0.44183275, rel_tol=REL_TOL)
    assert isclose(r["q_2"][4], 0.44183275, rel_tol=REL_TOL)
    assert isclose(r["q_2"][5], 0.8100267, rel_tol=REL_TOL)
    assert isclose(r["q_2"][6], 1.1215755, rel_tol=REL_TOL)

    se = _engine(b=1, k1=5).index_collection(collection)
    r = se.msearch(queries)
    assert isclose(r["q_1"][1], 0.16674294, rel_tol=REL_TOL)
    assert isclose(r["q_1"][2], 0.10261103, rel_tol=REL_TOL)
    assert isclose(r["q_1"][3], 0.07410797, rel_tol=REL_TOL)
    assert isclose(r["q_1"][4], 0.10261103, rel_tol=REL_TOL)
    assert isclose(r["q_1"][5], 0.10261103, rel_tol=REL_TOL)
    assert isclose(r["q_1"][6], 0.10261105, rel_tol=REL_TOL)
    assert isclose(r["q_2"][3], 0.44183275, rel_tol=REL_TOL)
    assert isclose(r["q_2"][4], 0.6117684, rel_tol=REL_TOL)
    assert isclose(r["q_2"][5], 0.6117684, rel_tol=REL_TOL)
    assert isclose(r["q_2"][6], 0.6117684, rel_tol=REL_TOL)


def test_readme_example_golden():
    # reference README.md:98-123 (b=0.75 k1=1.2). The README's printed
    # scores only reproduce with doc token lengths [5,6,5,4], i.e. no
    # stop-word removal and apostrophes preserved — the example output
    # predates the current reference defaults. We pin the exact values
    # under that config; the defaults path is pinned by the Shane tests.
    collection = [
        {"id": "doc_1", "text": "Generals gathered in their masses"},
        {"id": "doc_2", "text": "Just like witches at black masses"},
        {"id": "doc_3", "text": "Evil minds that plot destruction"},
        {"id": "doc_4", "text": "Sorcerer of death's construction"},
    ]
    se = LocalSparseRetriever(
        SparseConfig(stopwords=None, do_punctuation_removal=False)
    ).index_collection(collection)
    results = se.search("witches masses")
    assert isclose(results["doc_2"], 1.7536403, rel_tol=REL_TOL)
    assert isclose(results["doc_1"], 0.6931472, rel_tol=REL_TOL)
    assert set(results) == {"doc_1", "doc_2"}


def test_empty_and_oov_queries(collection):
    se = _engine(0.75, 1.2).index_collection(collection)
    assert se.search("") == {}
    assert se.search("the of and") == {}  # all stopwords
    assert se.search("zebra") == {}  # out of vocabulary
    # mixed: OOV terms dropped, rest scored (sparse_retriever.py:277)
    assert set(se.search("shane zebra")) == {1, 2, 3, 4, 5, 6}


def test_cutoff_and_strict_positive_topk(collection):
    se = _engine(0.75, 1.2).index_collection(collection)
    r = se.search("connelly", cutoff=2)
    assert len(r) == 2  # only 2 best of the 4 matching docs


def test_tfidf_model(collection):
    cfg = SparseConfig(model="tf-idf")
    se = LocalSparseRetriever(cfg).index_collection(collection)
    r = se.search("shane connelly")
    # tf-idf formula: tf/doc_len * (log((1+N)/(1+df)) + 1)
    # doc 1: tf=1, len=1, df(shane)=6 -> 1.0 * (log(7/7)+1) = 1.0
    assert isclose(r[1], 1.0, rel_tol=REL_TOL)
    assert set(r) == {1, 2, 3, 4, 5, 6}


def test_min_df_affects_doc_lens():
    # with min_df=2, singleton terms are pruned BEFORE doc_lens:
    # doc lengths count only retained terms (build_inverted_index.py:35-63).
    collection = [
        {"id": 1, "text": "apple banana cherry"},
        {"id": 2, "text": "apple banana"},
        {"id": 3, "text": "apple unique1 unique2 unique3"},
    ]
    cfg = SparseConfig(min_df=2, stemmer=None, stopwords=None)
    se = LocalSparseRetriever(cfg).index_collection(collection)
    idx = se.index
    assert set(idx.postings) == {"apple", "banana"}
    assert idx.doc_lens.tolist() == [2.0, 2.0, 1.0]
    assert "unique1" not in idx.vocabulary
