"""Percolation (reverse search) vs a brute-force oracle: registered
boolean queries matched against a streamed document set."""

import pytest

from retriv_ray.config import SparseConfig
from retriv_ray.search.percolate import percolate

DOCS = [
    {"doc_id": 0, "text": "red green blue"},
    {"doc_id": 1, "text": "red red yellow"},
    {"doc_id": 2, "text": "green yellow purple"},
    {"doc_id": 3, "text": "blue purple"},
    {"doc_id": 4, "text": "red blue purple yellow"},
    {"doc_id": 5, "text": "orange"},
    {"doc_id": 6, "text": None},
]

QUERIES = {
    "p1": {"must": ["red blue"]},
    "p2": {"should": ["green purple"], "must_not": ["yellow"]},
    "p3": {"must": ["purple"], "should": ["red"]},
    "p4": {"must_not": ["red"]},  # nothing positive -> matches nothing
    "p5": {"must": ["nosuchterm"]},
}


def _brute(queries, docs):
    out = []
    for d in docs:
        toks = set((d["text"] or "").split())
        for q_id in sorted(queries):
            spec = queries[q_id]
            must = [t for p in spec.get("must", []) for t in p.split()]
            should = [t for p in spec.get("should", []) for t in p.split()]
            must_not = [
                t for p in spec.get("must_not", []) for t in p.split()
            ]
            if must:
                ok = all(t in toks for t in must)
            elif should:
                ok = any(t in toks for t in should)
            else:
                ok = False
            if ok and any(t in toks for t in must_not):
                ok = False
            if ok:
                out.append((d["doc_id"], q_id))
    return sorted(out)


def test_percolate_matches_brute_force(ray_session):
    import ray.data

    got = percolate(ray.data.from_items(DOCS), QUERIES).take_all()
    assert sorted((r["doc_id"], r["q_id"]) for r in got) == _brute(
        QUERIES, DOCS
    )


def test_percolate_partition_independent(ray_session):
    import ray.data

    a = percolate(ray.data.from_items(DOCS).repartition(1), QUERIES).take_all()
    b = percolate(ray.data.from_items(DOCS).repartition(4), QUERIES).take_all()
    assert sorted((r["doc_id"], r["q_id"]) for r in a) == sorted(
        (r["doc_id"], r["q_id"]) for r in b
    )


def test_percolate_preprocessing_drops_stopwords(ray_session):
    import ray.data

    # default chain (stopwords english): "the" vanishes from the must
    # list, so the clause reduces to must=["red"] — Lucene
    # analyzer-dropped-term behavior, same as the forward direction
    cfg = SparseConfig()
    got = percolate(
        ray.data.from_items(DOCS[:3]),
        {"q": {"must": ["the red"]}},
        cfg=cfg,
    ).take_all()
    assert sorted(r["doc_id"] for r in got) == [0, 1]
