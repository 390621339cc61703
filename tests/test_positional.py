"""Positional index: phrase/proximity vs a brute-force oracle, codec
round-trip across shard layouts, pipeline interplay (stopword removal
renumbers positions)."""

import numpy as np
import pyarrow as pa
import pytest

from retriv_ray.config import SparseConfig
from retriv_ray.index.positional import (
    PositionalIndex,
    build_positional_index,
    phrase_table,
    proximity_table,
)

DOCS = [
    "a b a b a",
    "b a b",
    "c c c c",
    "a x b",
    "b b a a b",
    "x y z a b c",
    "the a b the c",
]


def _brute_phrase(docs, terms):
    out = {}
    for i, d in enumerate(docs):
        t = d.split()
        n = sum(
            1
            for j in range(len(t) - len(terms) + 1)
            if t[j : j + len(terms)] == list(terms)
        )
        if n:
            out[i] = n
    return out


def _brute_prox(docs, a, b, w):
    out = {}
    for i, d in enumerate(docs):
        t = d.split()
        n = sum(
            1
            for pi, x in enumerate(t)
            for pj, y in enumerate(t)
            if x == a and y == b and abs(pi - pj) <= w and (a != b or pi != pj)
        )
        if n:
            out[i] = n
    return out


def _write_src(tmp_path, docs, name="src"):
    import ray.data

    src = str(tmp_path / name)
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


@pytest.fixture(scope="module", params=[(1 << 22, 1), (2, 3)])
def pindex(ray_session, tmp_path_factory, request):
    shard_docs, num_parts = request.param
    tmp = tmp_path_factory.mktemp(f"pos_{shard_docs}_{num_parts}")
    src = _write_src(tmp, DOCS)
    idx = str(tmp / "idx")
    cfg = SparseConfig(tokenizer="whitespace", stemmer=None, stopwords=None)
    build_positional_index(src, idx, cfg, num_parts=num_parts, shard_docs=shard_docs)
    return PositionalIndex(idx)


@pytest.mark.parametrize(
    "terms",
    [["a", "b"], ["a", "b", "a"], ["c", "c"], ["b", "b"], ["x", "b"],
     ["z"], ["a"], ["y", "z", "a", "b"], ["missing", "a"]],
)
def test_phrase_matches_brute(pindex, terms):
    docs, n = pindex.phrase(terms)
    assert np.all(np.diff(docs) > 0)
    got = dict(zip(docs.tolist(), n.tolist()))
    assert got == _brute_phrase(DOCS, terms)


@pytest.mark.parametrize(
    "a,b,w",
    [("a", "b", 1), ("a", "b", 2), ("c", "c", 2), ("a", "x", 3),
     ("b", "b", 4), ("x", "z", 2), ("a", "missing", 5)],
)
def test_proximity_matches_brute(pindex, a, b, w):
    docs, n = pindex.proximity(a, b, w)
    got = dict(zip(docs.tolist(), n.tolist()))
    assert got == _brute_prox(DOCS, a, b, w)


def test_manifest_counts(pindex):
    m = pindex.manifest
    total_tokens = sum(len(d.split()) for d in DOCS)
    assert m["doc_count"] == len(DOCS)
    assert m["n_positions"] == total_tokens
    uniq_pairs = len({(t, i) for i, d in enumerate(DOCS) for t in d.split()})
    assert m["n_postings"] == uniq_pairs


def test_positions_roundtrip(pindex):
    # every term's decoded positions must equal raw token offsets
    for term in ["a", "b", "c", "x", "y", "z", "the"]:
        docs, offs, pos = pindex.get(term)
        for k, d in enumerate(docs.tolist()):
            exp = [i for i, t in enumerate(DOCS[d].split()) if t == term]
            assert pos[offs[k] : offs[k + 1]].tolist() == exp


def test_phrase_table_output(pindex):
    t = phrase_table(pindex, {"q": "a b"})
    assert t.column_names == ["q_id", "conv_id", "turn_idx", "n_occ"]
    got = dict(
        zip(
            [int(c[1:]) for c in t.column("conv_id").to_pylist()],
            t.column("n_occ").to_pylist(),
        )
    )
    assert got == _brute_phrase(DOCS, ["a", "b"])
    p = proximity_table(pindex, {"q": ("a", "b", 1)})
    assert p.column_names == ["q_id", "conv_id", "turn_idx", "n_pairs"]


def test_stopword_removal_renumbers_positions(ray_session, tmp_path):
    # "the" removed -> "quick fox" become adjacent (positions compact)
    src = _write_src(tmp_path, ["quick the fox", "quick brown fox"], "sw")
    idx = str(tmp_path / "sw_idx")
    cfg = SparseConfig(
        tokenizer="whitespace", stemmer=None, stopwords=["the"]
    )
    build_positional_index(src, idx, cfg, num_parts=2)
    px = PositionalIndex(idx)
    docs, n = px.phrase(["quick", "fox"])
    assert docs.tolist() == [0] and n.tolist() == [1]


def test_multiturn_doc_ids(ray_session, tmp_path):
    # two conversations, three turns each: doc_id = base + turn_idx
    import ray.data

    src = str(tmp_path / "mt")
    ray.data.from_arrow(
        pa.table(
            {
                "conv_id": ["a", "a", "a", "b", "b", "b"],
                "turn_idx": pa.array([0, 1, 2, 0, 1, 2], type=pa.int32()),
                "text": ["p q", "q p", "r", "p p", "q", "p q r"],
            }
        )
    ).write_parquet(src)
    idx = str(tmp_path / "mt_idx")
    cfg = SparseConfig(tokenizer="whitespace", stemmer=None, stopwords=None)
    build_positional_index(src, idx, cfg, num_parts=2, shard_docs=4)
    px = PositionalIndex(idx)
    docs, n = px.phrase(["p", "q"])
    assert docs.tolist() == [0, 5] and n.tolist() == [1, 1]
    convs, turns = px.to_original_ids(docs)
    assert convs.tolist() == ["a", "b"] and turns.tolist() == [0, 2]


def test_phrase_msearch_ds_matches_direct(pindex):
    from retriv_ray.index.positional import phrase_msearch_ds

    queries = [
        {"id": "qa", "text": "a b"},
        {"id": "qb", "text": "c c"},
        {"id": "qc", "text": "y z a"},
    ]
    ds = phrase_msearch_ds(pindex.index_dir, queries, concurrency=2)
    got = ds.to_pandas().sort_values(["q_id", "conv_id"]).reset_index(drop=True)
    import pandas as pd

    exp_frames = []
    for q in queries:
        t = phrase_table(pindex, {q["id"]: q["text"]})
        exp_frames.append(t.to_pandas())
    exp = (
        pd.concat(exp_frames)
        .sort_values(["q_id", "conv_id"])
        .reset_index(drop=True)
    )
    assert got.equals(exp)


def test_build_with_reused_conv_offsets(ray_session, tmp_path):
    # offsets reuse from a main index over the same source must yield
    # an identical positional index
    from retriv_ray.index.build import build_index

    src = _write_src(tmp_path, DOCS, "reuse")
    cfg = SparseConfig(tokenizer="whitespace", stemmer=None, stopwords=None)
    main_idx = str(tmp_path / "main_idx")
    build_index(src, main_idx, cfg, num_parts=2, resume=False)
    a, b = str(tmp_path / "pa"), str(tmp_path / "pb")
    build_positional_index(src, a, cfg, num_parts=2)
    build_positional_index(src, b, cfg, num_parts=2, conv_offsets_source=main_idx)
    pa_, pb_ = PositionalIndex(a), PositionalIndex(b)
    for terms in (["a", "b"], ["c", "c"]):
        da, na = pa_.phrase(terms)
        db, nb = pb_.phrase(terms)
        assert da.tolist() == db.tolist() and na.tolist() == nb.tolist()
    assert pa_.manifest["n_positions"] == pb_.manifest["n_positions"]


def test_proximity_msearch_ds_matches_direct(pindex):
    from retriv_ray.index.positional import proximity_msearch_ds

    queries = [
        {"id": "p1", "term_a": "a", "term_b": "b", "window": 1},
        {"id": "p2", "term_a": "c", "term_b": "c", "window": 2},
    ]
    got = (
        proximity_msearch_ds(pindex.index_dir, queries, concurrency=2)
        .to_pandas()
        .sort_values(["q_id", "conv_id"])
        .reset_index(drop=True)
    )
    import pandas as pd

    exp = (
        pd.concat(
            [
                proximity_table(
                    pindex, {q["id"]: (q["term_a"], q["term_b"], q["window"])}
                ).to_pandas()
                for q in queries
            ]
        )
        .sort_values(["q_id", "conv_id"])
        .reset_index(drop=True)
    )
    assert got.equals(exp)


def test_phrase_respects_tombstones(ray_session, tmp_path):
    from retriv_ray.index.tombstones import delete_conversations

    src = _write_src(tmp_path, DOCS, "tomb")
    idx = str(tmp_path / "tomb_idx")
    cfg = SparseConfig(tokenizer="whitespace", stemmer=None, stopwords=None)
    build_positional_index(src, idx, cfg, num_parts=2)
    px = PositionalIndex(idx)
    docs0, _ = px.phrase(["a", "b"])
    assert 0 in docs0.tolist()
    delete_conversations(idx, ["c000"])
    px.reload_tombstones()
    docs1, _ = px.phrase(["a", "b"])
    assert 0 not in docs1.tolist()
    assert set(docs1.tolist()) == set(docs0.tolist()) - {0}
    pdocs, _ = px.proximity("a", "b", 2)
    assert 0 not in pdocs.tolist()


def test_phrase_bm25_table(ray_session, tmp_path):
    import math

    from retriv_ray.index.build import build_index
    from retriv_ray.index.positional import phrase_bm25_table
    from retriv_ray.search.searcher import RaySparseRetriever

    docs = ["a b a b", "a b c", "c a b a b a b x", "x y", "a b"]
    src = _write_src(tmp_path, docs, "pb")
    cfg = SparseConfig(tokenizer="whitespace", stemmer=None, stopwords=None)
    main_idx = str(tmp_path / "pb_main")
    build_index(src, main_idx, cfg, num_parts=2, resume=False)
    pos_idx = str(tmp_path / "pb_pos")
    build_positional_index(src, pos_idx, cfg, num_parts=2)
    px = PositionalIndex(pos_idx)
    r = RaySparseRetriever(main_idx, cfg)
    t = phrase_bm25_table(px, r.index, {"q": "a b"}, cutoff=10)
    got = [int(c[1:]) for c in t.column("conv_id").to_pylist()]

    # brute-force: tf = occurrences, df = matching docs, BM25 formula
    lens = [len(d.split()) for d in docs]
    avg = sum(lens) / len(docs)
    occ = {
        i: sum(
            1
            for j in range(len(d.split()) - 1)
            if d.split()[j : j + 2] == ["a", "b"]
        )
        for i, d in enumerate(docs)
    }
    occ = {i: n for i, n in occ.items() if n}
    dfv = len(occ)
    idf = math.log(1 + (len(docs) - dfv + 0.5) / (dfv + 0.5))
    scores = {
        i: idf * n * 2.2 / (n + 1.2 * (1 - 0.75 + 0.75 * lens[i] / avg))
        for i, n in occ.items()
    }
    exp = [i for i, _s in sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))]
    assert got == exp
    assert t.column("rank").to_pylist() == list(range(1, len(exp) + 1))
