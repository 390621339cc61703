"""Differential tests: distributed Ray build vs the in-memory parity
oracle (retriv_ray.index.inmem reproduces the reference build
semantics; see tests/test_golden_search.py for the reference golden
values themselves)."""

import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from retriv_ray.config import SparseConfig
from retriv_ray.index.build import build_index
from retriv_ray.index.inmem import InMemoryIndex, LocalSparseRetriever
from retriv_ray.search.searcher import RaySparseRetriever
from retriv_ray.sources.transcripts import shane_transcripts, transcripts_table
from retriv_ray.text.pipeline import TextPreprocessor


def _write_parquet(table: pa.Table, path):
    pq.write_table(table, path)
    return str(path)


def _inmem_from_table(table: pa.Table, cfg: SparseConfig):
    """Oracle build: enumeration order == (conv_id, turn_idx) sort."""
    t = table.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    pre = TextPreprocessor(cfg)
    token_lists = pre.tokens_many(t.column("text").to_pylist())
    idx = InMemoryIndex.from_token_lists(token_lists, cfg.min_df)
    ids = list(zip(t.column("conv_id").to_pylist(), t.column("turn_idx").to_pylist()))
    return idx, ids


@pytest.fixture(scope="module")
def synth(tmp_path_factory, ray_session):
    """120-conv synthetic transcripts, built distributed + oracle."""
    tmp = tmp_path_factory.mktemp("synth")
    table = transcripts_table(120, seed=7)
    src = _write_parquet(table, tmp / "transcripts.parquet")
    cfg = SparseConfig()
    index_dir = str(tmp / "index")
    man = build_index(src, index_dir, cfg, num_parts=4, batch_size=64)
    idx, ids = _inmem_from_table(table, cfg)
    return table, src, cfg, index_dir, man, idx, ids


def test_build_stats_match_oracle(synth):
    _, _, _, _, man, idx, _ = synth
    assert man.doc_count == idx.doc_count
    assert man.n_terms == len(idx.vocabulary)
    assert man.n_postings == sum(len(v[0]) for v in idx.postings.values())
    assert np.float32(man.avg_doc_len) == idx.avg_doc_len


def test_postings_match_oracle(synth):
    _, _, _, index_dir, _, idx, _ = synth
    r = RaySparseRetriever(index_dir)
    assert set(r.index.term_df) == idx.vocabulary
    for term, (o_ids, o_tfs) in idx.postings.items():
        d, f = r.index.get_postings(term)
        assert np.array_equal(d, o_ids), term
        assert np.array_equal(f, o_tfs), term
        assert r.index.term_df[term] == len(o_ids)


def test_doc_lens_match_oracle(synth):
    _, _, _, index_dir, _, idx, _ = synth
    r = RaySparseRetriever(index_dir)
    assert np.array_equal(r.index.doc_lens, idx.doc_lens)
    assert r.index.avg_doc_len == idx.avg_doc_len
    assert np.array_equal(r.index.relative_doc_lens, idx.relative_doc_lens)


def test_search_scores_match_oracle(synth):
    table, _, cfg, index_dir, _, idx, ids = synth
    r = RaySparseRetriever(index_dir)
    lr = LocalSparseRetriever(cfg)
    lr.index = idx
    lr.ids = ids
    for q in ["the running test", "deployment error analyzer", "tok0003 tok0199", "zzz-unknown"]:
        got = r.search(q, cutoff=25)
        want = lr.search(q, cutoff=25)
        assert list(got.keys()) == list(want.keys()), q
        assert [*got.values()] == [*want.values()], q


def test_msearch_ds_matches_search(synth, ray_session):
    _, _, _, index_dir, _, _, _ = synth
    r = RaySparseRetriever(index_dir)
    queries = [
        {"id": "q1", "text": "the running test"},
        {"id": "q2", "text": "deployment error"},
        {"id": "q3", "text": "zzz-unknown"},
    ]
    out = r.msearch_ds(queries, cutoff=10, concurrency=2).to_pandas()
    for q in queries:
        sub = out[out.q_id == q["id"]].sort_values("rank")
        want = r.search(q["text"], cutoff=10)
        assert [tuple(x) for x in sub[["conv_id", "turn_idx"]].to_numpy()] == [
            (c, t) for (c, t) in want.keys()
        ]
        assert np.allclose(sub.score.to_numpy(), np.fromiter(want.values(), float), rtol=0, atol=0)


def test_determinism_across_parallelism(tmp_path, ray_session):
    table = transcripts_table(40, seed=11)
    src = _write_parquet(table, tmp_path / "t.parquet")
    cfg = SparseConfig()
    d1, d2 = str(tmp_path / "i1"), str(tmp_path / "i2")
    build_index(src, d1, cfg, num_parts=3, batch_size=17)
    build_index(src, d2, cfg, num_parts=3, batch_size=256, tokenize_concurrency=2)
    seg1 = sorted(os.listdir(os.path.join(d1, "segments")))
    seg2 = sorted(os.listdir(os.path.join(d2, "segments")))
    assert seg1 == seg2
    for name in seg1:
        t1 = pq.read_table(os.path.join(d1, "segments", name))
        t2 = pq.read_table(os.path.join(d2, "segments", name))
        assert t1.equals(t2), name


def test_direct_and_dataset_shuffle_byte_identical(tmp_path, ray_session):
    """The direct hash shuffle (fused map-side partition + per-bucket
    reduce tasks) and the Dataset sort-shuffle fallback must produce
    byte-identical index directories: _reduce_group lexsorts each
    group's globally unique (term, doc) pairs, so routing cannot
    change output."""
    table = transcripts_table(60, seed=19)
    src = _write_parquet(table, tmp_path / "t.parquet")
    cfg = SparseConfig(min_df=2)
    d1, d2 = str(tmp_path / "direct"), str(tmp_path / "dataset")
    build_index(src, d1, cfg, num_parts=5, shard_docs=256, batch_size=64)
    os.environ["GRAFT_FORCE_DATASET_SHUFFLE"] = "1"
    try:
        build_index(src, d2, cfg, num_parts=5, shard_docs=256, batch_size=64)
    finally:
        del os.environ["GRAFT_FORCE_DATASET_SHUFFLE"]
    for sub in ("segments", "doc_lens", "terms"):
        f1 = sorted(os.listdir(os.path.join(d1, sub)))
        f2 = sorted(os.listdir(os.path.join(d2, sub)))
        assert f1 == f2, sub
        for name in f1:
            b1 = open(os.path.join(d1, sub, name), "rb").read()
            b2 = open(os.path.join(d2, sub, name), "rb").read()
            assert b1 == b2, (sub, name)


def test_min_df_pruning_and_doc_lens(tmp_path, ray_session):
    table = transcripts_table(60, seed=3)
    src = _write_parquet(table, tmp_path / "t.parquet")
    cfg = SparseConfig(min_df=3)
    index_dir = str(tmp_path / "idx")
    man = build_index(src, index_dir, cfg, num_parts=4, batch_size=50)
    idx, _ = _inmem_from_table(table, cfg)
    r = RaySparseRetriever(index_dir)
    assert set(r.index.term_df) == idx.vocabulary
    assert man.n_terms == len(idx.vocabulary)
    # the min_df<->doc_lens coupling (reference build_inverted_index.py:35-63)
    assert np.array_equal(r.index.doc_lens, idx.doc_lens)
    assert r.index.avg_doc_len == idx.avg_doc_len


def test_resume_skips_completed_and_rebuilds_missing(tmp_path, ray_session):
    table = transcripts_table(30, seed=5)
    src = _write_parquet(table, tmp_path / "t.parquet")
    cfg = SparseConfig()
    index_dir = str(tmp_path / "idx")
    build_index(src, index_dir, cfg, num_parts=4)
    segs = sorted(os.listdir(os.path.join(index_dir, "segments")))
    ref = {
        n: pq.read_table(os.path.join(index_dir, "segments", n)) for n in segs
    }
    # simulate a crash that lost one segment + its lineage
    victim = segs[0]
    gkey_dir = os.path.join(index_dir, "lineage")
    os.remove(os.path.join(index_dir, "segments", victim))
    shard, part = victim[len("seg-"):-len(".parquet")].split("-")
    # lineage files are keyed by gkey = shard*(P+1)+part
    gkey = int(shard) * 5 + int(part)
    os.remove(os.path.join(gkey_dir, f"part-{gkey:05d}.json"))
    man2 = build_index(src, index_dir, cfg, num_parts=4, resume=True)
    assert man2.doc_count == table.num_rows
    for n in segs:
        t = pq.read_table(os.path.join(index_dir, "segments", n))
        assert t.equals(ref[n]), n


def test_shane_golden_through_distributed_path(tmp_path, ray_session):
    """FIXTURES.md F2 — the reference golden scores
    (tests/sparse_retriever/search_engine_test.py:34-59) through the
    full Ray build + segment query path."""
    src = _write_parquet(shane_transcripts(), tmp_path / "shane.parquet")
    index_dir = str(tmp_path / "idx")
    expectations = [
        (dict(b=0.5, k1=0.0), {f"c{i}": 0.07410797 for i in range(1, 7)}),
        (
            dict(b=0.0, k1=10.0),
            {
                "c1": 0.07410797,
                "c2": 0.07410797,
                "c3": 0.07410797,
                "c4": 0.07410797,
                "c5": 0.13586462,
                "c6": 0.18812023,
            },
        ),
        (
            dict(b=1.0, k1=5.0),
            {
                "c1": 0.16674294,
                "c2": 0.10261103,
                "c3": 0.07410797,
                "c4": 0.10261103,
                "c5": 0.10261103,
                "c6": 0.10261105,
            },
        ),
    ]
    for hp, want in expectations:
        cfg = SparseConfig(hyperparams=hp)
        d = os.path.join(index_dir, f"b{hp['b']}k{hp['k1']}")
        build_index(src, d, cfg, num_parts=2)
        r = RaySparseRetriever(d, cfg)
        got = r.search("shane", cutoff=100)
        got_by_conv = {c: s for (c, t), s in got.items()}
        assert set(got_by_conv) == set(want)
        for c, s in want.items():
            assert math.isclose(got_by_conv[c], s, rel_tol=1e-6), (hp, c)


def test_multishard_layout(tmp_path, ray_session):
    """Tiny shard_docs forces multiple doc-range shards; postings must
    concatenate across shards identically (hot-term skew splitting)."""
    table = transcripts_table(50, seed=13)
    src = _write_parquet(table, tmp_path / "t.parquet")
    cfg = SparseConfig()
    d1, d2 = str(tmp_path / "one"), str(tmp_path / "many")
    build_index(src, d1, cfg, num_parts=3)
    build_index(src, d2, cfg, num_parts=3, shard_docs=37)
    r1, r2 = RaySparseRetriever(d1), RaySparseRetriever(d2)
    assert len(r2.index.shards) > 3
    assert set(r1.index.term_df) == set(r2.index.term_df)
    for term in list(r1.index.term_df)[:50] + ["the", "of", "test"]:
        if term not in r1.index.term_df:
            continue
        d_a, f_a = r1.index.get_postings(term)
        d_b, f_b = r2.index.get_postings(term)
        assert np.array_equal(d_a, d_b) and np.array_equal(f_a, f_b), term
    q = "the running test deployment"
    assert r1.search(q, cutoff=20) == r2.search(q, cutoff=20)


def test_msearch_parallel_matches_search(synth, ray_session):
    """Persistent scorer actor pool returns exactly the per-query
    search results (same kernel, same order)."""
    _table, _src, cfg, index_dir, _man, _idx, _ids = synth
    r = RaySparseRetriever(index_dir, cfg)
    queries = [
        {"id": "q1", "text": "the running test"},
        {"id": "q2", "text": "deployment error file"},
        {"id": "q3", "text": ""},
    ]
    tbl = r.msearch_parallel(queries, cutoff=7, num_replicas=2)
    by_q = {}
    for row in tbl.to_pylist():
        by_q.setdefault(row["q_id"], []).append(row)
    for q in queries:
        want = r.search(q["text"], cutoff=7)
        got = sorted(by_q.get(q["id"], []), key=lambda r_: r_["rank"])
        assert [(r_["conv_id"], r_["turn_idx"]) for r_ in got] == [
            k for k in want
        ]
        assert [r_["score"] for r_ in got] == [float(v) for v in want.values()]


def test_duplicate_turn_idx_compensating_gap_fails_loudly(ray_session):
    """turn_idx [0,1,1,3] passes a min/max/count check (count=4,
    max=3) but would assign duplicate doc_ids; the sum invariant
    (sum == n(n-1)/2) must reject it."""
    import ray.data

    from retriv_ray.index.build import compute_conv_offsets

    t = pa.Table.from_arrays(
        [
            pa.array(["c1"] * 4),
            pa.array([0, 1, 1, 3], type=pa.int32()),
            pa.array(["a", "b", "c", "d"]),
        ],
        names=["conv_id", "turn_idx", "text"],
    )
    with pytest.raises(ValueError, match="duplicate-free"):
        compute_conv_offsets(ray.data.from_arrow(t))


def test_invalid_turn_idx_raises_and_wipes(tmp_path, ray_session):
    # duplicate turn_idx: the overlapped-offsets validation must raise
    # a ValueError AND leave no partial index behind (never-validated
    # doc_ids must not survive for a later resume)
    src = str(tmp_path / "bad.parquet")
    pq.write_table(
        pa.table(
            {
                "conv_id": ["c0", "c0", "c0", "c1"],
                "turn_idx": pa.array([0, 1, 1, 0], type=pa.int32()),
                "text": ["a b", "c d", "e f", "g h"],
            }
        ),
        src,
    )
    idx = str(tmp_path / "idx")
    with pytest.raises(ValueError, match="contiguous"):
        build_index(src, idx, SparseConfig(), num_parts=2, resume=False)
    assert not os.path.exists(idx)


def test_sharded_conv_map_byte_identical(tmp_path, ray_session):
    """VERDICT r3 #1: the bucketed conv-map path (distributed offsets,
    no whole-map gather/broadcast) must produce a byte-identical index
    to the broadcast path, and serving must read the bucketed id_map."""
    table = transcripts_table(80, seed=23)
    src = _write_parquet(table, tmp_path / "t.parquet")
    cfg = SparseConfig()
    d1, d2 = str(tmp_path / "broadcast"), str(tmp_path / "sharded")
    build_index(src, d1, cfg, num_parts=4, shard_docs=256, batch_size=64)
    os.environ["GRAFT_CONV_MAP"] = "sharded"
    os.environ["GRAFT_CONV_BUCKETS"] = "4"
    os.environ["GRAFT_CONV_BUCKET_CACHE"] = "2"  # force eviction too
    try:
        man2 = build_index(src, d2, cfg, num_parts=4, shard_docs=256, batch_size=64)
    finally:
        for k in ("GRAFT_CONV_MAP", "GRAFT_CONV_BUCKETS", "GRAFT_CONV_BUCKET_CACHE"):
            del os.environ[k]
    # index bytes identical (doc_ids don't depend on the map's layout)
    for sub in ("segments", "doc_lens", "terms"):
        f1 = sorted(os.listdir(os.path.join(d1, sub)))
        f2 = sorted(os.listdir(os.path.join(d2, sub)))
        assert f1 == f2, sub
        for name in f1:
            b1 = open(os.path.join(d1, sub, name), "rb").read()
            b2 = open(os.path.join(d2, sub, name), "rb").read()
            assert b1 == b2, (sub, name)
    # id_map: sharded layout has bucket files, no single file; content
    # equal after concat
    from retriv_ray.index.build import read_conv_offsets

    id2 = sorted(os.listdir(os.path.join(d2, "id_map")))
    assert "conv_offsets.parquet" not in id2
    assert len([f for f in id2 if f.startswith("conv_offsets-")]) > 1
    assert read_conv_offsets(d2).equals(read_conv_offsets(d1))
    assert man2.doc_count == table.num_rows
    # serving over the bucketed id_map
    r1, r2 = RaySparseRetriever(d1), RaySparseRetriever(d2)
    q = "error in the tool output"
    assert r1.search(q, cutoff=10) == r2.search(q, cutoff=10)


def test_sharded_conv_map_rejects_bad_turn_idx(tmp_path, ray_session):
    """Contiguity validation must fire on the sharded path too."""
    import ray.data

    from retriv_ray.index.build import compute_conv_offsets_sharded

    t = pa.table(
        {
            "conv_id": ["a", "a", "b", "b"],
            "turn_idx": pa.array([0, 2, 0, 1], type=pa.int32()),
        }
    )
    with pytest.raises(Exception, match="contiguous"):
        compute_conv_offsets_sharded(
            ray.data.from_arrow(t), str(tmp_path / "idx")
        )
