"""merge_indexes differential: byte-identical to a full rebuild over
the concatenated input, across aligned and straddling shard
boundaries."""

import filecmp
import os

import numpy as np
import pyarrow as pa
import pytest

from retriv_ray.config import SparseConfig
from retriv_ray.index.build import build_index
from retriv_ray.index.merge import merge_indexes
from retriv_ray.search.searcher import RaySparseRetriever

WORDS = ["red", "green", "blue", "yellow", "purple", "cyan", "olive", "teal"]


def _docs(lo, hi, seed=3):
    rng = np.random.RandomState(seed)
    out = []
    for i in range(lo, hi):
        n = int(rng.randint(3, 12))
        out.append(
            {
                "conv_id": f"c{i:05d}",
                "turn_idx": 0,
                "text": " ".join(WORDS[int(rng.randint(len(WORDS)))] for _ in range(n)),
            }
        )
    return out


def _write(tmp, rows, name):
    import ray.data

    src = str(tmp / name)
    ray.data.from_arrow(
        pa.table(
            {
                "conv_id": [r["conv_id"] for r in rows],
                "turn_idx": pa.array([r["turn_idx"] for r in rows], type=pa.int32()),
                "text": [r["text"] for r in rows],
            }
        )
    ).write_parquet(src)
    return src


def _tree_files(d):
    out = {}
    for root, _dirs, files in os.walk(d):
        for f in files:
            p = os.path.join(root, f)
            out[os.path.relpath(p, d)] = p
    return out


CFG = SparseConfig(tokenizer="whitespace", stemmer=None, stopwords=None)


@pytest.mark.parametrize("shard_docs,n_a,n_b", [
    (16, 32, 24),   # aligned boundary: offset % shard_docs == 0
    (16, 27, 29),   # straddling boundary shard
    (1 << 22, 30, 30),  # single shard end to end
])
def test_merge_byte_identical_to_rebuild(ray_session, tmp_path, shard_docs, n_a, n_b):
    rows = _docs(0, n_a + n_b)
    src_all = _write(tmp_path, rows, "all")
    src_a = _write(tmp_path, rows[:n_a], "a")
    src_b = _write(tmp_path, rows[n_a:], "b")
    full = str(tmp_path / "full")
    ia, ib, merged = str(tmp_path / "ia"), str(tmp_path / "ib"), str(tmp_path / "m")
    build_index(src_all, full, CFG, num_parts=3, shard_docs=shard_docs, resume=False)
    build_index(src_a, ia, CFG, num_parts=3, shard_docs=shard_docs, resume=False)
    build_index(src_b, ib, CFG, num_parts=3, shard_docs=shard_docs, resume=False)
    man = merge_indexes(ia, ib, merged)
    assert man["doc_count"] == n_a + n_b

    f_full, f_m = _tree_files(full), _tree_files(merged)
    for sub in ("segments", "doc_lens", "terms", "id_map"):
        keys_full = sorted(k for k in f_full if k.startswith(sub))
        keys_m = sorted(k for k in f_m if k.startswith(sub))
        assert keys_full == keys_m, (sub, keys_full, keys_m)
        for k in keys_full:
            assert filecmp.cmp(f_full[k], f_m[k], shallow=False), k

    # manifest-level stats equality (fingerprints differ by design)
    rf = RaySparseRetriever(full, CFG)
    rm = RaySparseRetriever(merged, CFG)
    assert rf.index.manifest.avg_doc_len == rm.index.manifest.avg_doc_len
    assert rf.index.manifest.n_postings == rm.index.manifest.n_postings
    assert rf.index.manifest.n_terms == rm.index.manifest.n_terms
    for q in ["red green", "blue", "teal purple olive"]:
        assert rf.search(q, cutoff=10) == rm.search(q, cutoff=10)


def test_merge_validations(ray_session, tmp_path):
    rows = _docs(0, 20)
    src_a = _write(tmp_path, rows[:10], "a")
    src_b = _write(tmp_path, rows[10:], "b")
    ia, ib = str(tmp_path / "ia"), str(tmp_path / "ib")
    build_index(src_a, ia, CFG, num_parts=2, resume=False)
    build_index(src_b, ib, CFG, num_parts=2, resume=False)

    # order violation: B before A
    with pytest.raises(ValueError, match="sort strictly after"):
        merge_indexes(ib, ia, str(tmp_path / "m1"))

    # config mismatch
    other = str(tmp_path / "other")
    build_index(
        src_b, other,
        SparseConfig(tokenizer="whitespace", stemmer="english", stopwords=None),
        num_parts=2, resume=False,
    )
    with pytest.raises(ValueError, match="configs differ"):
        merge_indexes(ia, other, str(tmp_path / "m2"))

    # min_df > 1 unsupported
    mdf = SparseConfig(tokenizer="whitespace", stemmer=None, stopwords=None, min_df=2)
    ia2, ib2 = str(tmp_path / "ia2"), str(tmp_path / "ib2")
    build_index(src_a, ia2, mdf, num_parts=2, resume=False)
    build_index(src_b, ib2, mdf, num_parts=2, resume=False)
    with pytest.raises(NotImplementedError, match="min_df"):
        merge_indexes(ia2, ib2, str(tmp_path / "m3"))


def test_merge_chain_three_ways(ray_session, tmp_path):
    # (A + B) + C == full rebuild — the compaction chain
    rows = _docs(0, 48, seed=9)
    srcs = [_write(tmp_path, rows[i * 16 : (i + 1) * 16], f"s{i}") for i in range(3)]
    idxs = []
    for i, s in enumerate(srcs):
        d = str(tmp_path / f"i{i}")
        build_index(s, d, CFG, num_parts=2, shard_docs=16, resume=False)
        idxs.append(d)
    ab = str(tmp_path / "ab")
    merge_indexes(idxs[0], idxs[1], ab)
    abc = str(tmp_path / "abc")
    merge_indexes(ab, idxs[2], abc)
    full = str(tmp_path / "full3")
    build_index(_write(tmp_path, rows, "all3"), full, CFG, num_parts=2, shard_docs=16, resume=False)
    f_full, f_m = _tree_files(full), _tree_files(abc)
    for sub in ("segments", "doc_lens", "terms", "id_map"):
        for k in sorted(k for k in f_full if k.startswith(sub)):
            assert filecmp.cmp(f_full[k], f_m[k], shallow=False), k


@pytest.mark.parametrize("shard_docs,n_a,n_b", [
    (16, 32, 24),
    (16, 27, 29),
    (1 << 22, 30, 30),
])
def test_positional_merge_byte_identical(ray_session, tmp_path, shard_docs, n_a, n_b):
    from retriv_ray.index.merge import merge_positional_indexes
    from retriv_ray.index.positional import PositionalIndex, build_positional_index

    rows = _docs(0, n_a + n_b, seed=21)
    src_all = _write(tmp_path, rows, "pall")
    src_a = _write(tmp_path, rows[:n_a], "pa")
    src_b = _write(tmp_path, rows[n_a:], "pb")
    full, ia, ib, merged = (
        str(tmp_path / d) for d in ("pfull", "pia", "pib", "pm")
    )
    for s_, d_ in ((src_all, full), (src_a, ia), (src_b, ib)):
        build_positional_index(s_, d_, CFG, num_parts=3, shard_docs=shard_docs)
    man = merge_positional_indexes(ia, ib, merged)
    assert man["doc_count"] == n_a + n_b
    f_full, f_m = _tree_files(full), _tree_files(merged)
    seg_f = sorted(k for k in f_full if k.startswith("segments"))
    seg_m = sorted(k for k in f_m if k.startswith("segments"))
    assert seg_f == seg_m
    for k in seg_f:
        assert filecmp.cmp(f_full[k], f_m[k], shallow=False), k
    assert filecmp.cmp(
        f_full["id_map/conv_offsets.parquet"],
        f_m["id_map/conv_offsets.parquet"],
        shallow=False,
    )
    pf, pm = PositionalIndex(full), PositionalIndex(merged)
    assert pf.manifest["n_terms"] == pm.manifest["n_terms"]
    assert pf.manifest["n_positions"] == pm.manifest["n_positions"]
    for phrase in (["red", "green"], ["blue"], ["teal", "purple"]):
        df_, nf = pf.phrase(phrase)
        dm, nm = pm.phrase(phrase)
        assert df_.tolist() == dm.tolist() and nf.tolist() == nm.tolist()


def test_merge_sharded_id_map_layout(ray_session, tmp_path, monkeypatch):
    """Merging indexes built with the SLICE id_map layout
    (GRAFT_CONV_MAP=sharded): A's slices copy verbatim, B's rebase in
    Ray tasks, the merged id_map stays sliced, the dual reader
    resolves it, and search results match the broadcast-layout merge
    over the same input."""
    rows = _docs(0, 56, seed=11)
    src_a = _write(tmp_path, rows[:28], "sa")
    src_b = _write(tmp_path, rows[28:], "sb")
    ia, ib = str(tmp_path / "sia"), str(tmp_path / "sib")
    monkeypatch.setenv("GRAFT_CONV_MAP", "sharded")
    monkeypatch.setenv("GRAFT_CONV_BUCKETS", "3")
    build_index(src_a, ia, CFG, num_parts=3, shard_docs=16, resume=False)
    build_index(src_b, ib, CFG, num_parts=3, shard_docs=16, resume=False)
    monkeypatch.delenv("GRAFT_CONV_MAP")
    monkeypatch.delenv("GRAFT_CONV_BUCKETS")
    merged = str(tmp_path / "sm")
    man = merge_indexes(ia, ib, merged)
    assert man["doc_count"] == 56
    id_map = os.listdir(os.path.join(merged, "id_map"))
    assert any(f.startswith("conv_offsets-") for f in id_map)
    assert "conv_offsets.parquet" not in id_map

    ia2, ib2 = str(tmp_path / "bia"), str(tmp_path / "bib")
    build_index(src_a, ia2, CFG, num_parts=3, shard_docs=16, resume=False)
    build_index(src_b, ib2, CFG, num_parts=3, shard_docs=16, resume=False)
    m2 = str(tmp_path / "bm")
    merge_indexes(ia2, ib2, m2)

    from retriv_ray.index.build import read_conv_offsets

    assert read_conv_offsets(merged).equals(read_conv_offsets(m2))
    rs, rb = RaySparseRetriever(merged, CFG), RaySparseRetriever(m2, CFG)
    for q in ["red green", "blue", "teal purple olive"]:
        assert rs.search(q, cutoff=10) == rb.search(q, cutoff=10)


def test_positional_merge_sharded_id_map(ray_session, tmp_path, monkeypatch):
    """Positional merge over slice-layout id_maps: merged manifest
    records conv_offsets_dir, phrase results and reverse id mapping
    match the broadcast-layout merge."""
    from retriv_ray.index.merge import merge_positional_indexes
    from retriv_ray.index.positional import PositionalIndex, build_positional_index

    rows = _docs(0, 48, seed=13)
    src_a = _write(tmp_path, rows[:24], "psa")
    src_b = _write(tmp_path, rows[24:], "psb")
    ia, ib = str(tmp_path / "psia"), str(tmp_path / "psib")
    monkeypatch.setenv("GRAFT_CONV_MAP", "sharded")
    monkeypatch.setenv("GRAFT_CONV_BUCKETS", "3")
    build_positional_index(src_a, ia, CFG, num_parts=3, shard_docs=16)
    build_positional_index(src_b, ib, CFG, num_parts=3, shard_docs=16)
    monkeypatch.delenv("GRAFT_CONV_MAP")
    monkeypatch.delenv("GRAFT_CONV_BUCKETS")
    merged = str(tmp_path / "psm")
    man = merge_positional_indexes(ia, ib, merged)
    assert man["doc_count"] == 48
    assert man["conv_offsets_dir"] == merged

    ia2, ib2 = str(tmp_path / "pbia"), str(tmp_path / "pbib")
    build_positional_index(src_a, ia2, CFG, num_parts=3, shard_docs=16)
    build_positional_index(src_b, ib2, CFG, num_parts=3, shard_docs=16)
    m2 = str(tmp_path / "pbm")
    merge_positional_indexes(ia2, ib2, m2)

    ps, pb = PositionalIndex(merged), PositionalIndex(m2)
    for phrase in (["red", "green"], ["blue"], ["teal", "purple"]):
        ds_, ns = ps.phrase(phrase)
        db_, nb_ = pb.phrase(phrase)
        assert ds_.tolist() == db_.tolist() and ns.tolist() == nb_.tolist()
        cs, ts = ps.to_original_ids(ds_)
        cb, tb = pb.to_original_ids(db_)
        assert cs.tolist() == cb.tolist() and ts.tolist() == tb.tolist()
