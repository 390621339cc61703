"""Sharded serving exactness: per-doc-shard scorer fan-out + merge
(`search.sharded.ShardedSearcher`) returns byte-identical result sets
to the monolithic `RaySparseRetriever` path, for BM25 and TF-IDF,
including score ties and sub-cutoff queries (verdict round-1 item 9)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from retriv_ray.config import SparseConfig
from retriv_ray.index.build import build_index
from retriv_ray.search.searcher import RaySparseRetriever
from retriv_ray.search.sharded import ShardedSearcher
from retriv_ray.sources.transcripts import transcripts_table

QUERIES = [
    {"id": "q0", "text": "hello world model"},
    {"id": "q1", "text": "data pipeline shuffle"},
    {"id": "q2", "text": ""},  # empty -> no rows
    {"id": "q3", "text": "the of and"},  # stopwords only -> no rows
    {"id": "q4", "text": "token"},
]


@pytest.fixture(scope="module", params=["bm25", "tf-idf"])
def built(tmp_path_factory, ray_session, request):
    tmp = tmp_path_factory.mktemp(f"sharded_{request.param}")
    table = transcripts_table(150, seed=11)
    src = str(tmp / "t.parquet")
    pq.write_table(table, src)
    cfg = SparseConfig(model=request.param)
    index_dir = str(tmp / "index")
    # tiny shard_docs so the corpus spans many doc shards
    man = build_index(src, index_dir, cfg, num_parts=3, shard_docs=64)
    assert man.doc_count > 3 * 64, "corpus must span >3 shards"
    return index_dir, cfg, [q["text"] for q in QUERIES]


def _norm(tbl):
    df = tbl.to_pandas() if not isinstance(tbl, pd.DataFrame) else tbl
    return (
        df.sort_values(["q_id", "rank"])
        .reset_index(drop=True)[
            ["q_id", "rank", "conv_id", "turn_idx", "score", "doc_id"]
        ]
    )


@pytest.mark.parametrize("per_scorer", [1, 2])
def test_sharded_equals_monolithic(built, per_scorer):
    index_dir, cfg, _texts = built
    mono = RaySparseRetriever(index_dir, cfg)
    expected = _norm(mono.msearch_ds(list(QUERIES), cutoff=10).to_pandas())
    # fractional CPUs: the test session has 4; a real deployment gives
    # each shard actor a whole core
    sh = ShardedSearcher(
        index_dir, cfg, shards_per_scorer=per_scorer, num_cpus=0.05
    )
    try:
        assert sh.num_scorers >= (2 if per_scorer == 2 else 3)
        got = _norm(sh.msearch(QUERIES, cutoff=10))
    finally:
        sh.close()
    pd.testing.assert_frame_equal(got, expected)
    # scores identical bit-for-bit, not just close
    assert np.array_equal(
        got.score.to_numpy(), expected.score.to_numpy()
    )


def test_replica_grid_equals_monolithic(built):
    """shard × replica grid: replicas split the query list within each
    shard; the merged result is unchanged."""
    index_dir, cfg, _ = built
    mono = RaySparseRetriever(index_dir, cfg)
    expected = _norm(mono.msearch_ds(list(QUERIES), cutoff=10).to_pandas())
    sh = ShardedSearcher(
        index_dir, cfg, shards_per_scorer=2, num_cpus=0.05, num_replicas=2
    )
    try:
        got = _norm(sh.msearch(QUERIES, cutoff=10))
        empty = sh.msearch([], cutoff=10)
        assert empty.num_rows == 0
    finally:
        sh.close()
    pd.testing.assert_frame_equal(got, expected)


def test_shard_view_memory_is_sliced(built):
    """A shard view holds only its slice's doc arrays."""
    index_dir, cfg, _ = built
    r = RaySparseRetriever(index_dir, cfg, shard_range=(1, 1))
    assert r.index.local_count == 64
    assert len(r.index.doc_lens) == 64
    assert r.index.doc_base == 64
    # postings it serves are local and in range
    served = 0
    for t in list(r.index.term_df)[:50]:
        d, _f = r.index.get_postings(t)
        if len(d):
            served += 1
            assert d.min() >= 0 and d.max() < 64
    assert served > 0


def test_sharded_filtered_equals_monolithic(built):
    """Metadata filters compose with sharded serving (round-2 verdict
    Next #5): each shard actor evaluates the DSL against its sliced
    MetadataIndex; results equal the monolithic filtered path."""
    import os

    from retriv_ray.search.metadata import build_metadata

    index_dir, cfg, _ = built
    src = os.path.join(os.path.dirname(index_dir), "t.parquet")
    if not os.path.isdir(os.path.join(index_dir, "metadata")):
        build_metadata(
            src, index_dir,
            {"role": "keyword", "tool": "keyword", "turn_idx": "number"},
        )
    fq = [
        {"id": "f0", "text": "hello world model", "where": {"role": "user"}},
        {"id": "f1", "text": "data pipeline shuffle",
         "where_not": {"role": "user"}},
        {"id": "f2", "text": "token", "turn_idx": ("lte", 3)},
        {"id": "f3", "text": "token"},  # unfiltered rides along
    ]
    mono = RaySparseRetriever(index_dir, cfg)
    rows = []
    for q in fq:
        res = mono.search({k: v for k, v in q.items() if k != "id"}, cutoff=10)
        for rank, ((conv, turn), score) in enumerate(res.items(), 1):
            rows.append((q["id"], rank, conv, turn, score))
    expected = pd.DataFrame(
        rows, columns=["q_id", "rank", "conv_id", "turn_idx", "score"]
    )
    sh = ShardedSearcher(index_dir, cfg, shards_per_scorer=1, num_cpus=0.05)
    try:
        got = sh.msearch(fq, cutoff=10).to_pandas()[
            ["q_id", "rank", "conv_id", "turn_idx", "score"]
        ]
    finally:
        sh.close()
    got = got.sort_values(["q_id", "rank"]).reset_index(drop=True)
    expected = expected.sort_values(["q_id", "rank"]).reset_index(drop=True)
    casts = {"turn_idx": "int64", "rank": "int64"}
    pd.testing.assert_frame_equal(got.astype(casts), expected.astype(casts))
    # the filter actually bit: f0 results are user turns only
    assert (got.q_id == "f0").any()


def test_shard_view_conv_map_is_sliced(built):
    """A shard view's reverse id map holds only the conv rows
    overlapping its doc window (read_conv_offsets_range), and
    to_original_ids matches the monolithic view on every local id."""
    from retriv_ray.index.build import read_conv_offsets

    index_dir, cfg, _ = built
    full = read_conv_offsets(index_dir)
    r_all = RaySparseRetriever(index_dir, cfg)
    r_sh = RaySparseRetriever(index_dir, cfg, shard_range=(1, 1))
    assert len(r_sh.index.conv_bases) < len(r_all.index.conv_bases)
    assert len(r_all.index.conv_bases) == full.num_rows
    # the straddling conv is included: first kept base <= doc_base
    assert r_sh.index.conv_bases[0] <= r_sh.index.doc_base
    local = np.arange(r_sh.index.local_count, dtype=np.int64)
    c_s, t_s = r_sh.index.to_original_ids(local)
    c_a, t_a = r_all.index.to_original_ids(local + r_sh.index.doc_base)
    np.testing.assert_array_equal(c_s, c_a)
    np.testing.assert_array_equal(t_s, t_a)


def test_read_conv_offsets_range_prunes_row_groups(ray_session, tmp_path):
    """Row-group-stat pruning over a multi-group single-file id_map
    and a sliced id_map returns exactly the overlapping window."""
    import os

    import pyarrow as pa

    from retriv_ray.index.build import (
        read_conv_offsets,
        read_conv_offsets_range,
    )

    n = 200
    base = np.arange(n, dtype=np.int64) * 3  # 3 turns per conv
    tbl = pa.table(
        {
            "conv_id": [f"c{i:05d}" for i in range(n)],
            "base": base,
            "n_turns": np.full(n, 3, dtype=np.int64),
        }
    )
    d1 = tmp_path / "single" / "id_map"
    os.makedirs(d1)
    pq.write_table(tbl, str(d1 / "conv_offsets.parquet"), row_group_size=16)
    idx1 = str(tmp_path / "single")

    d2 = tmp_path / "sliced" / "id_map"
    os.makedirs(d2)
    for i in range(4):
        pq.write_table(
            tbl.slice(i * 50, 50),
            str(d2 / f"conv_offsets-{i:05d}.parquet"),
            row_group_size=16,
        )
    idx2 = str(tmp_path / "sliced")

    for idx in (idx1, idx2):
        # window straddles conv boundaries: docs [100, 400) -> convs
        # 33 (base 99, straddles 100) .. 133 (base 399)
        out = read_conv_offsets_range(idx, 100, 400)
        b = out.column("base").to_numpy()
        assert b[0] <= 100 and b[-1] < 400
        assert (b[1:] > 100).all() or len(b) == 1
        full = read_conv_offsets(idx)
        fb = full.column("base").to_numpy()
        lo = max(0, int(np.searchsorted(fb, 100, side="right")) - 1)
        hi = int(np.searchsorted(fb, 400, side="left"))
        assert out.equals(full.slice(lo, hi - lo))
        # degenerate windows
        assert read_conv_offsets_range(idx, 0, 1).num_rows == 1
        assert (
            read_conv_offsets_range(idx, (n - 1) * 3, n * 3).num_rows == 1
        )
