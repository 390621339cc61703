"""AdvancedRetriever filter DSL parity over transcript metadata
(reference advanced_retriever.py:358-531, docs/filters.md; test
shapes after reference tests/advanced_retriever/advanced_retriever_test.py).

Oracle: per-filter expected id sets computed with plain pandas over
the same synthetic table.
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from retriv_ray.config import SparseConfig
from retriv_ray.index.build import build_index
from retriv_ray.search.metadata import MetadataIndex, build_metadata
from retriv_ray.search.searcher import RaySparseRetriever
from retriv_ray.sources.transcripts import SCHEMA, _EPOCH_US


def _table() -> pa.Table:
    rows = [
        # conv, turn, role, text, tool, tags
        ("c1", 0, "user", "alpha beta", "", ["x", "y"]),
        ("c1", 1, "assistant", "beta gamma", "search", ["y"]),
        ("c2", 0, "user", "alpha gamma", "", ["z"]),
        ("c2", 1, "assistant", "delta", "python", ["x", "z"]),
        ("c3", 0, "user", "alpha beta gamma", "", []),
        ("c3", 1, "assistant", "beta delta", "search", ["y", "z"]),
    ]
    return pa.Table.from_arrays(
        [
            pa.array([r[0] for r in rows]),
            pa.array([r[1] for r in rows], type=pa.int32()),
            pa.array([r[2] for r in rows]),
            pa.array([r[3] for r in rows]),
            pa.array([r[4] for r in rows]),
            pa.array(
                [int(_EPOCH_US) + i * 1_000_000 for i in range(len(rows))],
                type=pa.int64(),
            ).cast(pa.timestamp("us")),
            pa.array([r[5] for r in rows], type=pa.list_(pa.string())),
        ],
        names=["conv_id", "turn_idx", "role", "text", "tool", "ts", "tags"],
    )


SCHEMA_META = {
    "role": "keyword",
    "tool": "keyword",
    "turn_idx": "number",
    "ts": "number",
    "tags": "keywords",
}


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("meta")
    src = os.path.join(d, "t.parquet")
    pq.write_table(_table(), src)
    idx = os.path.join(d, "idx")
    cfg = SparseConfig(tokenizer="whitespace", stemmer=None, stopwords=None)
    build_index(src, idx, cfg, num_parts=2)
    build_metadata(src, idx, SCHEMA_META)
    return RaySparseRetriever(idx, cfg)


def ids(arr):
    return sorted(int(x) for x in arr)


def test_keyword_must(built):
    m = built.metadata
    assert ids(m.filter_doc_ids("role", "must", "user")) == [0, 2, 4]
    assert ids(m.filter_doc_ids("tool", "must", ["search", "python"])) == [1, 3, 5]


def test_keyword_must_not(built):
    m = built.metadata
    assert ids(m.filter_doc_ids("role", "must not", "user")) == [1, 3, 5]
    assert ids(m.filter_doc_ids("tool", "must not", "search")) == [0, 2, 3, 4]


def test_keyword_unknown_value_raises(built):
    with pytest.raises(ValueError):
        built.metadata.filter_doc_ids("role", "must", "nonexistent")


def test_number_operators(built):
    m = built.metadata
    assert ids(m.filter_doc_ids("turn_idx", "must", 0, "eq")) == [0, 2, 4]
    assert ids(m.filter_doc_ids("turn_idx", "must", 0, "gt")) == [1, 3, 5]
    assert ids(m.filter_doc_ids("turn_idx", "must", 1, "gte")) == [1, 3, 5]
    assert ids(m.filter_doc_ids("turn_idx", "must", 1, "lt")) == [0, 2, 4]
    assert ids(m.filter_doc_ids("turn_idx", "must", 0, "lte")) == [0, 2, 4]
    lo = int(_EPOCH_US + 1_000_000)
    hi = int(_EPOCH_US + 3_000_000)
    assert ids(m.filter_doc_ids("ts", "must", (lo, hi), "between")) == [1, 2, 3]
    assert ids(m.filter_doc_ids("ts", "must not", (lo, hi), "between")) == [0, 4, 5]


def test_keywords_and_or(built):
    m = built.metadata
    assert ids(m.filter_doc_ids("tags", "must", ["x", "z"], "and")) == [3]
    assert ids(m.filter_doc_ids("tags", "must", ["x", "z"], "or")) == [0, 2, 3, 5]
    assert ids(m.filter_doc_ids("tags", "must", "y")) == [0, 1, 5]
    assert ids(m.filter_doc_ids("tags", "must not", ["x", "z"], "or")) == [1, 4]
    assert ids(m.filter_doc_ids("tags", "must not", "y")) == [2, 3, 4]


def test_filters_combine_by_intersection(built):
    m = built.metadata
    got = m.get_filtered_doc_ids(
        [
            dict(field="role", clause="must", value="assistant"),
            dict(field="tags", clause="must", value="z", operator=None),
        ]
    )
    assert ids(got) == [3, 5]


def test_search_with_where(built):
    res = built.search({"text": "beta", "where": {"role": "user"}}, cutoff=10)
    assert set(res) == {("c1", 0), ("c3", 0)}
    unfiltered = built.search("beta", cutoff=10)
    for k, v in res.items():
        assert v == unfiltered[k]


def test_search_with_where_not_and_single(built):
    res = built.search(
        {"text": "beta", "where_not": {"tool": "search"}}, cutoff=10
    )
    assert set(res) == {("c1", 0), ("c3", 0)}
    res2 = built.search({"text": "alpha", "turn_idx": ("eq", 0)}, cutoff=10)
    assert set(res2) == {("c1", 0), ("c2", 0), ("c3", 0)}


def test_filters_only_search(built):
    res = built.search({"where": {"role": "assistant"}})
    assert set(res) == {("c1", 1), ("c2", 1), ("c3", 1)}
    assert all(v == 1.0 for v in res.values())


def test_metadata_index_standalone(built):
    m = MetadataIndex(built.index_dir)
    assert m.doc_count == 6
    assert m.schema == SCHEMA_META


def test_build_metadata_over_sharded_id_map(ray_session, tmp_path, monkeypatch):
    """build_metadata over a sharded-layout id_map (bucketed handle,
    no whole-map broadcast) writes doc_id assignments identical to the
    broadcast layout."""
    t = _table()
    src = str(tmp_path / "src.parquet")
    pq.write_table(t, src)
    cfg = SparseConfig(tokenizer="whitespace", stemmer=None, stopwords=None)

    idx_b = str(tmp_path / "idx_b")
    build_index(src, idx_b, cfg, num_parts=2, shard_docs=4, resume=False)
    build_metadata(src, idx_b, {"role": "keyword", "turn_idx": "number"})

    monkeypatch.setenv("GRAFT_CONV_MAP", "sharded")
    monkeypatch.setenv("GRAFT_CONV_BUCKETS", "2")
    idx_s = str(tmp_path / "idx_s")
    build_index(src, idx_s, cfg, num_parts=2, shard_docs=4, resume=False)
    monkeypatch.delenv("GRAFT_CONV_MAP")
    monkeypatch.delenv("GRAFT_CONV_BUCKETS")
    assert not os.path.exists(
        os.path.join(idx_s, "id_map", "conv_offsets.parquet")
    )
    build_metadata(src, idx_s, {"role": "keyword", "turn_idx": "number"})

    def _load(idx):
        d = os.path.join(idx, "metadata")
        parts = sorted(
            os.path.join(d, p) for p in os.listdir(d) if p.endswith(".parquet")
        )
        tb = pa.concat_tables([pq.read_table(p) for p in parts])
        return tb.sort_by("doc_id")

    assert _load(idx_b).equals(_load(idx_s))

    mb = MetadataIndex(idx_b).filter_doc_ids("role", "must", "assistant", operator="eq")
    ms = MetadataIndex(idx_s).filter_doc_ids("role", "must", "assistant", operator="eq")
    np.testing.assert_array_equal(np.sort(mb), np.sort(ms))
    assert len(mb) == 3
