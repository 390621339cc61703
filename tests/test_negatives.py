"""Hard-negative mining: positive excluded, rank renumbered, absent
positive leaves the full top-n."""

import pyarrow as pa
import pytest

from retriv_ray.config import SparseConfig
from retriv_ray.index.build import build_index
from retriv_ray.search.negatives import mine_hard_negatives
from retriv_ray.search.searcher import RaySparseRetriever

DOCS = [
    "red red red",      # c0000: top hit for "red"
    "red red blue",     # c0001
    "red blue blue",    # c0002
    "blue blue blue",   # c0003
    "orange",           # c0004
]


@pytest.fixture(scope="module")
def retriever(ray_session, tmp_path_factory):
    import ray.data

    tmp = tmp_path_factory.mktemp("neg_idx")
    src = str(tmp / "src")
    ray.data.from_arrow(
        pa.table(
            {
                "conv_id": [f"c{i:04d}" for i in range(len(DOCS))],
                "turn_idx": pa.array([0] * len(DOCS), type=pa.int32()),
                "text": DOCS,
            }
        )
    ).write_parquet(src)
    idx = str(tmp / "idx")
    cfg = SparseConfig(tokenizer="whitespace", stemmer=None, stopwords=None)
    build_index(src, idx, cfg, num_parts=2, resume=False)
    return RaySparseRetriever(idx, cfg)


def test_positive_excluded_and_renumbered(retriever):
    t = mine_hard_negatives(
        retriever, {"q": ("red", ("c0000", 0))}, n_negatives=2
    )
    rows = list(
        zip(t.column("rank").to_pylist(), t.column("conv_id").to_pylist())
    )
    assert rows == [(1, "c0001"), (2, "c0002")]  # c0000 dropped


def test_absent_positive_keeps_full_topn(retriever):
    t = mine_hard_negatives(
        retriever, {"q": ("red", ("c0004", 0))}, n_negatives=2
    )
    assert t.column("conv_id").to_pylist() == ["c0000", "c0001"]


def test_empty_query_terms_emit_no_rows(retriever):
    t = mine_hard_negatives(
        retriever, {"q": ("zzz", ("c0000", 0))}, n_negatives=2
    )
    assert t.num_rows == 0
