"""Cursor pagination (search/pagination.py)."""

import numpy as np
import pyarrow as pa
import pytest

from retriv_ray.config import SparseConfig
from retriv_ray.index.build import build_index
from retriv_ray.search.pagination import search_after_table
from retriv_ray.search.searcher import RaySparseRetriever

WORDS = ["red", "green", "blue", "yellow"]


@pytest.fixture(scope="module")
def setup(ray_session, tmp_path_factory):
    import ray.data

    rng = np.random.RandomState(5)
    docs = [
        " ".join(WORDS[rng.randint(len(WORDS))] for _ in range(rng.randint(3, 9)))
        for _ in range(40)
    ]
    tmp = tmp_path_factory.mktemp("page_idx")
    src = str(tmp / "src")
    tbl = pa.table(
        {
            "conv_id": [f"c{i:03d}" for i in range(len(docs))],
            "turn_idx": pa.array([0] * len(docs), type=pa.int32()),
            "text": docs,
        }
    )
    ray.data.from_arrow(tbl).write_parquet(src)
    idx = str(tmp / "idx")
    cfg = SparseConfig(tokenizer="whitespace", stemmer=None, stopwords=None)
    build_index(src, idx, cfg, num_parts=2, resume=False)
    return RaySparseRetriever(idx, cfg)


def _full(r, query):
    return search_after_table(r, query, page_size=10_000)


def test_pages_stitch_to_full_ranking(setup):
    full = _full(setup, "red blue")
    assert full.num_rows > 12
    pages, cursor = [], None
    for _ in range(100):
        p = search_after_table(
            setup, "red blue", page_size=5, cursor=cursor
        )
        if p.num_rows == 0:
            break
        pages.append(p)
        cursor = (p.column("score")[-1].as_py(), p.column("doc_id")[-1].as_py())
    got = pa.concat_tables(pages)
    assert got.column("doc_id").to_pylist() == full.column("doc_id").to_pylist()
    assert got.column("rank").to_pylist() == list(range(1, full.num_rows + 1))
    assert got.column("score").to_pylist() == full.column("score").to_pylist()


def test_cursor_mid_tie_run_resumes_by_doc_id(setup):
    # equal-scoring docs are ordered by doc_id; a cursor placed on the
    # first of a tie run must resume INSIDE the run, not skip it
    full = _full(setup, "red")
    scores = np.asarray(full.column("score").to_pylist())
    ids = full.column("doc_id").to_pylist()
    tie_starts = [
        i for i in range(len(scores) - 1) if scores[i] == scores[i + 1]
    ]
    assert tie_starts, "fixture must contain score ties"
    i = tie_starts[0]
    p = search_after_table(
        setup, "red", page_size=3, cursor=(float(scores[i]), ids[i])
    )
    assert p.column("doc_id").to_pylist() == ids[i + 1 : i + 4]
    assert p.column("rank").to_pylist() == [i + 2, i + 3, i + 4]


def test_cursor_past_end_is_empty(setup):
    full = _full(setup, "red blue")
    last = (
        full.column("score")[-1].as_py(),
        full.column("doc_id")[-1].as_py(),
    )
    p = search_after_table(setup, "red blue", page_size=5, cursor=last)
    assert p.num_rows == 0


def test_empty_query_empty_page(setup):
    p = search_after_table(setup, "qqqq", page_size=5)
    assert p.num_rows == 0
    assert p.column_names == [
        "q_id", "rank", "conv_id", "turn_idx", "score", "doc_id",
    ]
