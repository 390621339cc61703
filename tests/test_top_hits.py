"""ES top_hits sub-aggregation (search/facets.py:top_hits)."""

import numpy as np
import pyarrow as pa
import pytest

from retriv_ray.config import SparseConfig
from retriv_ray.index.build import build_index
from retriv_ray.search.facets import top_hits
from retriv_ray.search.metadata import build_metadata
from retriv_ray.search.searcher import RaySparseRetriever

DOCS = [
    ("c000", "en", "table scan join"),
    ("c001", "en", "table table scan"),
    ("c002", "de", "table join join"),
    ("c003", "de", "merge filter"),
    ("c004", "fr", "table scan scan join"),
    ("c005", "fr", "nothing relevant"),
    ("c006", "en", "table"),
]
CFG = SparseConfig(
    tokenizer="whitespace", stemmer=None, stopwords=None, score_dtype="float64"
)


@pytest.fixture(scope="module")
def rt(ray_session, tmp_path_factory):
    import ray.data

    tmp = tmp_path_factory.mktemp("tophits")
    src = str(tmp / "src")
    ray.data.from_arrow(
        pa.table(
            {
                "conv_id": [c for c, _, _ in DOCS],
                "turn_idx": pa.array([0] * len(DOCS), type=pa.int32()),
                "text": [t for _, _, t in DOCS],
            }
        )
    ).write_parquet(src)
    idx = str(tmp / "idx")
    build_index(src, idx, CFG, num_parts=2, resume=False)
    meta_src = ray.data.from_arrow(
        pa.table(
            {
                "conv_id": [c for c, _, _ in DOCS],
                "turn_idx": pa.array([0] * len(DOCS), type=pa.int32()),
                "lang": [l for _, l, _ in DOCS],
            }
        )
    )
    build_metadata(meta_src, idx, {"lang": "keyword"})
    # retriever.metadata is a lazy property over the sidecar just built
    return RaySparseRetriever(idx, CFG)


def test_every_bucket_gets_its_own_ranking(rt):
    out = top_hits(rt, "table scan join", "lang", n=2)
    got = {}
    for i in range(out.num_rows):
        got.setdefault(out.column("value")[i].as_py(), []).append(
            out.column("conv_id")[i].as_py()
        )
    # en: c000 (3 hits incl join) over c001 (2 terms); de: only c002
    # matches; fr: c004 only
    assert set(got) == {"en", "de", "fr"}
    assert got["de"] == ["c002"]
    assert got["fr"] == ["c004"]
    assert len(got["en"]) == 2 and got["en"][0] == "c000"


def test_bucket_ranking_matches_subset_score(rt):
    out = top_hits(rt, "table scan join", "lang", n=3)
    terms = rt.query_terms("table scan join")
    post = rt.metadata.postings["lang"]
    for value in ("en", "de", "fr"):
        ids, _ = rt._score(terms, 3, subset=np.asarray(post[value], dtype=np.int64))
        mask = [
            i
            for i in range(out.num_rows)
            if out.column("value")[i].as_py() == value
        ]
        got = [out.column("doc_id")[i].as_py() for i in mask]
        assert got == list(ids), value


def test_no_matching_terms_is_empty(rt):
    out = top_hits(rt, "zzz qqq", "lang", n=2)
    assert out.num_rows == 0
    assert out.column_names == ["value", "rank", "conv_id", "turn_idx", "doc_id"]


def test_number_field_rejected(rt):
    with pytest.raises(ValueError, match="not in schema|numeric"):
        top_hits(rt, "table", "nope", n=2)
