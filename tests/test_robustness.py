"""Edge-case robustness: null/empty/unicode text, AND-operator search,
subset restriction through the public API, huge-tf turns."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from retriv_ray.config import SparseConfig
from retriv_ray.index.build import build_index
from retriv_ray.search.searcher import RaySparseRetriever
from retriv_ray.sources.transcripts import SCHEMA, _EPOCH_US


def _tbl(rows):
    n = len(rows)
    return pa.Table.from_arrays(
        [
            pa.array([r[0] for r in rows]),
            pa.array([r[1] for r in rows], type=pa.int32()),
            pa.array(["user"] * n),
            pa.array([r[2] for r in rows], type=pa.string()),
            pa.array([""] * n),
            pa.array(
                [int(_EPOCH_US) + i for i in range(n)], type=pa.int64()
            ).cast(pa.timestamp("us")),
        ],
        schema=SCHEMA,
    )


@pytest.fixture(scope="module")
def edge_index(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("edge")
    rows = [
        ("c1", 0, "alpha beta gamma"),
        ("c1", 1, None),                       # null text
        ("c2", 0, ""),                         # empty text
        ("c2", 1, "beta " * 40000),            # tf 40000 > int16 max
        ("c3", 0, "übermensch café alpha"),    # unicode survives
        ("c3", 1, "ALPHA Beta!! gamma?"),
    ]
    src = os.path.join(d, "t.parquet")
    pq.write_table(_tbl(rows), src)
    idx = os.path.join(d, "idx")
    build_index(
        src, idx, SparseConfig(tokenizer="whitespace", stemmer=None, stopwords=None),
        num_parts=2,
    )
    return RaySparseRetriever(idx)


def test_null_and_empty_docs_get_zero_len(edge_index):
    idx = edge_index.index
    assert idx.doc_count == 6
    # docs 1 (null) and 2 (empty) have doc_len 0
    assert idx.doc_lens[1] == 0.0
    assert idx.doc_lens[2] == 0.0


def test_large_tf_not_truncated(edge_index):
    d, f = edge_index.index.get_postings("beta")
    by = dict(zip(d.tolist(), f.tolist()))
    assert by[3] == 40000  # int16 would overflow at 32767 (reference risk)


def test_unicode_terms_roundtrip(edge_index):
    # punctuation removal strips the accents' neighbors but keeps text;
    # the unicode token must be queryable verbatim
    res = edge_index.search("übermensch", cutoff=5)
    assert ("c3", 0) in res


def test_and_operator_via_public_api(edge_index):
    both = edge_index.search("alpha gamma", cutoff=10, operator="AND")
    assert set(both) == {("c1", 0), ("c3", 1)}
    either = edge_index.search("alpha gamma", cutoff=10, operator="OR")
    assert set(both) <= set(either)
    assert ("c3", 0) in either  # has alpha only


def test_subset_restriction(edge_index):
    subset = np.array([0, 4], dtype=np.int64)  # only c1/0 and c3/0
    res = edge_index.search("alpha", cutoff=10, subset=subset)
    assert set(res) == {("c1", 0), ("c3", 0)}


def test_empty_query_and_unknown_terms(edge_index):
    assert edge_index.search("", cutoff=5) == {}
    assert edge_index.search("zzzzz unknownterm", cutoff=5) == {}


def test_audio_video_multimodal_plumbing(ray_session):
    import ray.data

    from retriv_ray.ops.multimodal import (
        attach_payload,
        audio_features,
        video_frame_samples,
    )

    ds = ray.data.from_items(
        [{"doc_id": i, "text": f"sample audio text {i} " * 50} for i in range(8)]
    )
    # wav payloads drive the real stdlib RIFF decode in the audio stage
    af = audio_features(attach_payload(ds, kind="wav"), concurrency=2).take_all()
    assert len(af) == 8
    assert all(r["n_frames"] >= 1 for r in af)
    assert all(len(r["frame_rms"]) == r["n_frames"] for r in af)
    # raw payloads (~3 KB) give the byte-chunk frame fake several frames
    vf = video_frame_samples(
        attach_payload(ds, kind="raw"), every_k=1, concurrency=2
    ).take_all()
    assert len(vf) > 8  # expansion: multiple sampled frames per doc
    assert {len(r["frame_digest"]) for r in vf} == {16}
