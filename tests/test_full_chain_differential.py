"""Differential oracle for the bm25_full_chain driver query (round-2
verdict Next #8): the default retriv preprocessing chain (english
Snowball stemmer + stemmed-stopword quirk, float32 BM25) is not
SQL-expressible, so the driver can only rows-check it. This test pins
it instead against the pure-Python reference engine
(`index/inmem.py`, reference build_inverted_index.py:29-66 +
sparse_retriever.py:260-378 semantics): top-k ids AND scores from the
distributed Ray build/serve path must equal the in-memory path on the
sf0.001 documents table."""

import math
import os

import pyarrow.parquet as pq
import pytest

from retriv_ray.config import SparseConfig
from retriv_ray.index.build import build_index
from retriv_ray.index.inmem import LocalSparseRetriever
from retriv_ray.search.searcher import RaySparseRetriever

SF_DIR = "/root/testdata/sf0.001"

QUERIES = {
    "q1": "table scan join",
    "q2": "window batch stream",
    "q3": "hash merge filter",
    "q4": "customer order part",
    "q5": "spark big data",
}


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata absent")
def test_full_chain_matches_inmem_reference(ray_session, tmp_path_factory):
    import pyarrow as pa

    docs = pq.read_table(
        os.path.join(SF_DIR, "documents.parquet"), columns=["doc_id", "text"]
    )
    cfg = SparseConfig(score_dtype="float32")  # the full default chain

    # reference path: enumeration order == doc_id order
    order = pa.compute.sort_indices(docs.column("doc_id"))
    docs = docs.take(order)
    local = LocalSparseRetriever(cfg).index_collection(
        [
            {"id": int(i), "text": t}
            for i, t in zip(
                docs.column("doc_id").to_pylist(),
                docs.column("text").to_pylist(),
            )
        ]
    )

    # distributed path over the same rows as transcripts
    tmp = tmp_path_factory.mktemp("fullchain")
    src = str(tmp / "t.parquet")
    pq.write_table(
        pa.Table.from_arrays(
            [
                pa.array(
                    [f"d{i:012d}" for i in docs.column("doc_id").to_pylist()]
                ),
                pa.array([0] * docs.num_rows, type=pa.int32()),
                docs.column("text"),
            ],
            names=["conv_id", "turn_idx", "text"],
        ),
        src,
    )
    index_dir = str(tmp / "index")
    build_index(src, index_dir, cfg, num_parts=3, shard_docs=128)
    r = RaySparseRetriever(index_dir, cfg)

    for q_id, text in QUERIES.items():
        want = local.search(text, cutoff=10)
        got = {
            int(conv[1:]): score
            for (conv, _turn), score in r.search(text, cutoff=10).items()
        }
        assert list(got) == list(want), (q_id, got, want)  # same ids, same order
        for k in want:
            assert math.isclose(got[k], float(want[k]), rel_tol=0, abs_tol=0), (
                q_id, k, got[k], want[k],
            )
