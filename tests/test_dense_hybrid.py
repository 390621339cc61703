"""Dense + Hybrid retriever surfaces (reference
dense_retriever.py:18-372, hybrid_retriever.py:15-361): encoder
determinism, exact-vs-ANN behavior, fusion semantics."""

import numpy as np
import pytest

from retriv_ray.compat import SparseRetriever
from retriv_ray.dense import DenseRetriever, HashingEncoder, HybridRetriever
from retriv_ray.merger import Merger, min_max_norm

DOCS = [
    {"id": "d1", "text": "ray data streaming shuffle"},
    {"id": "d2", "text": "inverted index posting lists"},
    {"id": "d3", "text": "bm25 ranking function scores"},
    {"id": "d4", "text": "streaming shuffle backpressure spill"},
    {"id": "d5", "text": "posting compression varint blocks"},
]


def test_hashing_encoder_deterministic_and_normalized():
    enc = HashingEncoder(dim=64)
    v1, v2 = enc("ray data shuffle"), enc("ray data shuffle")
    assert np.array_equal(v1, v2)
    assert np.isclose(np.linalg.norm(v1), 1.0)
    m = enc(["a b", "c d"])
    assert m.shape == (2, 64)


def test_dense_exact_search_ranks_overlap_first():
    dr = DenseRetriever(index_name="dense-t1", use_ann=False).index(DOCS)
    res = dr.search("streaming shuffle", cutoff=3)
    assert res[0]["id"] in {"d1", "d4"}
    assert res[0]["score"] >= res[1]["score"] >= res[2]["score"]
    DenseRetriever.delete("dense-t1")


def test_dense_ann_bucket_contains_self():
    dr = DenseRetriever(index_name="dense-t2", use_ann=True, n_planes=4).index(DOCS)
    # querying a doc's own text must return that doc first
    res = dr.search(DOCS[2]["text"], cutoff=2)
    assert res[0]["id"] == "d3"
    DenseRetriever.delete("dense-t2")


def test_dense_load_roundtrip():
    DenseRetriever(index_name="dense-t3", use_ann=False).index(DOCS)
    dr = DenseRetriever.load("dense-t3")
    a = dr.search("posting compression", return_docs=False, cutoff=3)
    assert len(a) == 3
    DenseRetriever.delete("dense-t3")


@pytest.fixture(scope="module")
def hybrid(ray_session):
    sr = SparseRetriever(index_name="hyb-sparse", stemmer=None, stopwords=None)
    sr.index(DOCS)
    dr = DenseRetriever(index_name="hyb-dense", use_ann=False).index(DOCS)
    yield HybridRetriever(sr, dr)
    SparseRetriever.delete("hyb-sparse")
    DenseRetriever.delete("hyb-dense")


def test_hybrid_fuse_matches_manual(hybrid):
    q = "posting lists compression"
    fused = hybrid.search(q, return_docs=False, cutoff=5)
    sr_run = {"q": hybrid.sparse_retriever.search(q, False, 1000)}
    dr_run = {"q": hybrid.dense_retriever.search(q, False, 1000)}
    na, nb = min_max_norm(sr_run), min_max_norm(dr_run)
    for doc_id, s in fused.items():
        want = na["q"].get(doc_id, 0.0) + nb["q"].get(doc_id, 0.0)
        assert np.isclose(s, want)


def test_hybrid_msearch_and_autotune(hybrid):
    queries = [{"id": "q1", "text": "streaming shuffle"}]
    res = hybrid.msearch(queries, cutoff=3)
    assert set(res) == {"q1"} and len(res["q1"]) <= 3
    cfg = hybrid.autotune(
        {"q1": {"d4": 1}}, queries, metric="mrr", step=0.5
    )
    assert cfg["params"] is not None


def test_index_dataset_streams_shards_and_serves(ray_session):
    """index_dataset writes parquet shards + distributed sig artifact
    (no driver gather); search() lazy-loads; load() round-trips; the
    streaming msearch_ds agrees with in-RAM search on ranks."""
    import os

    import ray.data

    from retriv_ray.compat import index_path

    ds = ray.data.from_items(DOCS)
    dr = DenseRetriever(index_name="dense-stream", use_ann=True, n_planes=4)
    dr.index_dataset(ds, concurrency=2)
    root = index_path("dense-stream")
    assert os.path.isdir(os.path.join(root, "dense_shards"))
    assert os.path.isdir(os.path.join(root, "dense_sigs"))
    assert dr._emb is None  # nothing gathered at index time

    res = dr.search("streaming shuffle", return_docs=False, cutoff=3)
    assert dr._emb is not None  # lazy load happened
    assert set(res) <= {d["id"] for d in DOCS}
    assert "d1" in res or "d4" in res

    lr = DenseRetriever.load("dense-stream", encoder=HashingEncoder())
    res2 = lr.search("streaming shuffle", return_docs=False, cutoff=3)
    assert list(res2) == list(res)

    exact = DenseRetriever(index_name="dense-stream-x", use_ann=False)
    exact.index(DOCS)
    want = exact.search("streaming shuffle", return_docs=False, cutoff=3)
    t = dr.msearch_ds(
        [{"id": "q0", "text": "streaming shuffle"}], cutoff=3
    ).to_pandas()
    assert t.sort_values("rank")["id"].tolist() == list(want)


def test_model_interface_adapter(ray_session, tmp_path, monkeypatch):
    """ST4: a sentence-transformers-shaped model object drives the
    actor-pool encode path end-to-end (adapter + per-actor factory)."""
    import os

    # defined INSIDE the test so cloudpickle ships it by value to the
    # encode actors (a test-module-level class would be pickled by
    # reference, which workers cannot import)
    class FakeSentenceTransformer:
        """Mimics the sentence-transformers encode() interface:
        list[str] -> float32 [N, dim] ndarray (deterministic)."""

        def __init__(self, dim=32):
            self.dim = dim

        def encode(self, sentences, batch_size=32, convert_to_numpy=True):
            import numpy as np
            import zlib

            out = np.zeros((len(sentences), self.dim), dtype=np.float32)
            for i, s in enumerate(sentences):
                for tok in (s or "").split():
                    h = zlib.crc32(tok.encode())
                    out[i, h % self.dim] += 1.0
            return out

    import numpy as np
    import pandas as pd
    import ray.data

    from retriv_ray.dense import DenseRetriever

    monkeypatch.setenv("RETRIV_BASE_PATH", str(tmp_path))
    docs = [{"id": f"d{i}", "text": f"token{i} shared word"} for i in range(40)]

    # (a) model OBJECT via adapter (serialized to actors)
    dr = DenseRetriever(index_name="st-adapter", encoder=FakeSentenceTransformer())
    dr.index_dataset(ray.data.from_items(docs), concurrency=2)
    res = dr.search("token3 shared word", cutoff=3)
    assert res[0]["id"] == "d3"

    # (b) factory: model constructed inside the actor, not the driver
    marker_dir = tmp_path / "ctor_pids"
    os.makedirs(marker_dir, exist_ok=True)

    def factory(md=str(marker_dir)):
        import os as _os

        open(f"{md}/{_os.getpid()}", "w").close()
        return FakeSentenceTransformer()

    dr2 = DenseRetriever(index_name="st-factory", encoder=FakeSentenceTransformer())
    dr2.index_dataset(
        ray.data.from_items(docs), concurrency=2, encoder_factory=factory
    )
    res2 = dr2.search("token7 shared word", cutoff=3)
    assert res2[0]["id"] == "d7"
    ctor_pids = {int(p) for p in os.listdir(marker_dir)}
    assert ctor_pids and os.getpid() not in ctor_pids
    # both paths produce identical embeddings for identical docs
    assert res2[0]["score"] == pytest.approx(res[0]["score"])


def test_ann_searcher_contract(ray_session, tmp_path):
    import numpy as np

    from retriv_ray import compat
    from retriv_ray.compat import set_base_path
    from retriv_ray.dense import ANN_Searcher, DenseRetriever

    old = compat.BASE_DIR
    try:
        set_base_path(str(tmp_path))
        docs = [{"id": f"d{i}", "text": f"tok{i} tok{(i+1)%7} filler"} for i in range(30)]
        dr = DenseRetriever(index_name="annc", dim=32).index(docs)
        ann = ANN_Searcher.load("annc")
        q = dr._emb[3]
        ids, scores = ann.search(q, cutoff=5)
        # exact inner-product scan: the query's own vector ranks first
        assert ids[0] == 3
        s = dr._emb @ q
        exp = np.lexsort((np.arange(len(s)), -s))[:5]  # (-score, id) ties
        assert ids.tolist() == exp.tolist()
        # msearch shape + padding contract
        mids, mscores = ann.msearch(dr._emb[:4], cutoff=50)
        assert mids.shape == (4, 50) and mscores.shape == (4, 50)
        assert (mids[:, 30:] == -1).all()  # only 30 docs exist
        for r in range(4):
            assert mids[r, 0] == r
    finally:
        set_base_path(old)


def test_hashing_encoder_md5_mode_sql_reproducible():
    """md5 mode: bucket/sign arithmetic matches the documented DuckDB
    twin (md5_number_lower, h % dim, bit 63) token-for-token."""
    import hashlib

    import numpy as np

    from retriv_ray.dense import HashingEncoder

    enc = HashingEncoder(dim=16, seed=7, normalize=False, hash="md5")
    v = enc("Alpha beta alpha")
    want = np.zeros(16, dtype=np.float32)
    for tok in "alpha beta alpha".split():
        h = int.from_bytes(
            hashlib.md5(f"7:{tok}".encode()).digest()[8:16], "little"
        )
        want[h % 16] += 1.0 if (h >> 63) & 1 else -1.0
    assert np.array_equal(v, want)


def test_hashing_encoder_mode_validation():
    import pytest

    from retriv_ray.dense import HashingEncoder

    with pytest.raises(ValueError):
        HashingEncoder(hash="sha1")
