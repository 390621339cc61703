"""retriv_ray — a Ray-Data-native inverted-index build + BM25 query engine.

A from-scratch re-expression of the capabilities of AmenRa/retriv
(reference snapshot at /root/reference, cited by ``path:line`` in
docstrings) on top of ``ray.data.Dataset`` pipelines:

- ``retriv_ray.text``   — the exact per-turn preprocessing chain
  (normalizers, tokenizers, Snowball/Porter2 english stemmer,
  stopwords; reference ``retriv/sparse_retriever/preprocessing/``).
- ``retriv_ray.index``  — distributed posting-list construction over
  Parquet transcript tables: ``map_batches`` tokenize → (term, doc_id,
  tf) pairs → hash-partitioned, salt-split ``groupby`` shuffle →
  delta+varint block-compressed segments with per-partition lineage
  (replaces reference ``build_inverted_index.py``'s driver-side
  CountVectorizer).
- ``retriv_ray.search`` — float32 BM25 / TF-IDF scoring kernels that
  are rank- and score-identical to the reference numba kernels
  (``sparse_retrieval_models/bm25.py``, ``utils/numba_utils.py``),
  plus a distributed query actor pool.
- ``retriv_ray.ops``    — large-scale training-data operators beyond
  the reference: dedup (exact / MinHash-LSH / SimHash / n-gram
  Jaccard / embedding cosine), ANN search, text analysis, windowed
  aggregates, multimodal column plumbing.

No module in this package calls ``ray.init``/``ray.shutdown``; the
process that owns the Ray session (driver, bench.py, pytest fixture)
does.
"""

from retriv_ray.config import SparseConfig

__all__ = ["SparseConfig", "build_index", "RaySparseRetriever"]
__version__ = "0.1.0"


def __getattr__(name):
    # Lazy so that `import retriv_ray` does not pull in ray for
    # text-only use (and to keep import time off the hot path).
    if name == "build_index":
        from retriv_ray.index.build import build_index

        return build_index
    if name == "RaySparseRetriever":
        from retriv_ray.search.searcher import RaySparseRetriever

        return RaySparseRetriever
    raise AttributeError(name)
