"""In-memory index with exact reference build semantics.

This is the single-process parity core: it reproduces
reference build_inverted_index.py:29-66 (CountVectorizer -> CSR ->
per-term postings, min_df pruning BEFORE doc_lens, float32 doc-length
stats) without sklearn, and drives the kernels in
retriv_ray.search.kernel. It serves three roles:

1. the oracle for differential tests of the distributed Ray build
   (same postings / stats must come out of both paths);
2. the golden-score fixture engine (tests/test_golden_search.py);
3. the in-actor representation at query time — loaded segment
   partitions present exactly these arrays.

``LocalSparseRetriever`` mirrors the reference SparseRetriever API
(index/search/msearch, sparse_retriever.py:201-378) for small
collections; the Ray-scale equivalents live in retriv_ray.index.build
and retriv_ray.search.searcher.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from retriv_ray.config import SparseConfig
from retriv_ray.search import kernel
from retriv_ray.text.pipeline import TextPreprocessor


class InMemoryIndex:
    """term -> (doc_ids ascending, tfs) plus doc-length statistics."""

    def __init__(
        self,
        postings: Dict[str, Tuple[np.ndarray, np.ndarray]],
        doc_lens: np.ndarray,
        doc_count: int,
    ):
        self.postings = postings
        self.doc_lens = doc_lens.astype(np.float32, copy=False)
        self.doc_count = doc_count
        # reference build_inverted_index.py:64 + sparse_retriever.py:198
        # computes np.mean(doc_lens) in float32. doc_lens are integers
        # exactly representable in float64, so sum-in-float64 ->
        # float32 divide is EXACT and partitioning-independent — the
        # distributed build computes the same value from per-shard
        # integer sums; reference float32 pairwise mean can differ by
        # <=1 ulp on large corpora (within the reference tests'
        # rel_tol=1e-6; exact on the golden fixtures).
        total = float(self.doc_lens.astype(np.float64).sum())
        self.avg_doc_len = np.float32(total / doc_count) if doc_count else np.float32(0)
        self.relative_doc_lens = self.doc_lens / self.avg_doc_len
        self.vocabulary = set(postings)

    @classmethod
    def from_token_lists(
        cls, token_lists: Sequence[List[str]], min_df: int = 1
    ) -> "InMemoryIndex":
        """Build with the reference's ordering of operations:
        vocabulary pruning at min_df happens BEFORE doc_lens are
        computed, so with min_df > 1 the doc lengths count only
        retained terms (reference build_inverted_index.py:35-63 — the
        CountVectorizer drops rare columns from the matrix whose
        column-sums become doc_lens)."""
        n_docs = len(token_lists)
        acc: Dict[str, List[List[int]]] = {}
        for doc_id, toks in enumerate(token_lists):
            counts: Dict[str, int] = {}
            for t in toks:
                counts[t] = counts.get(t, 0) + 1
            for t, c in counts.items():
                slot = acc.get(t)
                if slot is None:
                    acc[t] = [[doc_id], [c]]
                else:
                    slot[0].append(doc_id)
                    slot[1].append(c)
        postings: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}
        doc_lens = np.zeros(n_docs, dtype=np.int64)
        for t, (ids, tfs) in acc.items():
            if len(ids) < min_df:
                continue  # pruned before doc_lens accumulation
            ids_a = np.asarray(ids, dtype=np.int64)  # already ascending
            tfs_a = np.asarray(tfs, dtype=np.int32)
            postings[t] = (ids_a, tfs_a)
            np.add.at(doc_lens, ids_a, tfs_a)
        return cls(postings, doc_lens.astype(np.float32), n_docs)

    def get_postings(
        self, terms: Sequence[str]
    ) -> Tuple[List[np.ndarray], List[np.ndarray]]:
        doc_ids = [self.postings[t][0] for t in terms]
        tfs = [self.postings[t][1] for t in terms]
        return doc_ids, tfs


class LocalSparseRetriever:
    """Reference-API single-process engine over an InMemoryIndex.

    Mirrors SparseRetriever.search/msearch semantics
    (sparse_retriever.py:260-378): vocabulary filtering, empty-query
    -> {}, per-query kernel invocation, results keyed by original id.
    """

    def __init__(self, cfg: Optional[SparseConfig] = None):
        self.cfg = cfg or SparseConfig()
        self.pre = TextPreprocessor(self.cfg)
        self.index: Optional[InMemoryIndex] = None
        self.ids: Optional[List] = None  # doc_id -> original id

    def index_collection(self, collection: Sequence[dict]) -> "LocalSparseRetriever":
        """collection: [{"id": ..., "text": ...}] in enumeration order
        (internal ids = input order, reference base_retriever.py:56-62)."""
        self.ids = [d["id"] for d in collection]
        token_lists = self.pre.tokens_many([d["text"] for d in collection])
        self.index = InMemoryIndex.from_token_lists(token_lists, self.cfg.min_df)
        return self

    def _score(self, query_terms, cutoff, operator="OR", subset=None):
        idx = self.index
        doc_ids, tfs = idx.get_postings(query_terms)
        dtype = np.float32 if self.cfg.score_dtype == "float32" else np.float64
        if self.cfg.model == "bm25":
            return kernel.bm25(
                b=self.cfg.hyperparams["b"],
                k1=self.cfg.hyperparams["k1"],
                term_doc_freqs=tfs,
                doc_ids=doc_ids,
                relative_doc_lens=idx.relative_doc_lens,
                doc_count=idx.doc_count,
                cutoff=cutoff,
                operator=operator,
                subset_doc_ids=subset,
                dtype=dtype,
            )
        return kernel.tf_idf(
            term_doc_freqs=tfs,
            doc_ids=doc_ids,
            doc_lens=idx.doc_lens,
            cutoff=cutoff,
            operator=operator,
            subset_doc_ids=subset,
            dtype=dtype,
        )

    def query_terms(self, query: str) -> List[str]:
        terms = self.pre.tokens(query)
        return [t for t in terms if t in self.index.vocabulary]

    def search(
        self, query: str, cutoff: int = 100, operator: str = "OR", subset=None
    ) -> Dict:
        terms = self.query_terms(query)
        if not terms:
            return {}
        ids, scores = self._score(terms, cutoff, operator, subset)
        return {self.ids[i]: s for i, s in zip(ids, scores)}

    def msearch(self, queries: Sequence[Dict], cutoff: int = 100) -> Dict:
        return {q["id"]: self.search(q["text"], cutoff) for q in queries}
