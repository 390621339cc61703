"""Reference-compatible API: ``retriv_ray.compat.SparseRetriever``.

A user of the reference `retriv.SparseRetriever`
(retriv/sparse_retriever/sparse_retriever.py:27-451 +
retriv/base_retriever.py:20-80) can switch imports and keep their
pipeline: same constructor surface, ``index`` / ``index_file`` over
{id, text} collections (JSONL / CSV / TSV / parquet),
``search(query, return_docs, cutoff)`` returning docs-with-score,
``msearch`` / ``bsearch`` / ``autotune``, ``save`` (implicit — the
index directory IS the saved state), ``load``, ``delete``.

Mapping onto the Ray-Data engine: each doc becomes one single-turn
conversation whose conv_id is the zero-padded ENUMERATION index —
lexical order == enumeration order, so internal doc ids replicate the
reference's ``dict(enumerate(ids))`` assignment
(base_retriever.py:56-62) and BM25 scores are bit-identical. The
original id and text live in a doc-store parquet next to the index
(the reference keeps docs.jsonl + an Indxr offset index,
base_retriever.py:28-68).
"""

from __future__ import annotations

import csv
import json
import os
import shutil
from typing import Callable, Dict, Iterable, List, Optional, Sequence, Set, Union

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from retriv_ray.config import SparseConfig
from retriv_ray.index.build import build_index
from retriv_ray.search.searcher import RaySparseRetriever

BASE_DIR = os.environ.get(
    "RETRIV_RAY_COLLECTIONS", os.path.join("/tmp", "retriv_ray_collections")
)

__all__ = [
    "SparseRetriever",
    "SearchEngine",
    "DenseRetriever",
    "HybridRetriever",
    "Merger",
    "Encoder",
    "index_path",
]


def __getattr__(name):
    # Reference top-level surface (retriv/__init__.py:1-9): lazy so
    # importing the sparse compat class doesn't pull the dense stack.
    if name == "SearchEngine":  # reference alias for SparseRetriever
        return SparseRetriever
    if name in ("DenseRetriever", "HybridRetriever"):
        import retriv_ray.dense as _d

        return getattr(_d, name)
    if name == "Encoder":  # reference Encoder -> pluggable hashing default
        from retriv_ray.dense import HashingEncoder

        return HashingEncoder
    if name == "Merger":
        from retriv_ray.merger import Merger

        return Merger
    raise AttributeError(name)


def index_path(index_name: str) -> str:
    return os.path.join(BASE_DIR, index_name)


class SparseRetriever:
    def __init__(
        self,
        index_name: str = "new-index",
        model: str = "bm25",
        min_df: int = 1,
        tokenizer: Union[str, Callable, None] = "whitespace",
        stemmer: Union[str, Callable, None] = "english",
        stopwords: Union[str, List[str], Set[str], None] = "english",
        do_lowercasing: bool = True,
        do_ampersand_normalization: bool = True,
        do_special_chars_normalization: bool = True,
        do_acronyms_normalization: bool = True,
        do_punctuation_removal: bool = True,
        hyperparams: Optional[dict] = None,
    ):
        self.index_name = index_name
        self.cfg = SparseConfig(
            model=model,
            min_df=min_df,
            tokenizer=tokenizer,
            stemmer=stemmer,
            stopwords=stopwords,
            do_lowercasing=do_lowercasing,
            do_ampersand_normalization=do_ampersand_normalization,
            do_special_chars_normalization=do_special_chars_normalization,
            do_acronyms_normalization=do_acronyms_normalization,
            do_punctuation_removal=do_punctuation_removal,
            hyperparams=hyperparams,
        )
        self._engine: Optional[RaySparseRetriever] = None
        self._docs: Optional[pa.Table] = None  # enumeration-ordered

    # -- hyperparams passthrough (reference exposes .hyperparams) -----
    @property
    def hyperparams(self) -> dict:
        return self.cfg.hyperparams

    @hyperparams.setter
    def hyperparams(self, value: dict) -> None:
        self.cfg.hyperparams = value
        if self._engine is not None:
            self._engine.cfg.hyperparams = value

    # -- indexing ------------------------------------------------------
    def index(self, collection: Iterable[dict], callback: Optional[Callable] = None):
        """Index an iterable of {"id": ..., "text": ...} docs
        (reference sparse_retriever.py:201-226). Extra fields are kept
        in the doc store and returned by ``search(return_docs=True)``.
        """
        root = index_path(self.index_name)
        shutil.rmtree(root, ignore_errors=True)
        os.makedirs(root, exist_ok=True)
        ids, texts, extras = [], [], []
        for doc in collection:
            if callback is not None:
                doc = callback(doc)
            ids.append(str(doc["id"]))
            texts.append(doc["text"])
            extras.append(
                {k: v for k, v in doc.items() if k not in ("id", "text")}
            )
        n = len(ids)
        conv = [f"{i:012d}" for i in range(n)]
        docs_tbl = pa.Table.from_arrays(
            [
                pa.array(conv, type=pa.string()),
                pa.array(ids, type=pa.string()),
                pa.array(texts, type=pa.string()),
                pa.array(
                    [json.dumps(e) if e else "" for e in extras],
                    type=pa.string(),
                ),
            ],
            names=["conv_id", "id", "text", "extra"],
        )
        pq.write_table(docs_tbl, os.path.join(root, "docs.parquet"))
        turns = pa.Table.from_arrays(
            [
                docs_tbl.column("conv_id"),
                pa.array(np.zeros(n, dtype=np.int32)),
                docs_tbl.column("text"),
            ],
            names=["conv_id", "turn_idx", "text"],
        )
        src = os.path.join(root, "turns.parquet")
        pq.write_table(turns, src)
        build_index(src, os.path.join(root, "index"), self.cfg, num_parts=4)
        self._engine = RaySparseRetriever(os.path.join(root, "index"), self.cfg)
        self._docs = docs_tbl
        return self

    def index_file(self, path: str, callback: Optional[Callable] = None):
        """JSONL / CSV / TSV / parquet collection file (reference
        base_retriever.py:28-45 supports jsonl/csv/tsv)."""
        kind = os.path.splitext(path)[1][1:].lower()
        if kind == "jsonl":
            def gen():
                with open(path) as f:
                    for line in f:
                        if line.strip():
                            yield json.loads(line)
            return self.index(gen(), callback)
        if kind in ("csv", "tsv"):
            def gen():
                with open(path, newline="") as f:
                    for row in csv.DictReader(
                        f, delimiter="\t" if kind == "tsv" else ","
                    ):
                        yield row
            return self.index(gen(), callback)
        if kind == "parquet":
            return self.index(pq.read_table(path).to_pylist(), callback)
        raise AssertionError("Only JSONL, CSV, TSV, and parquet are supported.")

    # -- loading / deletion -------------------------------------------
    @staticmethod
    def load(index_name: str = "new-index") -> "SparseRetriever":
        root = index_path(index_name)
        engine = RaySparseRetriever(os.path.join(root, "index"))
        sr = SparseRetriever(index_name=index_name)
        sr.cfg = engine.cfg
        sr._engine = engine
        sr._docs = pq.read_table(os.path.join(root, "docs.parquet"))
        return sr

    @staticmethod
    def delete(index_name: str = "new-index") -> None:
        shutil.rmtree(index_path(index_name), ignore_errors=True)

    # -- searching -----------------------------------------------------
    def _require(self) -> RaySparseRetriever:
        if self._engine is None:
            raise RuntimeError("index() or load() first")
        return self._engine

    def _orig_ids(self, convs: Sequence[str]) -> List[str]:
        col = self._docs.column("id")
        return [col[int(c)].as_py() for c in convs]

    def search(self, query: str, return_docs: bool = True, cutoff: int = 100):
        """Reference sparse_retriever.py:260-308: list of docs with
        ``score`` when ``return_docs`` else {orig_id: score}."""
        eng = self._require()
        res = eng.search(query, cutoff=cutoff)
        convs = [c for (c, _t) in res]
        orig = self._orig_ids(convs)
        scores = list(res.values())
        if not return_docs:
            return dict(zip(orig, scores))
        out = []
        id_col = self._docs.column("id")
        text_col = self._docs.column("text")
        extra_col = self._docs.column("extra")
        for c, s in zip(convs, scores):
            i = int(c)
            doc = {"id": id_col[i].as_py(), "text": text_col[i].as_py()}
            extra = extra_col[i].as_py()
            if extra:
                doc.update(json.loads(extra))
            doc["score"] = s
            out.append(doc)
        return out

    def msearch(self, queries: Sequence[Dict], cutoff: int = 100) -> Dict:
        """{q_id: {orig_id: score}} in input order (reference
        sparse_retriever.py:310-378); runs on the parallel scorer
        pool when a Ray session is active."""
        import ray

        eng = self._require()
        if ray.is_initialized() and len(queries) > 32:
            tbl = eng.msearch_parallel(queries, cutoff=cutoff)
            out: Dict[str, Dict[str, float]] = {q["id"]: {} for q in queries}
            q_ids = tbl.column("q_id").to_pylist()
            convs = tbl.column("conv_id").to_pylist()
            scores = tbl.column("score").to_pylist()
            orig = self._orig_ids(convs)
            for q, o, s in zip(q_ids, orig, scores):
                out[q][o] = s
            return out
        return {
            q["id"]: self.search(q["text"], return_docs=False, cutoff=cutoff)
            for q in queries
        }

    def bsearch(
        self,
        queries: Sequence[Dict],
        cutoff: int = 100,
        batch_size: int = 1000,
        path: Optional[str] = None,
        qrels: Optional[Dict] = None,
    ):
        """Reference sparse_retriever.py:380-451: batched msearch;
        with ``path``, streams JSONL rows {id, text, {model}_doc_ids,
        {model}_scores [, rel_doc_ids, rel_scores]} and returns None.
        """
        model = self._require().cfg.model
        if path is None:
            results = {}
            for i in range(0, len(queries), batch_size):
                results.update(self.msearch(queries[i : i + batch_size], cutoff))
            return results
        by_id = {str(q["id"]): q for q in queries}
        with open(path, "w") as f:
            for i in range(0, len(queries), batch_size):
                batch = queries[i : i + batch_size]
                res = self.msearch(batch, cutoff)
                for q_id, r in res.items():
                    row = {
                        "id": q_id,
                        "text": by_id[q_id]["text"],
                        f"{model}_doc_ids": list(r.keys()),
                        f"{model}_scores": [float(s) for s in r.values()],
                    }
                    if qrels is not None and q_id in qrels:
                        row["rel_doc_ids"] = list(qrels[q_id].keys())
                        row["rel_scores"] = list(qrels[q_id].values())
                    f.write(json.dumps(row) + "\n")
        return None

    def autotune(
        self,
        queries: Sequence[Dict],
        qrels: Dict[str, Dict[str, float]],
        metric: str = "ndcg",
        n_trials: int = 100,
        cutoff: int = 100,
    ) -> dict:
        """Reference sparse_retriever.py autotune surface (delegates
        to the engine's seeded grid search; conv ids are enumeration
        indices, so qrels must use ORIGINAL doc ids — translated
        here)."""
        eng = self._require()
        id_col = self._docs.column("id").to_pylist()
        orig_to_conv = {o: f"{i:012d}" for i, o in enumerate(id_col)}
        qrels_conv = {
            q: {orig_to_conv[d]: g for d, g in rels.items() if d in orig_to_conv}
            for q, rels in qrels.items()
        }
        best = eng.autotune(queries, qrels_conv, metric, n_trials, cutoff)
        self.cfg.hyperparams = best
        return best
