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
    "AdvancedRetriever",
    "SearchEngine",
    "DenseRetriever",
    "HybridRetriever",
    "Merger",
    "Encoder",
    "ANN_Searcher",
    "index_path",
    "set_base_path",
]


def set_base_path(path: str) -> None:
    """Reference retriv/__init__.py:26-27: redirect where named
    indexes/collections live (our equivalent of RETRIV_BASE_PATH)."""
    global BASE_DIR
    BASE_DIR = path
    os.environ["RETRIV_RAY_COLLECTIONS"] = path


def __getattr__(name):
    # Reference top-level surface (retriv/__init__.py:1-9): lazy so
    # importing the sparse compat class doesn't pull the dense stack.
    if name == "SearchEngine":  # reference alias for SparseRetriever
        return SparseRetriever
    if name in ("DenseRetriever", "HybridRetriever", "ANN_Searcher"):
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

    def add(self, collection: Iterable[dict], callback: Optional[Callable] = None):
        """Incrementally add documents to an existing index — beyond
        the reference, which can only rebuild from scratch
        (sparse_retriever.py:201-226 overwrites). A delta index is
        built over ONLY the new docs and merged with the live one
        (index/merge.py merge_indexes — byte-identical to a full
        rebuild, validated by tests/test_merge_indexes.py), so the
        cost is O(new docs) + the merge's boundary re-encode, not
        O(corpus). New internal ids continue the enumeration order,
        exactly as if the docs had been in the original collection.

        Requires ``min_df == 1`` (global-df pruning is not
        incrementally mergeable; merge_indexes raises otherwise).
        Duplicate original ids are rejected.
        """
        from retriv_ray.index.merge import merge_indexes

        eng = self._require()
        root = index_path(self.index_name)
        n0 = self._docs.num_rows
        seen = set(self._docs.column("id").to_pylist())
        ids, texts, extras = [], [], []
        for doc in collection:
            if callback is not None:
                doc = callback(doc)
            oid = str(doc["id"])
            if oid in seen:
                raise ValueError(f"add(): duplicate document id {oid!r}")
            seen.add(oid)
            ids.append(oid)
            texts.append(doc["text"])
            extras.append(
                {k: v for k, v in doc.items() if k not in ("id", "text")}
            )
        m = len(ids)
        if m == 0:
            return self
        conv = [f"{i:012d}" for i in range(n0, n0 + m)]
        new_tbl = pa.Table.from_arrays(
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
        delta_root = os.path.join(root, "_delta")
        shutil.rmtree(delta_root, ignore_errors=True)
        os.makedirs(delta_root, exist_ok=True)
        turns = pa.Table.from_arrays(
            [
                new_tbl.column("conv_id"),
                pa.array(np.zeros(m, dtype=np.int32)),
                new_tbl.column("text"),
            ],
            names=["conv_id", "turn_idx", "text"],
        )
        src = os.path.join(delta_root, "turns.parquet")
        pq.write_table(turns, src)
        # layout must match for the merge: reuse the live manifest's
        # num_parts / shard_docs
        man = eng.index.manifest
        build_index(
            src,
            os.path.join(delta_root, "index"),
            self.cfg,
            num_parts=man.num_parts,
            shard_docs=man.salt_docs,
        )
        merged = os.path.join(root, "_merged")
        shutil.rmtree(merged, ignore_errors=True)
        merge_indexes(
            os.path.join(root, "index"),
            os.path.join(delta_root, "index"),
            merged,
        )
        # tombstones (conv-keyed) of the live index stay valid — A's
        # conv ids and doc ids are unchanged by the merge
        from retriv_ray.index.tombstones import _tombstone_path

        ts = _tombstone_path(os.path.join(root, "index"))
        if os.path.exists(ts):
            dst = _tombstone_path(merged)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            shutil.copyfile(ts, dst)
        old = os.path.join(root, "_old")
        shutil.rmtree(old, ignore_errors=True)
        os.rename(os.path.join(root, "index"), old)
        os.rename(merged, os.path.join(root, "index"))
        shutil.rmtree(old, ignore_errors=True)
        shutil.rmtree(delta_root, ignore_errors=True)
        self._docs = pa.concat_tables([self._docs, new_tbl])
        pq.write_table(self._docs, os.path.join(root, "docs.parquet"))
        self._engine = RaySparseRetriever(os.path.join(root, "index"), self.cfg)
        return self

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

    def bsearch_parquet(
        self,
        queries: Sequence[Dict],
        path: str,
        cutoff: int = 100,
        with_docs: bool = True,
        doc_cols: Optional[Sequence[str]] = None,
        **kwargs,
    ) -> None:
        """Batch search streamed to partitioned parquet, one row per
        (query, hit), with the hit's document columns attached via the
        doc-store join (broadcast for small stores, distributed hash
        join for big ones — see RaySparseRetriever.bsearch). The
        scale-path counterpart of the reference's JSONL ``bsearch``."""
        eng = self._require()
        docs_path = (
            os.path.join(os.path.dirname(eng.index_dir), "docs.parquet")
            if with_docs
            else None
        )
        eng.bsearch(
            list(queries), path, cutoff=cutoff, docs_path=docs_path,
            doc_cols=doc_cols, **kwargs,
        )

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


# ---------------------------------------------------------------------------
# AdvancedRetriever (reference experimental/advanced_retriever.py:27-576)
# ---------------------------------------------------------------------------

ADV_KIND_LIST = ["id", "text", "number", "bool", "keyword", "keywords"]


class AdvancedRetriever(SparseRetriever):
    """Schema-typed collection indexing + metadata-filtered search
    (reference retriv/experimental/advanced_retriever.py:27-576): the
    constructor declares a field schema ({name: id|text|number|bool|
    keyword|keywords}); ``index`` validates the collection against it
    and builds the text index plus a doc_id-aligned metadata sidecar;
    ``search`` accepts a plain query string or a dict with ``text`` /
    ``where`` / ``where_not`` / bare field filters, replicating the
    reference DSL (filters intersect; filters-only queries return
    every matching doc with score 1.0)."""

    def __init__(
        self,
        schema: Dict[str, str],
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
        self.check_schema(schema)
        super().__init__(
            index_name=index_name,
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
        self.schema = schema
        self.text_field = [k for k, v in schema.items() if v == "text"][0]

    # -- validation (reference advanced_retriever.py:162-222) ----------
    @staticmethod
    def check_schema(schema: Dict[str, str]) -> bool:
        if "id" not in schema:
            raise ValueError("Schema must contain an id field")
        for k in schema:
            if not isinstance(k, str):
                raise TypeError("Schema keys must be strings")
        text_found = False
        for value in schema.values():
            if value not in ADV_KIND_LIST:
                raise ValueError(f"Type {value} not supported")
            if value == "text":
                if text_found:
                    raise ValueError("Only one field can be text")
                text_found = True
        return True

    def check_collection(self, collection, schema: Dict[str, str]) -> bool:
        for i, doc in enumerate(collection):
            if "id" not in doc:
                raise ValueError(f"Doc #{i} has no id")
            doc_id = doc["id"]
            for field in schema:
                if field not in doc:
                    raise ValueError(f"Field {field} not in doc {doc_id}")
            for field, value in doc.items():
                if field not in schema:
                    raise ValueError(f"Field {field} not in schema")
                kind = schema[field]
                if kind == "id" and not isinstance(value, (int, str)):
                    raise TypeError(f"Field {field} of doc #{i} has wrong type")
                if kind == "text" and not isinstance(value, str):
                    raise TypeError(f"Field {field} of doc {doc_id} has wrong type")
                if kind == "number" and not isinstance(value, (int, float)):
                    raise TypeError(f"Field {field} of doc {doc_id} has wrong type")
                if kind == "bool" and not isinstance(value, bool):
                    raise TypeError(f"Field {field} of doc {doc_id} has wrong type")
                if kind == "keyword" and not isinstance(value, str):
                    raise TypeError(f"Field {field} of doc {doc_id} has wrong type")
                if kind == "keywords" and not isinstance(value, (list, set, tuple)):
                    raise TypeError(f"Field {field} of doc {doc_id} has wrong type")
        return True

    # -- indexing ------------------------------------------------------
    def index(self, collection: Iterable[dict], callback: Optional[Callable] = None):
        from retriv_ray.search.metadata import build_metadata

        docs = list(collection)
        if callback is not None:
            docs = [callback(d) for d in docs]
        self.check_collection(docs, self.schema)
        base_docs = []
        for d in docs:
            base = {"id": d["id"], "text": d[self.text_field]}
            for k, v in d.items():
                if k not in ("id", self.text_field):
                    base[k] = list(v) if isinstance(v, (set, tuple)) else v
            base_docs.append(base)
        super().index(base_docs)

        # metadata sidecar: conv_id/turn_idx-aligned parquet of the
        # typed fields, built through the engine's build_metadata pass
        meta_fields = {
            k: v for k, v in self.schema.items() if v not in ("id", "text")
        }
        if meta_fields:
            root = index_path(self.index_name)
            arrays = [
                pa.array([f"{i:012d}" for i in range(len(docs))], type=pa.string()),
                pa.array(np.zeros(len(docs), dtype=np.int32)),
            ]
            names = ["conv_id", "turn_idx"]
            for f, kind in meta_fields.items():
                vals = [d[f] for d in docs]
                if kind == "keywords":
                    arrays.append(
                        pa.array([list(v) for v in vals], type=pa.list_(pa.string()))
                    )
                else:
                    arrays.append(pa.array(vals))
                names.append(f)
            meta_src = os.path.join(root, "meta_turns.parquet")
            pq.write_table(pa.Table.from_arrays(arrays, names=names), meta_src)
            build_metadata(meta_src, os.path.join(root, "index"), meta_fields)
        mf_path = os.path.join(index_path(self.index_name), "advanced.json")
        with open(mf_path, "w") as f:
            json.dump({"schema": self.schema}, f)
        return self

    @staticmethod
    def load(index_name: str = "new-index") -> "AdvancedRetriever":
        root = index_path(index_name)
        with open(os.path.join(root, "advanced.json")) as f:
            schema = json.load(f)["schema"]
        base = SparseRetriever.load(index_name)
        ar = AdvancedRetriever(schema, index_name=index_name)
        ar.cfg = base.cfg
        ar._engine = base._engine
        ar._docs = base._docs
        return ar

    # -- filter surface (reference advanced_retriever.py:358-501) ------
    def filter_doc_ids(self, field, clause, value=None, operator=None):
        return self._require().metadata.filter_doc_ids(field, clause, value, operator)

    def get_filtered_doc_ids(self, filters):
        return self._require().metadata.get_filtered_doc_ids(filters)

    def format_filters(self, filters, clause: str = "must"):
        return self._require().metadata.format_filters(filters, clause)

    # -- searching -----------------------------------------------------
    def search(
        self,
        query: Union[Dict, str],
        return_docs: bool = True,
        cutoff: int = 100,
        operator: str = "OR",
        subset_doc_ids: Optional[List] = None,
    ):
        eng = self._require()
        subset = None
        if subset_doc_ids is not None:
            id_col = self._docs.column("id").to_pylist()
            pos = {o: i for i, o in enumerate(id_col)}
            subset = np.asarray(
                sorted(pos[d] for d in subset_doc_ids), dtype=np.int64
            )
        res = eng.search(query, cutoff=cutoff, operator=operator, subset=subset)
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
            doc = {"id": id_col[i].as_py(), self.text_field: text_col[i].as_py()}
            extra = extra_col[i].as_py()
            if extra:
                doc.update(json.loads(extra))
            doc["score"] = s
            out.append(doc)
        return out
