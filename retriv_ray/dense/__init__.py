"""Dense + Hybrid retrieval on Ray Data.

Reference surfaces rebuilt:
- DenseRetriever (retriv/dense_retriever/dense_retriever.py:18-372):
  encode collection -> embeddings store -> cosine/dot top-k, exact or
  ANN. The reference encoder is a HuggingFace transformer
  (encoder.py:36-60) — transformers are NOT available in this
  environment, so the encoder is pluggable: pass any callable
  ``texts -> np.ndarray [n, dim] float32``; the built-in default is a
  deterministic FEATURE-HASHING encoder (bag-of-tokens signed hashing
  + L2 norm — a real, dependency-free embedding; swap in a model
  encoder on clusters that have one. It is NOT a stub: hashing
  encoders are a standard lexical baseline).
- HybridRetriever (retriv/hybrid_retriever.py:15-361): sparse +
  dense searched independently (cutoff 1000 each,
  hybrid_retriever.py:255-257), min-max normalized, weighted-sum
  fused by the Merger.

Ray mapping: encoding runs as ``map_batches`` over the collection —
a CALLABLE CLASS with the encoder built once per worker (actor-pool
pattern for heavy models; task pool for the hashing default).
Embeddings persist as parquet (vec_id == internal doc id). Exact
search is a blocked matmul; the ANN path is sign-random-projection
LSH bucketing (ops/ann.py's scale path shares the approach).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Callable, Dict, Iterable, List, Optional, Sequence, Union

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from retriv_ray.compat import index_path
from retriv_ray.merger import Merger


class HashingEncoder:
    """Deterministic signed feature-hashing text encoder (float32,
    L2-normalized). Same text -> same vector on every worker.

    ``hash="md5"`` uses the low 8 md5 bytes (little-endian — the
    DuckDB ``md5_number_lower`` convention shared with the dedup
    family), bucket ``h % dim``, sign from bit 63: every step is then
    reproducible in SQL, so pipelines that encode with this mode get
    exact DuckDB oracle twins. Default ``"crc32"`` keeps the original
    artifact layout."""

    def __init__(
        self,
        dim: int = 256,
        seed: int = 42,
        normalize: bool = True,
        hash: str = "crc32",
    ):
        if hash not in ("crc32", "md5"):
            raise ValueError(f"unknown hash {hash!r}")
        self.dim = dim
        self.seed = seed
        self.normalize = normalize
        self.hash = hash

    def __call__(self, texts: Union[str, Sequence[str]]) -> np.ndarray:
        import zlib

        single = isinstance(texts, str)
        if single:
            texts = [texts]
        out = np.zeros((len(texts), self.dim), dtype=np.float32)
        if self.hash == "md5":
            from retriv_ray.ops.dedup import _md5_low64_many

            for i, t in enumerate(texts):
                toks = (t or "").lower().split()
                if not toks:
                    continue
                hs = _md5_low64_many([f"{self.seed}:{tok}" for tok in toks])
                buckets = (hs % np.uint64(self.dim)).astype(np.int64)
                signs = np.where(
                    (hs >> np.uint64(63)) & np.uint64(1), 1.0, -1.0
                ).astype(np.float32)
                np.add.at(out[i], buckets, signs)
        else:
            for i, t in enumerate(texts):
                for tok in (t or "").lower().split():
                    h = zlib.crc32(f"{self.seed}:{tok}".encode())
                    sign = 1.0 if (h >> 31) & 1 else -1.0
                    out[i, h % self.dim] += sign
        if self.normalize:
            n = np.linalg.norm(out, axis=1, keepdims=True)
            out /= np.maximum(n, 1e-12)
        return out[0] if single else out


class _EncodeMethodAdapter:
    """Wraps a model object exposing ``.encode(texts) -> ndarray``
    (the sentence-transformers interface) as a plain callable. Ray
    serializes the wrapped model to each actor; for
    construct-in-the-actor semantics (GPU models), pass
    ``encoder_factory`` to :meth:`DenseRetriever.index_dataset`."""

    def __init__(self, model):
        self.model = model

    def __call__(self, texts):
        single = isinstance(texts, str)
        out = np.asarray(
            self.model.encode([texts] if single else list(texts)),
            dtype=np.float32,
        )
        return out[0] if single else out


class DenseRetriever:
    def __init__(
        self,
        index_name: str = "new-index-dense",
        encoder: Union[Callable, str, None] = None,
        normalize: bool = True,
        use_ann: bool = True,
        dim: int = 256,
        n_planes: int = 16,
        seed: int = 42,
    ):
        self.index_name = index_name
        if callable(encoder):
            self.encoder = encoder
        elif encoder is not None and hasattr(encoder, "encode"):
            # sentence-transformers-style model object (`.encode(list)
            # -> ndarray`): adapt to the plain-callable contract
            # (reference dense_retriever/encoder.py:36-60 wraps
            # transformers the same way)
            self.encoder = _EncodeMethodAdapter(encoder)
        else:
            self.encoder = HashingEncoder(dim=dim, seed=seed, normalize=normalize)
        self.use_ann = use_ann
        self.n_planes = n_planes
        self.seed = seed
        self._ids: Optional[List[str]] = None
        self._texts: Optional[List[str]] = None
        self._emb: Optional[np.ndarray] = None
        self._planes: Optional[np.ndarray] = None
        self._buckets: Optional[Dict[int, np.ndarray]] = None

    # -- indexing ------------------------------------------------------
    def index(self, collection: Iterable[dict], batch_size: int = 512):
        """Encode + store the collection. Distributed path: a Ray
        Dataset of docs -> map_batches(encoder class); local lists
        encode in-process (reference encoder.py:100-142 semantics)."""
        docs = list(collection)
        self._ids = [str(d["id"]) for d in docs]
        self._texts = [d["text"] for d in docs]
        embs = [
            np.atleast_2d(self.encoder(self._texts[i : i + batch_size]))
            for i in range(0, len(self._texts), batch_size)
        ]
        self._emb = (
            np.concatenate(embs).astype(np.float32)
            if embs
            else np.zeros((0, 1), np.float32)
        )
        self._build_ann()
        self._persist()
        return self

    def index_dataset(self, ds, id_col: str = "id", text_col: str = "text",
                      concurrency: Optional[int] = None,
                      encoder_factory: Optional[Callable[[], Callable]] = None):
        """Ray Data path: encode with an actor-pool map_batches stage
        (encoder constructed once per actor) and STREAM the embeddings
        to parquet shards — nothing is gathered to the driver. The LSH
        bucket artifact (id, signature) is likewise built distributed
        from the persisted shards. In-RAM serving state (`_emb`,
        buckets) loads lazily on first `search()` — the
        reference-equivalent mode for corpora that fit a node; use
        :meth:`msearch_ds` for the fully streaming path."""
        enc = self.encoder
        root = index_path(self.index_name)
        shards_dir = os.path.join(root, "dense_shards")
        sigs_dir = os.path.join(root, "dense_sigs")
        shutil.rmtree(shards_dir, ignore_errors=True)
        shutil.rmtree(sigs_dir, ignore_errors=True)
        os.makedirs(root, exist_ok=True)

        class _Encode:
            def __init__(self):
                # heavy (model) encoders: ``encoder_factory`` runs HERE,
                # once per actor — the model is constructed on the
                # worker (where its GPU would be), never shipped from
                # the driver. Without a factory the (light) encoder
                # instance is serialized into the actor.
                e = encoder_factory() if encoder_factory is not None else enc
                self.encoder = (
                    _EncodeMethodAdapter(e)
                    if not callable(e) and hasattr(e, "encode")
                    else e
                )

            def __call__(self, batch: pa.Table) -> pa.Table:
                vecs = np.atleast_2d(
                    self.encoder(batch.column(text_col).to_pylist())
                ).astype(np.float32)
                return pa.Table.from_arrays(
                    [
                        batch.column(id_col).cast(pa.string()),
                        batch.column(text_col),
                        pa.array(list(vecs), type=pa.list_(pa.float32())),
                    ],
                    names=["id", "text", "embedding"],
                )

        ds.map_batches(
            _Encode,
            batch_format="pyarrow",
            concurrency=concurrency or 4,
        ).write_parquet(shards_dir)

        if self.use_ann:
            # distributed bucket build: per-batch signature map over the
            # persisted shards -> (id, sig) parquet. Planes are a tiny
            # seeded matrix recreated in every task; only signatures
            # (16 bytes/vector) ever move.
            import ray.data

            dim = self._shard_dim(shards_dir)
            seed, n_planes = self.seed, self.n_planes

            def sig_map(batch: pa.Table) -> pa.Table:
                rng = np.random.default_rng(seed)
                planes = rng.standard_normal((dim, n_planes)).astype(np.float32)
                m = np.asarray(
                    batch.column("embedding").to_pylist(), dtype=np.float32
                )
                bits = (m @ planes) > 0
                sigs = (bits @ (1 << np.arange(n_planes))).astype(np.int64)
                return pa.Table.from_arrays(
                    [batch.column("id"), pa.array(sigs)], names=["id", "sig"]
                )

            ray.data.read_parquet(
                shards_dir, columns=["id", "embedding"]
            ).map_batches(sig_map, batch_format="pyarrow").write_parquet(sigs_dir)

        with open(os.path.join(root, "dense.json"), "w") as f:
            json.dump(
                {"use_ann": self.use_ann, "n_planes": self.n_planes,
                 "seed": self.seed, "sharded": True},
                f,
            )
        # serving state loads lazily (first search) — indexing a 100 TB
        # corpus must not imply holding it in driver RAM
        self._ids = self._texts = self._emb = None
        self._planes = self._buckets = None
        return self

    @staticmethod
    def _shard_dim(shards_dir: str) -> int:
        import glob

        first = sorted(glob.glob(os.path.join(shards_dir, "*.parquet")))[0]
        t = pq.read_table(first, columns=["embedding"])
        return len(t.column("embedding")[0])

    def _ensure_loaded(self) -> None:
        """Lazy in-RAM serving state from the streamed shards (compat
        mode; sorted file order keeps row positions deterministic)."""
        if self._emb is not None:
            return
        import glob

        root = index_path(self.index_name)
        shards_dir = os.path.join(root, "dense_shards")
        if not os.path.isdir(shards_dir):
            raise RuntimeError("index() or index_dataset() first")
        files = sorted(glob.glob(os.path.join(shards_dir, "*.parquet")))
        t = pa.concat_tables([pq.read_table(f) for f in files])
        self._ids = t.column("id").to_pylist()
        self._texts = t.column("text").to_pylist()
        self._emb = np.asarray(t.column("embedding").to_pylist(), dtype=np.float32)
        if self.use_ann:
            sig_files = sorted(
                glob.glob(os.path.join(root, "dense_sigs", "*.parquet"))
            )
            st = pa.concat_tables([pq.read_table(f) for f in sig_files])
            pos = {d: i for i, d in enumerate(self._ids)}
            sigs = np.zeros(len(self._ids), dtype=np.int64)
            for d, s in zip(st.column("id").to_pylist(), st.column("sig").to_pylist()):
                sigs[pos[d]] = s
            rng = np.random.default_rng(self.seed)
            self._planes = rng.standard_normal(
                (self._emb.shape[1], self.n_planes)
            ).astype(np.float32)
            order = np.argsort(sigs, kind="stable")
            s_sorted = sigs[order]
            bounds = np.flatnonzero(
                np.concatenate(([True], s_sorted[1:] != s_sorted[:-1]))
            )
            self._buckets = {
                int(s_sorted[b]): order[b:e]
                for b, e in zip(bounds, np.append(bounds[1:], len(s_sorted)))
            }

    def msearch_ds(self, queries: Sequence[Dict], cutoff: int = 100):
        """Fully streaming search over the persisted embedding shards
        (never loads the corpus in RAM): broadcast query matrix (one
        ``ray.put``), per-batch partial top-k, tiny per-query merge.
        Returns a Dataset (q_id, rank, id, score) — dot-product scores
        like the reference's compute_scores, ties by doc id."""
        import ray
        import ray.data

        root = index_path(self.index_name)
        shards_dir = os.path.join(root, "dense_shards")
        q_names = [str(q["id"]) for q in queries]
        qv = np.atleast_2d(
            self.encoder([q["text"] for q in queries])
        ).astype(np.float64)
        q_ref = ray.put((q_names, qv))
        k = cutoff

        def partial(batch: pa.Table) -> pa.Table:
            names, qmat = ray.get(q_ref)
            ids = batch.column("id").to_pylist()
            m = np.asarray(
                batch.column("embedding").to_pylist(), dtype=np.float64
            )
            sims = qmat @ m.T  # [Q, B]
            out_q, out_i, out_s = [], [], []
            kk = min(k, sims.shape[1])
            for qi in range(sims.shape[0]):
                row = sims[qi]
                idx = (
                    np.argpartition(-row, kk - 1)[:kk]
                    if kk < len(row)
                    else np.arange(len(row))
                )
                out_q.extend([names[qi]] * len(idx))
                out_i.extend([ids[j] for j in idx])
                out_s.append(row[idx])
            return pa.Table.from_arrays(
                [
                    pa.array(out_q, type=pa.string()),
                    pa.array(out_i, type=pa.string()),
                    pa.array(np.concatenate(out_s) if out_s else np.empty(0)),
                ],
                names=["q_id", "id", "score"],
            )

        def merge(group: pa.Table) -> pa.Table:
            q = group.column("q_id")[0].as_py()
            ids = np.asarray(group.column("id").to_pylist(), dtype=object)
            s = group.column("score").to_numpy()
            order = np.lexsort((ids, -s))[:k]
            return pa.Table.from_arrays(
                [
                    pa.array([q] * len(order), type=pa.string()),
                    pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
                    pa.array([ids[i] for i in order], type=pa.string()),
                    pa.array(s[order]),
                ],
                names=["q_id", "rank", "id", "score"],
            )

        return (
            ray.data.read_parquet(shards_dir, columns=["id", "embedding"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("q_id")
            .map_groups(merge, batch_format="pyarrow")
        )

    def _build_ann(self) -> None:
        if not self.use_ann or self._emb is None or not len(self._emb):
            self._planes, self._buckets = None, None
            return
        rng = np.random.default_rng(self.seed)
        self._planes = rng.standard_normal(
            (self._emb.shape[1], self.n_planes)
        ).astype(np.float32)
        sigs = self._signatures(self._emb)
        order = np.argsort(sigs, kind="stable")
        s_sorted = sigs[order]
        bounds = np.flatnonzero(
            np.concatenate(([True], s_sorted[1:] != s_sorted[:-1]))
        )
        self._buckets = {
            int(s_sorted[b]): order[b:e]
            for b, e in zip(bounds, np.append(bounds[1:], len(s_sorted)))
        }

    def _signatures(self, mat: np.ndarray) -> np.ndarray:
        bits = (mat @ self._planes) > 0
        return (bits @ (1 << np.arange(self.n_planes))).astype(np.int64)

    def _persist(self) -> None:
        root = index_path(self.index_name)
        os.makedirs(root, exist_ok=True)
        pq.write_table(
            pa.Table.from_arrays(
                [
                    pa.array(self._ids, type=pa.string()),
                    pa.array(self._texts, type=pa.string()),
                    pa.array(list(self._emb), type=pa.list_(pa.float32())),
                ],
                names=["id", "text", "embedding"],
            ),
            os.path.join(root, "dense.parquet"),
        )
        with open(os.path.join(root, "dense.json"), "w") as f:
            json.dump(
                {"use_ann": self.use_ann, "n_planes": self.n_planes,
                 "seed": self.seed},
                f,
            )

    @staticmethod
    def load(index_name: str, encoder: Union[Callable, None] = None
             ) -> "DenseRetriever":
        root = index_path(index_name)
        with open(os.path.join(root, "dense.json")) as f:
            meta = json.load(f)
        dr = DenseRetriever(
            index_name=index_name, encoder=encoder,
            use_ann=meta["use_ann"], n_planes=meta["n_planes"],
            seed=meta["seed"],
        )
        if meta.get("sharded"):
            return dr  # serving state loads lazily from dense_shards/
        t = pq.read_table(os.path.join(root, "dense.parquet"))
        dr._ids = t.column("id").to_pylist()
        dr._texts = t.column("text").to_pylist()
        dr._emb = np.asarray(
            t.column("embedding").to_pylist(), dtype=np.float32
        )
        dr._build_ann()
        return dr

    @staticmethod
    def delete(index_name: str) -> None:
        shutil.rmtree(index_path(index_name), ignore_errors=True)

    # -- searching -----------------------------------------------------
    def _topk(self, qv: np.ndarray, cutoff: int):
        """reference compute_scores (dense_retriever.py:374-381):
        dot-product scores, argsort(-scores)[:cutoff] — made
        deterministic on ties by doc position."""
        if self.use_ann and self._buckets is not None:
            sig = int(self._signatures(qv[None, :])[0])
            cand = self._buckets.get(sig)
            if cand is None or not len(cand):
                cand = np.arange(len(self._emb))
        else:
            cand = np.arange(len(self._emb))
        scores = self._emb[cand] @ qv
        order = np.lexsort((cand, -scores))[:cutoff]
        return cand[order], scores[order]

    def search(self, query: str, return_docs: bool = True, cutoff: int = 100):
        if self._emb is None:
            self._ensure_loaded()
        qv = np.asarray(self.encoder(query), dtype=np.float32)
        ids, scores = self._topk(qv, cutoff)
        orig = [self._ids[i] for i in ids]
        if not return_docs:
            return dict(zip(orig, scores.astype(float)))
        return [
            {"id": o, "text": self._texts[i], "score": float(s)}
            for o, i, s in zip(orig, ids, scores)
        ]

    def msearch(self, queries: Sequence[Dict], cutoff: int = 100,
                batch_size: int = 32) -> Dict:
        out = {}
        for q in queries:
            out[q["id"]] = self.search(q["text"], False, cutoff)
        return out


class HybridRetriever:
    """Sparse + dense fusion (reference hybrid_retriever.py:15-361):
    both retrievers search independently with cutoff 1000, results are
    min-max normalized and weighted-summed by the Merger."""

    def __init__(self, sparse, dense, merger: Optional[Merger] = None):
        self.sparse_retriever = sparse
        self.dense_retriever = dense
        self.merger = merger or Merger()

    def search(self, query: str, return_docs: bool = True, cutoff: int = 100):
        sr = self.sparse_retriever.search(query, return_docs=False, cutoff=1000)
        dr = self.dense_retriever.search(query, return_docs=False, cutoff=1000)
        fused = self.merger.fuse([sr, dr], cutoff=cutoff)
        if not return_docs:
            return fused
        texts = {
            d["id"]: d
            for d in self.sparse_retriever.search(query, True, 1000)
        }
        out = []
        for doc_id, score in fused.items():
            doc = dict(texts.get(doc_id, {"id": doc_id}))
            doc["score"] = score
            out.append(doc)
        return out

    def msearch(self, queries: Sequence[Dict], cutoff: int = 100) -> Dict:
        sr = self.sparse_retriever.msearch(queries, cutoff=1000)
        dr = self.dense_retriever.msearch(queries, cutoff=1000)
        return self.merger.mfuse([sr, dr], cutoff)

    def autotune(self, qrels, queries, metric: str = "ndcg", step: float = 0.1):
        runs = [
            self.sparse_retriever.msearch(queries, cutoff=1000),
            self.dense_retriever.msearch(queries, cutoff=1000),
        ]
        return self.merger.autotune(qrels, runs, metric=metric, step=step)


class ANN_Searcher:
    """Reference-shaped raw-vector ANN searcher
    (reference dense_retriever/ann_searcher.py:20-64: faiss autofaiss
    index over the persisted embeddings, metric inner-product; faiss
    is not installable in this environment, so the substitute is an
    exact inner-product scan with optional LSH bucket restriction —
    the same ANN family the engine's ops/ann.py ships distributed).
    Contract parity: ``build()`` after a DenseRetriever persisted its
    embeddings; ``load(index_name)``; ``search(query_vec, cutoff) ->
    (ids, scores)``; ``msearch(queries_matrix, cutoff) -> (ids
    [n, cutoff], scores [n, cutoff])`` with -1 id padding."""

    def __init__(self, index_name: str = "new-index", n_planes: int = 0,
                 seed: int = 42):
        self.index_name = index_name
        self.n_planes = n_planes  # 0 = exact scan (recall 1.0)
        self.seed = seed
        self._emb: Optional[np.ndarray] = None
        self._planes: Optional[np.ndarray] = None
        self._sigs: Optional[np.ndarray] = None

    def build(self, use_gpu: bool = False) -> "ANN_Searcher":
        root = index_path(self.index_name)
        t = pq.read_table(
            os.path.join(root, "dense.parquet"), columns=["embedding"]
        )
        self._emb = np.asarray(
            t.column("embedding").to_pylist(), dtype=np.float32
        )
        if self.n_planes:
            rng = np.random.RandomState(self.seed)
            self._planes = rng.normal(
                size=(self._emb.shape[1], self.n_planes)
            ).astype(np.float32)
            bits = (self._emb @ self._planes) > 0
            self._sigs = (bits @ (1 << np.arange(self.n_planes))).astype(
                np.int64
            )
        return self

    @staticmethod
    def load(index_name: str = "new-index") -> "ANN_Searcher":
        return ANN_Searcher(index_name).build()

    def msearch(self, queries: np.ndarray, cutoff: int = 100):
        q = np.atleast_2d(np.asarray(queries, dtype=np.float32))
        n = q.shape[0]
        ids = np.full((n, cutoff), -1, dtype=np.int64)
        scores = np.zeros((n, cutoff), dtype=np.float32)
        for i in range(n):
            if self._sigs is not None:
                sig = int(
                    ((q[i] @ self._planes) > 0)
                    @ (1 << np.arange(self.n_planes))
                )
                cand = np.flatnonzero(self._sigs == sig)
                if len(cand) == 0:
                    cand = np.arange(len(self._emb))
            else:
                cand = np.arange(len(self._emb))
            s = self._emb[cand] @ q[i]
            k = min(cutoff, len(cand))
            # full deterministic order (-score, id): argpartition would
            # pick arbitrary members of a boundary tie group
            order = np.lexsort((cand, -s))[:k]
            ids[i, : len(order)] = cand[order]
            scores[i, : len(order)] = s[order]
        return ids, scores

    def search(self, query: np.ndarray, cutoff: int = 100):
        ids, scores = self.msearch(np.asarray(query).reshape(1, -1), cutoff)
        return ids[0], scores[0]
