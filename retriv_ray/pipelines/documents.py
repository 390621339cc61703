"""The documents-table pipelines behind __ray_entry__.

The testdata ``documents`` table (doc_id, text, lang, source,
n_chars) is mapped into the canonical transcript shape (one doc ==
one single-turn conversation, conv_id zero-padded so lexical order ==
doc_id order) and indexed with a SQL-comparable configuration:
whitespace tokenizer, no stemmer, no stopwords — on the testdata's
clean lowercase text every normalizer is a no-op, so a DuckDB oracle
can reproduce tokenization exactly with regexp_split_to_array.

Index builds are cached under /tmp keyed by the build fingerprint, so
the driver's repeated queries() calls reuse one build per sf_dir.
"""

from __future__ import annotations

import hashlib
import os
from typing import Dict, Optional, Tuple

import numpy as np
import pyarrow as pa

from retriv_ray.config import SparseConfig
from retriv_ray.index.build import build_index
from retriv_ray.search.searcher import RaySparseRetriever

CACHE_ROOT = "/tmp/retriv_ray_indexes"

# SQL-comparable engine configs (score_dtype float64: DuckDB computes
# in float64; rank-only comparisons, see __ray_entry__.oracle_sql)
ORACLE_BM25 = SparseConfig(
    model="bm25", tokenizer="whitespace", stemmer=None, stopwords=None,
    score_dtype="float64",
)
ORACLE_TFIDF = SparseConfig(
    model="tf-idf", tokenizer="whitespace", stemmer=None, stopwords=None,
    score_dtype="float64",
)


def documents_as_transcripts(sf_dir: str):
    """documents.parquet -> Dataset in transcript shape (conv_id,
    turn_idx, text); conv_id = 'd%012d' % doc_id."""
    import ray.data

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def to_turns(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        return pa.Table.from_arrays(
            [
                pa.array([f"d{i:012d}" for i in ids], type=pa.string()),
                pa.array(np.zeros(len(ids), dtype=np.int32)),
                batch.column("text"),
            ],
            names=["conv_id", "turn_idx", "text"],
        )

    return ds.map_batches(to_turns, batch_format="pyarrow")


def conv_to_doc_id(convs) -> np.ndarray:
    return np.fromiter((int(c[1:]) for c in convs), dtype=np.int64, count=len(convs))


_RETRIEVERS: Dict[Tuple[str, str], RaySparseRetriever] = {}


def documents_index(sf_dir: str, cfg: SparseConfig) -> RaySparseRetriever:
    """Build-or-load the cached index for (sf_dir, cfg)."""
    key_src = f"{os.path.abspath(sf_dir)}|{sorted(cfg.to_json().items())}"
    key = hashlib.sha1(key_src.encode()).hexdigest()[:16]
    hit = _RETRIEVERS.get((sf_dir, key))
    if hit is not None:
        return hit
    index_dir = os.path.join(CACHE_ROOT, key)
    manifest = os.path.join(index_dir, "manifest.json")
    if not os.path.exists(manifest):
        build_index(
            documents_as_transcripts(sf_dir), index_dir, cfg, num_parts=4
        )
    r = RaySparseRetriever(index_dir, cfg)
    _RETRIEVERS[(sf_dir, key)] = r
    return r


def documents_split_indexes(
    sf_dir: str, cfg: SparseConfig, n_splits: int = 2
):
    """Build-or-load ``n_splits`` cached indexes over the documents
    table split by ``doc_id % n_splits`` — the federated-search
    fixture (each split is an independent full index build)."""
    import pyarrow.compute as pc

    out = []
    for part in range(n_splits):
        key_src = (
            f"{os.path.abspath(sf_dir)}|split{part}/{n_splits}|"
            f"{sorted(cfg.to_json().items())}"
        )
        key = hashlib.sha1(key_src.encode()).hexdigest()[:16]
        hit = _RETRIEVERS.get((sf_dir, key))
        if hit is not None:
            out.append(hit)
            continue
        index_dir = os.path.join(CACHE_ROOT, key)
        if not os.path.exists(os.path.join(index_dir, "manifest.json")):

            def keep(batch: pa.Table, _p=part) -> pa.Table:
                ids = pc.cast(
                    pc.utf8_slice_codeunits(batch.column("conv_id"), 1, 13),
                    pa.int64(),
                ).to_numpy(zero_copy_only=False)
                return batch.filter(pa.array(ids % n_splits == _p))

            src = documents_as_transcripts(sf_dir).map_batches(
                keep, batch_format="pyarrow"
            )
            build_index(src, index_dir, cfg, num_parts=4)
        r = RaySparseRetriever(index_dir, cfg)
        _RETRIEVERS[(sf_dir, key)] = r
        out.append(r)
    return out


def documents_transcript_parquet(sf_dir: str) -> str:
    """Write-once transcript-shaped parquet copy of documents.parquet
    (the positional build reads parquet path sources directly)."""
    key = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    path = os.path.join(CACHE_ROOT, f"transcripts_{key}")
    if not os.path.exists(os.path.join(path, "_DONE")):
        documents_as_transcripts(sf_dir).write_parquet(path)
        open(os.path.join(path, "_DONE"), "w").close()
    return path


_POS_INDEXES: Dict[str, "object"] = {}


def documents_positional_index(sf_dir: str, cfg: Optional[SparseConfig] = None):
    """Build-or-load the cached positional index for sf_dir (oracle
    config: whitespace / no stemmer / no stopwords, so positions equal
    raw whitespace token offsets — SQL-comparable)."""
    from retriv_ray.index.positional import PositionalIndex, build_positional_index

    cfg = cfg or ORACLE_BM25
    key_src = f"pos|{os.path.abspath(sf_dir)}|{sorted(cfg.to_json().items())}"
    key = hashlib.sha1(key_src.encode()).hexdigest()[:16]
    hit = _POS_INDEXES.get(key)
    if hit is not None:
        return hit
    index_dir = os.path.join(CACHE_ROOT, f"pos_{key}")
    if not os.path.exists(os.path.join(index_dir, "pos_manifest.json")):
        build_positional_index(
            documents_transcript_parquet(sf_dir), index_dir, cfg, num_parts=4
        )
    px = PositionalIndex(index_dir)
    _POS_INDEXES[key] = px
    return px


def ensure_documents_metadata(sf_dir: str, r: RaySparseRetriever) -> None:
    """Build the metadata sidecar (lang/source keyword, n_chars
    number) for a documents index if absent — enables the
    AdvancedRetriever filter DSL on it."""
    import ray.data

    from retriv_ray.search.metadata import build_metadata

    if os.path.exists(os.path.join(r.index_dir, "metadata", "schema.json")):
        return
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "source", "n_chars"],
    )

    def to_meta(batch):
        import pyarrow as pa

        ids = batch.column("doc_id").to_numpy()
        return pa.Table.from_arrays(
            [
                pa.array([f"d{i:012d}" for i in ids], type=pa.string()),
                pa.array(np.zeros(len(ids), dtype=np.int32)),
                batch.column("lang"),
                batch.column("source"),
                batch.column("n_chars"),
            ],
            names=["conv_id", "turn_idx", "lang", "source", "n_chars"],
        )

    build_metadata(
        ds.map_batches(to_meta, batch_format="pyarrow"),
        r.index_dir,
        {"lang": "keyword", "source": "keyword", "n_chars": "number"},
    )


def topk_table(
    r: RaySparseRetriever, queries: Dict[str, str], cutoff: int
) -> pa.Table:
    """(q_id, rank, doc_id) int64-exact, rank-only (float scores are
    engine-precision-specific; rank ties break by doc_id in both the
    engine kernel and the oracle's ORDER BY)."""
    out_q, out_r, out_d = [], [], []
    for q_id, text in queries.items():
        res = r.search(text, cutoff=cutoff)
        convs = [c for c, _ in res.keys()]
        docs = conv_to_doc_id(convs)
        out_q.extend([q_id] * len(docs))
        out_r.extend(range(1, len(docs) + 1))
        out_d.extend(docs.tolist())
    return pa.Table.from_arrays(
        [
            pa.array(out_q, type=pa.string()),
            pa.array(out_r, type=pa.int64()),
            pa.array(out_d, type=pa.int64()),
        ],
        names=["q_id", "rank", "doc_id"],
    )
