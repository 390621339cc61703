"""Percolation — reverse search (the Elasticsearch percolator):
REGISTERED queries run against a STREAM of documents, emitting
(doc, query) matches. Where ordinary retrieval routes a query to
posting lists, percolation routes each new document through the query
set — the push-notification / alerting / saved-search primitive.

Query shape is the boolean must/should/must_not dict of
``search/boolean.py`` with identical match semantics per document:
every ``must`` term present; if ``must`` is empty, at least one
``should`` term present; no ``must_not`` term present. Terms run
through the same preprocessing pipeline as indexing, so the matching
vocabulary is exactly the indexed one.

Ray-Data shape: a ZERO-SHUFFLE streaming ``map_batches`` over the
document Dataset. Per batch the text column is tokenized once
(vectorized pipeline), tokens are filtered to the union of all query
terms with one Arrow ``is_in`` + ``index_in`` pass, and a
(num_query_terms x batch_docs) presence matrix drives every query's
must/should/must_not logic as numpy boolean algebra — per-batch cost
is O(tokens + terms x docs + queries), no Python loop over rows. The
compiled query set travels as a (small) task closure; for very large
registered-query sets move the compile into a callable-class actor
pool (``map_batches(Cls, concurrency=N)``) so it is built once per
worker — the matrix algebra is unchanged.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


_WORKER_PIPELINES: Dict[str, object] = {}


def _compile(queries: Dict[str, dict], pre) -> tuple:
    """(sorted unique term list, per-query (must, should, must_not)
    code arrays) with every term preprocessed."""
    specs = {}
    vocab: List[str] = []
    seen = {}

    def codes(phrases: Sequence[str]) -> np.ndarray:
        toks: List[str] = []
        for p in phrases:
            toks.extend(pre(p))
        out = []
        for t in dict.fromkeys(toks):
            if t not in seen:
                seen[t] = len(vocab)
                vocab.append(t)
            out.append(seen[t])
        return np.asarray(out, dtype=np.int64)

    for q_id, spec in queries.items():
        specs[q_id] = (
            codes(spec.get("must", ())),
            codes(spec.get("should", ())),
            codes(spec.get("must_not", ())),
        )
    return vocab, specs


def percolate(
    docs_ds,
    queries: Dict[str, dict],
    cfg=None,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Match every registered query against every document; returns a
    Dataset of (id_col, q_id) rows ordered within each batch by
    (doc, q_id). ``cfg`` is a SparseConfig (defaults to the oracle
    whitespace chain) controlling tokenization."""
    from retriv_ray.config import SparseConfig
    from retriv_ray.text.pipeline import TextPreprocessor

    cfg = cfg or SparseConfig(
        tokenizer="whitespace", stemmer=None, stopwords=None
    )
    cfg_json = cfg.to_json()
    probe = TextPreprocessor(SparseConfig.from_json(cfg_json))
    vocab, specs = _compile(queries, probe.tokens)
    vocab_arr = pa.array(vocab, type=pa.string())
    q_ids = sorted(specs)

    def match(batch: pa.Table) -> pa.Table:
        # once-per-worker pipeline (module-level memo, fuzzy.py pattern)
        key = str(sorted(cfg_json.items()))
        tp = _WORKER_PIPELINES.get(key)
        if tp is None:
            tp = TextPreprocessor(SparseConfig.from_json(cfg_json))
            _WORKER_PIPELINES[key] = tp
        texts = [
            t or "" for t in batch.column(text_col).to_pylist()
        ]
        tok_lists = tp.tokens_many(texts)
        n_docs = batch.num_rows
        lens = np.fromiter(
            (len(t) for t in tok_lists), dtype=np.int64, count=n_docs
        )
        flat = pa.array(
            [t for toks in tok_lists for t in toks], type=pa.string()
        )
        parent = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
        code = pc.index_in(flat, value_set=vocab_arr)
        hit = pc.is_valid(code).to_numpy(zero_copy_only=False)
        present = np.zeros((len(vocab), n_docs), dtype=bool)
        if hit.any():
            present[
                code.to_numpy(zero_copy_only=False)[hit].astype(np.int64),
                parent[hit],
            ] = True
        out_docs: List[np.ndarray] = []
        out_qs: List[str] = []
        ids_np = batch.column(id_col).to_numpy(zero_copy_only=False)
        for q_id in q_ids:
            must, should, must_not = specs[q_id]
            if len(must):
                ok = present[must].all(axis=0)
            elif len(should):
                ok = present[should].any(axis=0)
            else:
                ok = np.zeros(n_docs, dtype=bool)
            if len(must_not):
                ok &= ~present[must_not].any(axis=0)
            m = np.flatnonzero(ok)
            out_docs.append(ids_np[m])
            out_qs.extend([q_id] * len(m))
        docs_col = (
            np.concatenate(out_docs) if out_docs else np.empty(0, np.int64)
        )
        tbl = pa.Table.from_arrays(
            [
                pa.array(docs_col),
                pa.array(np.asarray(out_qs, dtype=object), type=pa.string()),
            ],
            names=[id_col, "q_id"],
        )
        return tbl.sort_by([(id_col, "ascending"), ("q_id", "ascending")])

    return docs_ds.map_batches(match, batch_format="pyarrow")
