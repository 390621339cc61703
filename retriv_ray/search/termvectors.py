"""Per-document term vectors (Elasticsearch ``_termvectors``): for a
subset of documents, the terms the index holds for each one with the
per-document term frequency and the corpus document frequency — the
introspection surface behind relevance debugging, keyword extraction
and MLT-style similarity (the reference exposes the same statistics
only internally, as the CSR matrix built in
reference build_inverted_index.py:35-55).

Runs as a streaming Dataset op over transcript-shaped rows
(conv_id, turn_idx, text): a stateful actor pool tokenizes each batch
with the index's exact text pipeline (``TextPreprocessor.tokens_many``
— one vectorized call per batch, built once per actor) and counts
per-row term frequencies with one dictionary-encode + lexsort +
run-length pass (no Python loop over tokens). Document frequencies
come from the index's lazy ``TermStats`` (per-actor handle; only the
hash parts a batch's terms live in are ever resident — the same
no-whole-vocabulary rule serving follows). Terms the index pruned
(min_df) or never held return no row, matching ES, which reports
index statistics only for indexed terms.

Scale notes: output is one row per (doc, distinct term) of the
REQUESTED subset only — the op never touches the inverted index's
posting lists, so cost is O(subset tokens), not O(corpus).
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np
import pyarrow as pa


class _TermVecFn:
    """Actor-pool stage: pipeline + TermStats built once per actor."""

    def __init__(self, cfg_json: str, terms_dir: str, num_parts: int):
        from retriv_ray.config import SparseConfig
        from retriv_ray.search.searcher import TermStats
        from retriv_ray.text.pipeline import TextPreprocessor

        self.pre = TextPreprocessor(SparseConfig.from_json(cfg_json))
        self.term_df = TermStats(terms_dir, num_parts)

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks = self.pre.tokens_many(
            batch.column("text").to_pylist()
        )
        counts = np.fromiter(
            (len(t) for t in toks), dtype=np.int64, count=len(toks)
        )
        flat = pa.array(
            [t for row in toks for t in row], type=pa.string()
        )
        parent = np.repeat(np.arange(len(toks), dtype=np.int64), counts)
        if not len(parent):
            return pa.Table.from_arrays(
                [
                    pa.array([], type=pa.string()),
                    pa.array([], type=pa.int32()),
                    pa.array([], type=pa.string()),
                    pa.array([], type=pa.int64()),
                    pa.array([], type=pa.int64()),
                ],
                names=["conv_id", "turn_idx", "term", "tf", "df"],
            )
        # tf per (row, term): dictionary-encode the tokens, lexsort by
        # (row, code), run-length count — one vectorized pass
        dexp = flat.dictionary_encode()
        codes = dexp.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = dexp.dictionary
        order = np.lexsort((codes, parent))
        sp, sc = parent[order], codes[order]
        new = np.concatenate(
            ([True], (sp[1:] != sp[:-1]) | (sc[1:] != sc[:-1]))
        )
        starts = np.flatnonzero(new)
        tf = np.diff(np.append(starts, len(sp))).astype(np.int64)
        rows, terms_c = sp[starts], sc[starts]
        # df probe per DISTINCT term in the batch (memoized per actor)
        uniq = vocab.to_pylist()
        dfs = np.fromiter(
            (self.term_df.get(t) or 0 for t in uniq),
            dtype=np.int64,
            count=len(uniq),
        )
        df = dfs[terms_c]
        keep = df > 0  # unindexed (pruned) terms report nothing, as ES does
        rows, terms_c, tf, df = rows[keep], terms_c[keep], tf[keep], df[keep]
        term_arr = pa.array(
            [uniq[c] for c in terms_c], type=pa.string()
        )
        return pa.Table.from_arrays(
            [
                batch.column("conv_id").take(pa.array(rows)),
                batch.column("turn_idx").take(pa.array(rows)),
                term_arr,
                pa.array(tf),
                pa.array(df),
            ],
            names=["conv_id", "turn_idx", "term", "tf", "df"],
        )


def term_vectors_ds(
    retriever,
    docs_ds,
    concurrency: int = 4,
    batch_size: int = 4096,
):
    """Dataset of (conv_id, turn_idx, text) -> Dataset of
    (conv_id, turn_idx, term, tf, df), streaming. ``concurrency``
    sizes the actor pool (pipeline + TermStats built once per
    actor)."""
    import os

    terms_dir = os.path.join(retriever.index_dir, "terms")
    return docs_ds.map_batches(
        _TermVecFn,
        fn_constructor_args=(
            retriever.cfg.to_json(),
            terms_dir,
            retriever.index.num_parts,
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
