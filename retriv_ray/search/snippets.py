"""KWIC (keyword-in-context) snippet extraction for search results.

The classic results-page highlight: for each of a query's top-k docs,
the token window around the FIRST occurrence of any query term. The
reference has no highlighting; this follows the standard contract
(Lucene's ``SimpleFragmenter``-style fixed token window).

Distributed shape: the top-k sets are tiny (queries x cutoff rows),
so they broadcast as a plain dict inside the map closure and the doc
texts stream through ONE ``map_batches`` pass over the corpus — a
broadcast semi-join on (conv_id, turn_idx), no shuffle, no driver
loop over docs. (With a doc-store keyed by id the same function runs
as a point-lookup fetch; the scan form is the Dataset-native
equivalent and reads only the candidate check + tokenize per row.)

Window semantics (SQL-oracle-checked): ``first = min`` over the
query's vocabulary-filtered terms of the term's first token offset in
the doc; snippet = tokens[max(first-before, 0) : first+after+1]
joined by single spaces. Tokens are the retriever pipeline's output
(order-preserving), so with the SQL-comparable config they equal raw
whitespace tokens.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np
import pyarrow as pa


def kwic_snippets(
    retriever,
    docs_ds,
    queries: Dict[str, str],
    cutoff: int = 10,
    before: int = 2,
    after: int = 2,
) -> pa.Table:
    """Search each query, then stream ``docs_ds`` (conv_id, turn_idx,
    text) once to extract snippets for the hits. Returns (q_id, rank,
    conv_id, turn_idx, snippet) ordered by (q_id, rank)."""
    # 1) top-k per query (drop the reference's zero-score padding rows
    #    — a padding doc contains no query term, so it has no snippet)
    want: Dict[tuple, List[tuple]] = {}
    ranks: Dict[tuple, int] = {}
    terms_by_q: Dict[str, List[str]] = {}
    for q_id in sorted(queries):
        terms_by_q[q_id] = retriever.query_terms(queries[q_id])
        res = retriever.search(queries[q_id], cutoff=cutoff)
        rank = 0
        for (conv, turn), score in res.items():
            if score <= 0:
                continue
            rank += 1
            want.setdefault((conv, int(turn)), []).append((q_id, rank))
    if not want:
        return pa.table(
            {
                "q_id": pa.array([], type=pa.string()),
                "rank": pa.array([], type=pa.int64()),
                "conv_id": pa.array([], type=pa.string()),
                "turn_idx": pa.array([], type=pa.int32()),
                "snippet": pa.array([], type=pa.string()),
            }
        )

    tokenize = retriever.pre.tokens
    term_sets = {q: set(ts) for q, ts in terms_by_q.items()}

    def fn(batch: pa.Table) -> pa.Table:
        convs = batch.column("conv_id").to_pylist()
        turns = batch.column("turn_idx").to_pylist()
        texts = batch.column("text").to_pylist()
        out_q, out_r, out_c, out_t, out_s = [], [], [], [], []
        for conv, turn, text in zip(convs, turns, texts):
            hits = want.get((conv, int(turn)))
            if not hits:
                continue
            toks = tokenize(text or "")
            for q_id, rank in hits:
                ts = term_sets[q_id]
                first = next(
                    (i for i, t in enumerate(toks) if t in ts), None
                )
                if first is None:
                    continue
                s = max(first - before, 0)
                out_q.append(q_id)
                out_r.append(rank)
                out_c.append(conv)
                out_t.append(int(turn))
                out_s.append(" ".join(toks[s : first + after + 1]))
        return pa.Table.from_arrays(
            [
                pa.array(out_q, type=pa.string()),
                pa.array(out_r, type=pa.int64()),
                pa.array(out_c, type=pa.string()),
                pa.array(out_t, type=pa.int32()),
                pa.array(out_s, type=pa.string()),
            ],
            names=["q_id", "rank", "conv_id", "turn_idx", "snippet"],
        )

    t = _collect(docs_ds.map_batches(fn, batch_format="pyarrow"))
    order = np.lexsort(
        (t.column("rank").to_numpy(), np.asarray(t.column("q_id").to_pylist(), dtype=object))
    )
    return t.take(pa.array(order))


def _collect(ds) -> pa.Table:
    import ray

    batches = []
    for ref in ds.to_arrow_refs():
        tbl = ray.get(ref)
        if tbl.num_rows:
            batches.append(tbl)
    if not batches:
        return pa.table(
            {
                "q_id": pa.array([], type=pa.string()),
                "rank": pa.array([], type=pa.int64()),
                "conv_id": pa.array([], type=pa.string()),
                "turn_idx": pa.array([], type=pa.int32()),
                "snippet": pa.array([], type=pa.string()),
            }
        )
    return pa.concat_tables(batches)
