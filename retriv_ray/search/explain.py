"""Score explanation (Lucene ``explain``): the per-term breakdown of
a (query, document) BM25 score.

For each query term present in the document: its tf in the doc
(postings probe), its df (TermStats probe), and the quantized BM25
contribution ``floor(1e6 * idf * saturation)`` — the same
``ln(1 + (N-df+0.5)/(df+0.5))`` idf and ``tf*(k1+1)/(tf + k1*(1-b+
b*dl/avgdl))`` saturation the scoring kernel computes, quantized to
an integer so the SQL oracle hash-checks the values themselves (the
``tfidf_keywords`` convention: exact real-value ties land on the same
integer regardless of last-ulp libm differences).

Serving cost: O(|query terms|) postings probes for ONE document —
this is a debugging/trust surface, not a batch path; fleets run it
per-actor like any exact-probe lookup.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np
import pyarrow as pa


def explain(retriever, query: str, doc_id: int) -> pa.Table:
    """(term, tf, df, score_e6) rows, term-ascending, one per query
    term present in ``doc_id`` (internal id)."""
    cfg = retriever.cfg
    b, k1 = cfg.hyperparams["b"], cfg.hyperparams["k1"]
    idx = retriever.index
    n = float(idx.doc_count)
    rel_dl = float(idx.relative_doc_lens[doc_id])
    terms = sorted(set(retriever.query_terms(query)))
    t_col: List[str] = []
    tf_col: List[int] = []
    df_col: List[int] = []
    s_col: List[int] = []
    for t in terms:
        docs, tfs = idx.get_postings(t)
        pos = int(np.searchsorted(docs, doc_id))
        if pos >= len(docs) or docs[pos] != doc_id:
            continue
        tf = float(tfs[pos])
        df = float(idx.term_df[t])
        idf = np.log(1.0 + (n - df + 0.5) / (df + 0.5))
        satur = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * rel_dl))
        t_col.append(t)
        tf_col.append(int(tf))
        df_col.append(int(df))
        s_col.append(int(np.floor(1e6 * idf * satur)))
    return pa.Table.from_arrays(
        [
            pa.array(t_col, type=pa.string()),
            pa.array(np.asarray(tf_col, dtype=np.int64)),
            pa.array(np.asarray(df_col, dtype=np.int64)),
            pa.array(np.asarray(s_col, dtype=np.int64)),
        ],
        names=["term", "tf", "df", "score_e6"],
    )


def explain_queries(
    retriever, queries: Dict[str, str], cutoff: int = 1
) -> pa.Table:
    """Explain each query's top document: (q_id, doc_id, term, tf,
    df, score_e6) for the rank-1 hit (internal-id tie-break, same as
    the kernel)."""
    parts = []
    for q_id in sorted(queries):
        text = queries[q_id]
        terms = retriever.query_terms(text)
        if not terms:
            continue
        ids, _scores = retriever._score(terms, 1)
        if not len(ids):
            continue
        top = int(ids[0])
        t = explain(retriever, text, top)
        parts.append(
            pa.Table.from_arrays(
                [
                    pa.array([q_id] * t.num_rows, type=pa.string()),
                    pa.array(np.full(t.num_rows, top, dtype=np.int64)),
                    t.column("term"),
                    t.column("tf"),
                    t.column("df"),
                    t.column("score_e6"),
                ],
                names=["q_id", "doc_id", "term", "tf", "df", "score_e6"],
            )
        )
    if not parts:
        return pa.Table.from_arrays(
            [
                pa.array([], type=pa.string()),
                pa.array([], type=pa.int64()),
                pa.array([], type=pa.string()),
                pa.array([], type=pa.int64()),
                pa.array([], type=pa.int64()),
                pa.array([], type=pa.int64()),
            ],
            names=["q_id", "doc_id", "term", "tf", "df", "score_e6"],
        )
    return pa.concat_tables(parts)
