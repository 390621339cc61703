"""More-like-this: find documents similar to a source document.

Two serving-time steps, both against the already-built index (no
corpus pass):

1. Representative terms: the source text runs through the SAME
   preprocessing chain as indexing, then its tokens score
   ``tf * ln(N / df)`` with df probed from the lazy TermStats (terms
   outside the vocabulary drop, like query terms do). Scores are
   quantized to ``floor(1e4 * score)`` and the top ``top_terms`` pick
   by (score desc, term asc) — the exact contract of
   ``ops.textstats.tfidf_keywords``, so the selection is
   integer-deterministic and SQL-checkable.
2. The selected terms run as an ordinary disjunctive BM25 query; the
   source document is excluded from the hits.

Scale notes: cost is O(|doc tokens|) df probes + one multi-term BM25
query — the serving fleets run it per-actor exactly like any other
query; nothing touches the corpus.
"""

from __future__ import annotations

from collections import Counter
from typing import List, Optional, Tuple

import numpy as np
import pyarrow as pa


def mlt_terms(
    retriever, doc_text: str, top_terms: int = 5
) -> List[str]:
    """Top ``top_terms`` vocabulary terms of ``doc_text`` by quantized
    TF-IDF (ties: term asc)."""
    toks = retriever.pre.tokens(doc_text)
    stats = retriever.index.term_df
    n = float(retriever.index.doc_count)
    tf = Counter(t for t in toks if t in stats)
    scored: List[Tuple[int, str]] = []
    for t, f in tf.items():
        w = int(np.floor(1e4 * f * np.log(n / float(stats[t]))))
        scored.append((-w, t))
    scored.sort()
    return [t for _w, t in scored[:top_terms]]


def more_like_this(
    retriever,
    doc_text: str,
    exclude_doc: Optional[int] = None,
    top_terms: int = 5,
    cutoff: int = 10,
) -> pa.Table:
    """(rank, conv_id, turn_idx, doc_id) — BM25 top-``cutoff`` over
    the source's representative terms, with the source doc (internal
    id ``exclude_doc``) removed from the hits."""
    terms = mlt_terms(retriever, doc_text, top_terms)
    if not terms:
        ids = np.empty(0, dtype=np.int64)
    else:
        ids, _scores = retriever._score(
            terms, cutoff + (1 if exclude_doc is not None else 0)
        )
    if exclude_doc is not None:
        ids = ids[ids != exclude_doc]
    ids = ids[:cutoff]
    convs, turns = retriever.index.to_original_ids(ids)
    return pa.Table.from_arrays(
        [
            pa.array(np.arange(1, len(ids) + 1, dtype=np.int64)),
            pa.array(convs, type=pa.string()),
            pa.array(turns.astype(np.int32), type=pa.int32()),
            pa.array(ids, type=pa.int64()),
        ],
        names=["rank", "conv_id", "turn_idx", "doc_id"],
    )
