"""Regex term queries (Lucene ``RegexpQuery``): match the whole
vocabulary against an RE2 pattern, then count per-doc distinct
matching terms like prefix queries do.

The scan is vectorized per term-dictionary part —
``pc.match_substring_regex`` (RE2) over the part's resident Arrow
string array, anchored to a full match — so the regex engine AND its
dialect are identical to DuckDB's (both RE2), which is what makes the
SQL oracle (``regexp_full_match``) byte-comparable. No per-term
Python loop, no decode of non-matching terms.

Scale notes: vocabulary-bounded like prefix/fuzzy expansion — each
part scans independently (parallel inside serving actors where
TermStats is resident); the expansion cap fails loudly. Patterns
without a literal prefix can't use the sorted-prefix bracket, so this
is the general fallback behind `search/prefix.py`'s O(log) scans.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def regex_terms(
    term_stats, pattern: str, limit: int = 10_000
) -> List[str]:
    """All vocabulary terms fully matching the RE2 ``pattern``,
    sorted; raises past ``limit`` matches."""
    if not pattern:
        raise ValueError("empty pattern")
    anchored = f"^(?:{pattern})$"
    out: List[str] = []
    for p in range(term_stats.num_parts):
        entry = term_stats._part(p)
        if entry is None:
            continue
        arr = entry[0]
        mask = pc.match_substring_regex(arr, anchored)
        out.extend(arr.filter(mask).to_pylist())
        if len(out) > limit:
            raise ValueError(
                f"regex '{pattern}' expands past {limit} terms"
            )
    return sorted(out)


def regex_doc_counts(index, pattern: str) -> Tuple[np.ndarray, np.ndarray]:
    """(doc_ids asc, n_distinct_matching_terms) for docs containing at
    least one term matching ``pattern`` — (term, doc) pairs are
    globally unique, so concat+unique multiplicity == distinct term
    count (same argument as prefix_doc_counts)."""
    terms = regex_terms(index.term_df, pattern)
    if not terms:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    docs = np.concatenate([index.get_postings(t)[0] for t in terms])
    uniq, counts = np.unique(docs, return_counts=True)
    return uniq.astype(np.int64), counts.astype(np.int64)


def regex_search_table(retriever, queries: Dict[str, str]) -> pa.Table:
    """{q_id: pattern} -> (q_id, conv_id, turn_idx, n_terms) ordered
    by (q_id, internal doc_id)."""
    q_col: List[str] = []
    c_parts, t_parts, n_parts = [], [], []
    for q_id in sorted(queries):
        docs, n = regex_doc_counts(retriever.index, queries[q_id])
        convs, turns = retriever.index.to_original_ids(docs)
        q_col.extend([q_id] * len(docs))
        c_parts.append(np.asarray(convs, dtype=object))
        t_parts.append(turns)
        n_parts.append(n)
    convs = np.concatenate(c_parts) if c_parts else np.empty(0, dtype=object)
    turns = np.concatenate(t_parts) if t_parts else np.empty(0, dtype=np.int32)
    ns = np.concatenate(n_parts) if n_parts else np.empty(0, dtype=np.int64)
    return pa.Table.from_arrays(
        [
            pa.array(q_col, type=pa.string()),
            pa.array(convs, type=pa.string()),
            pa.array(turns.astype(np.int32), type=pa.int32()),
            pa.array(ns, type=pa.int64()),
        ],
        names=["q_id", "conv_id", "turn_idx", "n_terms"],
    )
