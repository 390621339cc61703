"""Prefix (wildcard ``pre*``) term queries via term-dictionary range
scans.

The terms table is hash-partitioned by term across parts and each
part file is SORTED by term (index.build._merge_part_terms), so a
prefix query brackets its matching run in every part with two
``np.searchsorted`` calls over the same 8-byte big-endian prefix
array :class:`retriv_ray.search.searcher.TermStats` uses for exact
probes — no part is ever scanned linearly. Expansion cost is
O(parts x log terms-per-part) + O(matches).

The expanded term set then routes through the ordinary part-routed
postings fetch; per-doc distinct-matching-term counts come from one
``np.unique`` over the concatenated ascending doc arrays ((term, doc)
pairs are globally unique, so multiplicity == distinct term count).

Scale notes: the expansion is bounded by the vocabulary (never the
corpus); a pathological one-letter prefix expands to many terms whose
postings fetches parallelize per part exactly like multi-term BM25
queries. For serving fleets the expansion happens inside each scorer
actor (TermStats is already resident there).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
import pyarrow as pa


def prefix_terms(term_stats, prefix: str, limit: int = 100_000) -> List[str]:
    """All vocabulary terms starting with ``prefix``, sorted; raises
    if the expansion exceeds ``limit`` (wildcard blow-up guard)."""
    if not prefix:
        raise ValueError("empty prefix")
    pb = prefix.encode("utf-8")
    lo_key = np.uint64(int.from_bytes(pb[:8].ljust(8, b"\0"), "big"))
    hi_key = np.uint64(int.from_bytes(pb[:8].ljust(8, b"\xff"), "big"))
    out: List[str] = []
    for p in range(term_stats.num_parts):
        entry = term_stats._part(p)
        if entry is None:
            continue
        arr, prefixes, off, data, _df = entry
        lo = int(np.searchsorted(prefixes, lo_key, side="left"))
        hi = int(np.searchsorted(prefixes, hi_key, side="right"))
        for i in range(lo, hi):
            s, e = int(off[i]), int(off[i + 1])
            raw = data[s:e].tobytes()
            # exact check needed only when the prefix exceeds the
            # 8-byte bracket resolution
            if raw.startswith(pb):
                out.append(raw.decode("utf-8"))
        if len(out) > limit:
            raise ValueError(
                f"prefix '{prefix}' expands past {limit} terms"
            )
    return sorted(out)


def complete(
    term_stats, prefix: str, k: int = 10, limit: int = 100_000
) -> List[Tuple[str, int]]:
    """Search-box autocomplete: the top-``k`` vocabulary completions
    of ``prefix`` by (df desc, term asc) as (term, df) pairs. Uses
    the same two-searchsorted bracket per sorted part as
    :func:`prefix_terms`, reading dfs from the part entry — no
    postings touched."""
    if not prefix:
        raise ValueError("empty prefix")
    pb = prefix.encode("utf-8")
    lo_key = np.uint64(int.from_bytes(pb[:8].ljust(8, b"\0"), "big"))
    hi_key = np.uint64(int.from_bytes(pb[:8].ljust(8, b"\xff"), "big"))
    out: List[Tuple[int, str]] = []
    n_seen = 0
    for p in range(term_stats.num_parts):
        entry = term_stats._part(p)
        if entry is None:
            continue
        _arr, prefixes, off, data, df = entry
        lo = int(np.searchsorted(prefixes, lo_key, side="left"))
        hi = int(np.searchsorted(prefixes, hi_key, side="right"))
        for i in range(lo, hi):
            s, e = int(off[i]), int(off[i + 1])
            raw = data[s:e].tobytes()
            if raw.startswith(pb):
                out.append((-int(df[i]), raw.decode("utf-8")))
                n_seen += 1
        if n_seen > limit:
            raise ValueError(
                f"prefix '{prefix}' expands past {limit} terms"
            )
    out.sort()
    return [(t, -negdf) for negdf, t in out[:k]]


def prefix_doc_counts(index, prefix: str) -> Tuple[np.ndarray, np.ndarray]:
    """(doc_ids asc, n_distinct_matching_terms) for every doc that
    contains at least one term starting with ``prefix``."""
    terms = prefix_terms(index.term_df, prefix)
    if not terms:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    docs = np.concatenate([index.get_postings(t)[0] for t in terms])
    uniq, counts = np.unique(docs, return_counts=True)
    return uniq.astype(np.int64), counts.astype(np.int64)


def prefix_search_table(retriever, queries: Dict[str, str]) -> pa.Table:
    """{q_id: prefix} -> (q_id, conv_id, turn_idx, n_terms) ordered by
    (q_id, internal doc_id)."""
    q_col: List[str] = []
    c_parts, t_parts, n_parts = [], [], []
    for q_id in sorted(queries):
        docs, n = prefix_doc_counts(retriever.index, queries[q_id])
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
