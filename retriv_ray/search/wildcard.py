"""Wildcard term queries (Lucene ``WildcardQuery`` / the ES
``wildcard`` field type): ``*`` matches any run, ``?`` one character,
the pattern must cover the WHOLE term. The reference has no wildcard
surface (its dictionary is a Python dict); this is the
beyond-reference analogue of `search/regex.py` with the acceleration
Lucene's wildcard field and PostgreSQL ``pg_trgm`` use — a trigram
index over the vocabulary:

  build (once, lazy, cached on TermStats like the fuzzy scan view):
    every UTF-8 BYTE 3-gram of every term -> CSR posting lists of
    term ids, extracted VECTORIZED from the fuzzy byte matrix (one
    uint32 pack per column offset, one np.unique — no per-term loop).
  query: the pattern's literal runs >= 3 bytes yield required
    trigrams; candidates = intersection of their posting lists
    (smallest-first); candidates are then verified with the same RE2
    engine the regex path uses. Patterns with no 3-byte literal run
    fall back to the full-vocabulary RE2 scan (correct, just not
    accelerated — same cost as `regex_search`).

Byte-level trigrams are safe for UTF-8: a contiguous byte match of a
valid UTF-8 needle inside valid UTF-8 text always lands on character
boundaries (lead bytes never occur as continuation bytes), and the
RE2 verify step re-checks every candidate anyway.

Scale notes: vocabulary-bounded like prefix/fuzzy/regex expansion —
the trigram CSR costs ~(total term bytes) x 12 B per serving actor
and is built per resident TermStats, never shipped; candidate
intersection is a few np.intersect1d calls over short sorted lists;
postings fetches for the matched terms then parallelize per part
like any multi-term query. Doc counts follow prefix/regex: (term,
doc) pairs are globally unique, so concat+unique multiplicity ==
distinct matching-term count.
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def wildcard_to_re2(pattern: str) -> str:
    """Translate a ``*``/``?`` wildcard into an unanchored RE2 body
    (`regex_terms` anchors it): literals escaped, ``*`` -> ``.*``,
    ``?`` -> ``.`` (one code point, same as SQL ``LIKE``'s ``_``)."""
    out: List[str] = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "".join(out)


def wildcard_to_like(pattern: str) -> str:
    """The same pattern as a SQL ``LIKE`` pattern with ``!`` escape
    (``LIKE ... ESCAPE '!'``) — used by the driver oracle."""
    out: List[str] = []
    for ch in pattern:
        if ch == "*":
            out.append("%")
        elif ch == "?":
            out.append("_")
        elif ch in ("%", "_", "!"):
            out.append("!" + ch)
        else:
            out.append(ch)
    return "".join(out)


def _trigram_codes(data: bytes) -> np.ndarray:
    """Unique uint32-packed byte trigrams of ``data``."""
    b = np.frombuffer(data, dtype=np.uint8).astype(np.uint32)
    if len(b) < 3:
        return np.empty(0, dtype=np.uint32)
    codes = (b[:-2] << 16) | (b[1:-1] << 8) | b[2:]
    return np.unique(codes)


def _trigram_index(term_stats) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(sorted unique trigram codes, CSR starts, term ids) over the
    whole vocabulary, cached on the TermStats instance. Term ids
    index the fuzzy scan view's global concatenation (parts in
    order), which is also how candidates are decoded back to strings.
    """
    cached = getattr(term_stats, "_trigram_index", None)
    if cached is not None:
        return cached
    from retriv_ray.search.fuzzy import _scan_view

    lens_s, matT, _off, _data, _dfs, order = _scan_view(term_stats)
    pair_codes, pair_tids = [], []
    u32 = matT.astype(np.uint32)  # (maxlen, vocab), length-sorted rows
    n = matT.shape[1]
    for j in range(max(0, matT.shape[0] - 2)):
        # length-sorted: rows with len >= j+3 are a contiguous suffix
        s = int(np.searchsorted(lens_s, j + 3, side="left"))
        if s >= n:
            break
        codes = (u32[j, s:] << 16) | (u32[j + 1, s:] << 8) | u32[j + 2, s:]
        pair_codes.append(codes)
        pair_tids.append(order[s:])
    if not pair_codes:
        idx = (
            np.empty(0, dtype=np.uint32),
            np.zeros(1, dtype=np.int64),
            np.empty(0, dtype=np.int64),
        )
        term_stats._trigram_index = idx
        return idx
    # dedupe (code, term) pairs and sort by code then term id
    key = np.concatenate(pair_codes).astype(np.uint64) << np.uint64(32)
    key |= np.concatenate(pair_tids).astype(np.uint64)
    key = np.unique(key)
    codes = (key >> np.uint64(32)).astype(np.uint32)
    tids = (key & np.uint64(0xFFFFFFFF)).astype(np.int64)
    ucodes, starts = np.unique(codes, return_index=True)
    starts = np.concatenate((starts, [len(codes)])).astype(np.int64)
    idx = (ucodes, starts, tids)
    term_stats._trigram_index = idx
    return idx


def _decode_terms(term_stats, tids: np.ndarray) -> List[str]:
    from retriv_ray.search.fuzzy import _scan_view

    _lens, _matT, off, data, _dfs, _order = _scan_view(term_stats)
    return [
        data[off[t] : off[t + 1]].tobytes().decode("utf-8") for t in tids
    ]


def wildcard_terms(
    term_stats, pattern: str, limit: int = 10_000
) -> List[str]:
    """All vocabulary terms matching the wildcard ``pattern``
    (whole-term semantics), sorted; raises past ``limit``."""
    if not pattern:
        raise ValueError("empty pattern")
    body = wildcard_to_re2(pattern)
    runs = [r.encode("utf-8") for r in re.split(r"[*?]", pattern)]
    req = [c for r in runs if len(r) >= 3 for c in _trigram_codes(r)]
    if not req:
        # no 3-byte literal run: full-vocabulary RE2 scan
        from retriv_ray.search.regex import regex_terms

        return regex_terms(term_stats, body, limit)
    ucodes, starts, tids = _trigram_index(term_stats)
    req_codes = np.unique(np.asarray(req, dtype=np.uint32))
    pos = np.searchsorted(ucodes, req_codes)
    if np.any(pos >= len(ucodes)) or np.any(ucodes[pos] != req_codes):
        return []  # some required trigram absent from the vocabulary
    lists = sorted(
        (tids[starts[p] : starts[p + 1]] for p in pos), key=len
    )
    cand = lists[0]
    for other in lists[1:]:
        if len(cand) == 0:
            return []
        cand = cand[np.isin(cand, other, assume_unique=True)]
    if len(cand) > limit:
        raise ValueError(f"wildcard '{pattern}' expands past {limit} terms")
    cand_terms = pa.array(_decode_terms(term_stats, cand), type=pa.string())
    mask = pc.match_substring_regex(cand_terms, f"^(?:{body})$")
    return sorted(cand_terms.filter(mask).to_pylist())


def wildcard_doc_counts(index, pattern: str) -> Tuple[np.ndarray, np.ndarray]:
    """(doc_ids asc, n_distinct_matching_terms) — prefix/regex shape."""
    terms = wildcard_terms(index.term_df, pattern)
    if not terms:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    docs = np.concatenate([index.get_postings(t)[0] for t in terms])
    uniq, counts = np.unique(docs, return_counts=True)
    return uniq.astype(np.int64), counts.astype(np.int64)


def wildcard_search_table(retriever, queries: Dict[str, str]) -> pa.Table:
    """{q_id: pattern} -> (q_id, conv_id, turn_idx, n_terms) ordered
    by (q_id, internal doc_id)."""
    q_col: List[str] = []
    c_parts, t_parts, n_parts = [], [], []
    for q_id in sorted(queries):
        docs, n = wildcard_doc_counts(retriever.index, queries[q_id])
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
