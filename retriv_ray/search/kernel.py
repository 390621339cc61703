"""Scoring kernels — rank/score-identical to the reference numba code.

Reference files:
- retriv/sparse_retriever/sparse_retrieval_models/bm25.py:16-59
- retriv/sparse_retriever/sparse_retrieval_models/tf_idf.py:16-57
- retriv/utils/numba_utils.py (union/intersect/diff/unsorted_top_k)

Parity notes (each deliberate):
- Accumulation: per query-term, IN QUERY-TERM ORDER, into a float32
  scores array; the per-term contribution is computed in float64
  (python-float hyperparams promote) then truncated on the fancy-index
  ``+=`` store — the same IEEE op sequence as the numba kernel, so
  scores match bit-for-bit.
- ``idf`` is pre-cast to float32 exactly like ``bm25.py:43-44``.
- ``unsorted_top_k`` (numba_utils.py:143-158) zero-initializes its
  heap and admits values with strict ``>``, so only docs with score
  > 0 can enter the cutoff; when fewer than k positive docs exist the
  remaining slots stay (index 0, 0.0) — replicated, including the
  resulting padding rows.
- Boundary ties: the reference's replace-min loop keeps an
  unspecified member of a tied boundary group (and final
  ``np.argsort(-scores)`` is unstable, bm25.py:57). We make both
  deterministic: boundary ties keep the lowest candidate position and
  final order is (-score, doc_id). Reference tests assert score
  values only (tests/sparse_retriever/search_engine_test.py:34-111),
  so this is conformant; documented as the one tie-order deviation.
- ``score_dtype="float64"`` switches the whole accumulation to
  float64 — used for SQL-oracle comparison (DuckDB computes in
  float64), never for reference parity.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np


# Sorted-set ops (reference numba_utils.py:6-118). Inputs/outputs are
# ascending unique int arrays; numpy set routines have identical
# semantics to the reference's merge loops.
def union_sorted(a1: np.ndarray, a2: np.ndarray) -> np.ndarray:
    return np.union1d(a1, a2)


def union_sorted_multi(arrays: Sequence[np.ndarray]) -> np.ndarray:
    if len(arrays) == 1:
        return arrays[0]
    out = np.unique(np.concatenate(arrays))
    return out.astype(arrays[0].dtype, copy=False)


def intersect_sorted(a1: np.ndarray, a2: np.ndarray) -> np.ndarray:
    return np.intersect1d(a1, a2, assume_unique=True)


def intersect_sorted_multi(arrays: Sequence[np.ndarray]) -> np.ndarray:
    a = arrays[0]
    for other in arrays[1:]:
        a = np.intersect1d(a, other, assume_unique=True)
    return a


def diff_sorted(a1: np.ndarray, a2: np.ndarray) -> np.ndarray:
    return np.setdiff1d(a1, a2, assume_unique=True)


def concat1d(arrays: Sequence[np.ndarray]) -> np.ndarray:
    return np.concatenate(arrays)


def unsorted_top_k(array: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
    """Vectorized equivalent of reference numba_utils.py:143-158.

    Returns (values, indices) of the k largest STRICTLY-POSITIVE
    entries; short groups are padded with (0.0, index 0) exactly like
    the reference's zero-initialized heap. Boundary ties keep the
    earliest index (the reference keeps an unspecified member; see
    module docstring).
    """
    pos = np.flatnonzero(array > 0)
    if len(pos) >= k:
        vals = array[pos]
        # O(n) selection instead of argsort: find the k-th largest
        # value, keep everything above it plus the earliest-index
        # members of the boundary-tie group (pos is ascending, so
        # slicing keeps lowest positions — the documented tie rule).
        kth = np.partition(vals, len(vals) - k)[len(vals) - k]
        above = vals > kth
        n_above = int(above.sum())
        sel_above = pos[above]
        sel_eq = pos[vals == kth][: k - n_above]
        sel = np.concatenate([sel_above, sel_eq])
        return array[sel], sel.astype(np.int64)
    values = np.zeros(k, dtype=array.dtype)
    indices = np.zeros(k, dtype=np.int64)
    n = len(pos)
    values[:n] = array[pos]
    indices[:n] = pos
    return values, indices


def _candidates(
    doc_ids: Sequence[np.ndarray],
    operator: str,
    subset_doc_ids: Optional[np.ndarray],
    doc_count: int = 0,
    scratch: Optional[dict] = None,
) -> np.ndarray:
    if operator == "AND":
        unique = intersect_sorted_multi(doc_ids)
    elif operator == "OR":
        # Exact union of sorted unique id lists. A presence bitmap is
        # O(doc_count + total_postings) and beats sort-based
        # np.union1d by ~10x on hot-term queries; falls back to the
        # sort path when the id space is unknown/huge relative to the
        # posting mass (per-shard serving at 10^12 docs).
        total = sum(len(a) for a in doc_ids)
        if doc_count and doc_count <= 64 * max(total, 1):
            seen = _scratch_get(scratch, "seen", doc_count, bool)
            for a in doc_ids:
                seen[a] = True
            unique = np.flatnonzero(seen).astype(doc_ids[0].dtype, copy=False)
            if scratch is not None:
                seen[unique] = False  # targeted reset for reuse
        else:
            unique = union_sorted_multi(doc_ids)
    else:
        raise ValueError(f"operator must be AND or OR, got {operator!r}")
    if subset_doc_ids is not None:
        unique = np.intersect1d(unique, subset_doc_ids, assume_unique=True)
    return unique


def _drop_ranges(
    unique: np.ndarray, exclude_ranges: Tuple[np.ndarray, np.ndarray]
) -> np.ndarray:
    """Remove ids falling in sorted [start, end) ranges (tombstones)."""
    starts, ends = exclude_ranges
    if not len(starts) or not len(unique):
        return unique
    idx = np.searchsorted(starts, unique, side="right") - 1
    dele = (idx >= 0) & (unique < ends[np.maximum(idx, 0)])
    return unique[~dele]


def _scratch_get(scratch: Optional[dict], key: str, n: int, dtype) -> np.ndarray:
    """Fetch-or-create a reusable zeroed buffer. Per-query
    ``np.zeros`` page-faulting dominates under concurrency on
    VM-backed memory; reusing buffers and resetting only touched
    entries removes that wall. Callers must reset what they touch."""
    if scratch is None:
        return np.zeros(n, dtype=dtype)
    buf = scratch.get(key)
    if buf is None or len(buf) < n or buf.dtype != np.dtype(dtype):
        buf = np.zeros(n, dtype=dtype)
        scratch[key] = buf
    return buf[:n]


def _finalize(
    unique_doc_ids: np.ndarray, scores: np.ndarray, cutoff: int
) -> Tuple[np.ndarray, np.ndarray]:
    scores = scores[unique_doc_ids]
    if cutoff < len(scores):
        scores, idx = unsorted_top_k(scores, cutoff)
        unique_doc_ids = unique_doc_ids[idx]
    # deterministic (-score, doc_id); reference uses unstable
    # argsort(-scores) (bm25.py:57).
    order = np.lexsort((unique_doc_ids, -scores))
    return unique_doc_ids[order], scores[order]


def bm25_term_contrib(
    b: float,
    k1: float,
    freqs: np.ndarray,
    indices: np.ndarray,
    relative_doc_lens: np.ndarray,
    doc_count: int,
    dtype=np.float32,
    df: Optional[int] = None,
) -> np.ndarray:
    """One term's float64 score-contribution vector (aligned with
    ``indices``). Query-independent for fixed (b, k1), so callers may
    cache it per term — scatter-adding the cached vector is the same
    IEEE op sequence as recomputing it inline.

    Explicit float64 intermediates: the reference numba kernel
    (bm25.py:43-49) promotes float64-scalar * float32-array to a
    float64 array, while numpy's legacy value-based casting would keep
    it float32 — a 1-ulp divergence. The float64 result truncates to
    the score dtype on the fancy-index store in :func:`bm25`.

    ``df`` overrides the document frequency for PARTIAL posting
    slices (block-max pruned path) — idf must always come from the
    full posting length.
    """
    df = dtype(len(indices) if df is None else df)
    idf = dtype(np.log(1.0 + (((doc_count - df) + 0.5) / (df + 0.5))))
    rel64 = relative_doc_lens[indices].astype(np.float64)
    return idf * ((freqs * (k1 + 1.0)) / (freqs + k1 * (1.0 - b + (b * rel64))))


def bm25(
    b: float,
    k1: float,
    term_doc_freqs: Sequence[np.ndarray],
    doc_ids: Sequence[np.ndarray],
    relative_doc_lens: np.ndarray,
    doc_count: int,
    cutoff: int,
    operator: str = "OR",
    subset_doc_ids: Optional[np.ndarray] = None,
    dtype=np.float32,
    contribs: Optional[Sequence[np.ndarray]] = None,
    scratch: Optional[dict] = None,
    exclude_ranges: Optional[Tuple[np.ndarray, np.ndarray]] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """reference bm25.py:16-59. ``relative_doc_lens`` must be the
    float32 full-corpus array (doc_lens / float32-mean).
    ``contribs``: optional pre-computed per-term contribution vectors
    (see :func:`bm25_term_contrib`) — score-identical fast path.
    ``scratch``: optional reusable-buffer dict (see _scratch_get).
    ``exclude_ranges``: optional (starts, ends) sorted doc-id ranges
    (tombstoned deletions) — dropped from the candidate set, and their
    score entries zeroed for scratch-buffer hygiene."""
    # fast OR path: contributions are strictly positive, so after the
    # scatter-add the candidate union IS {scores > 0} — top-k can come
    # straight off the score buffer with no candidate bitmap, no
    # flatnonzero-over-bools and no scores[unique] gather. Selection
    # and tie semantics are identical to _candidates+_finalize (pos is
    # ascending like unique; same partition/kth/earliest-index rule).
    # Gated on the same bitmap heuristic: scanning doc_count floats
    # must stay proportional to the posting mass (per-shard serving at
    # 10^12 docs falls back to the sorted-union path).
    fast_or = (
        operator == "OR"
        and subset_doc_ids is None
        and exclude_ranges is None
        and doc_count
        and doc_count <= 64 * max(sum(len(a) for a in doc_ids), 1)
    )
    if not fast_or:
        unique = _candidates(
            doc_ids, operator, subset_doc_ids, doc_count, scratch
        )
        if exclude_ranges is not None:
            unique = _drop_ranges(unique, exclude_ranges)
    scores = _scratch_get(scratch, "scores_" + np.dtype(dtype).name, doc_count, dtype)
    for i in range(len(term_doc_freqs)):
        indices = doc_ids[i]
        contrib = (
            contribs[i]
            if contribs is not None
            else bm25_term_contrib(
                b, k1, term_doc_freqs[i], indices, relative_doc_lens,
                doc_count, dtype,
            )
        )
        scores[indices] += contrib
    if exclude_ranges is not None:
        for s, e in zip(*exclude_ranges):
            scores[s:e] = 0
    if fast_or:
        pos = np.flatnonzero(scores > 0)
        vals = scores[pos]
        if cutoff < len(pos):
            kth = np.partition(vals, len(vals) - cutoff)[len(vals) - cutoff]
            above = vals > kth
            n_above = int(above.sum())
            sel = np.concatenate(
                [pos[above], pos[vals == kth][: cutoff - n_above]]
            )
            vals = scores[sel]
        else:
            sel = pos
        order = np.lexsort((sel, -vals))
        out = (sel[order], vals[order])
        if scratch is not None:
            scores[pos] = 0
        return out
    out = _finalize(unique, scores, cutoff)
    if scratch is not None:
        _reset_scores(scores, unique, doc_ids, operator, subset_doc_ids)
    return out


def _reset_scores(scores, unique, doc_ids, operator, subset) -> None:
    """Zero exactly the entries the scatter touched (buffer reuse).
    Under OR with no subset, ``unique`` IS the touched set (one
    pass); otherwise touched = every posting index."""
    if operator == "OR" and subset is None:
        scores[unique] = 0
    else:
        for indices in doc_ids:
            scores[indices] = 0


def tf_idf_term_contrib(
    freqs: np.ndarray,
    indices: np.ndarray,
    doc_lens: np.ndarray,
    dtype=np.float32,
    df: Optional[int] = None,
    doc_count: Optional[int] = None,
) -> np.ndarray:
    """One term's TF-IDF contribution vector (cacheable per term).

    Cast to the score dtype BEFORE dividing: the reference divides
    int16 tfs by float32 doc_lens which numba/numpy keep in float32;
    our int32 tfs would promote to float64 and break bit parity (tf
    counts are exactly representable in float32).

    ``df``/``doc_count`` override the posting length / corpus size for
    shard-sliced postings (per-doc-shard serving) — idf must always
    come from the GLOBAL statistics."""
    if doc_count is None:
        doc_count = len(doc_lens)
    dl = doc_lens if dtype == np.float32 else doc_lens.astype(np.float64)
    tf = freqs.astype(dtype) / dl[indices]
    df = dtype(len(indices) if df is None else df)
    idf = dtype(np.log((1.0 + doc_count) / (1.0 + df)) + 1.0)
    return tf * idf


def tf_idf(
    term_doc_freqs: Sequence[np.ndarray],
    doc_ids: Sequence[np.ndarray],
    doc_lens: np.ndarray,
    cutoff: int,
    operator: str = "OR",
    subset_doc_ids: Optional[np.ndarray] = None,
    dtype=np.float32,
    contribs: Optional[Sequence[np.ndarray]] = None,
    scratch: Optional[dict] = None,
    exclude_ranges: Optional[Tuple[np.ndarray, np.ndarray]] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """reference tf_idf.py:16-57. ``doc_lens`` is the float32
    full-corpus array; doc_count = len(doc_lens) exactly as the
    reference does (tf_idf.py:33). ``exclude_ranges`` as in bm25."""
    doc_count = len(doc_lens)
    unique = _candidates(doc_ids, operator, subset_doc_ids, doc_count, scratch)
    if exclude_ranges is not None:
        unique = _drop_ranges(unique, exclude_ranges)
    scores = _scratch_get(scratch, "scores_" + np.dtype(dtype).name, doc_count, dtype)
    for i in range(len(term_doc_freqs)):
        indices = doc_ids[i]
        contrib = (
            contribs[i]
            if contribs is not None
            else tf_idf_term_contrib(
                term_doc_freqs[i], indices, doc_lens, dtype
            )
        )
        scores[indices] += contrib
    if exclude_ranges is not None:
        for s, e in zip(*exclude_ranges):
            scores[s:e] = 0
    out = _finalize(unique, scores, cutoff)
    if scratch is not None:
        _reset_scores(scores, unique, doc_ids, operator, subset_doc_ids)
    return out
