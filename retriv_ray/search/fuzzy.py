"""Fuzzy (edit-distance ``term~d``) queries via a vectorized
bit-parallel Levenshtein scan of the term dictionary.

Expansion runs over the same part-sharded sorted terms table the
exact/prefix probes use (search/searcher.py TermStats,
search/prefix.py): every part is length-prefiltered
(``|len(t) - len(q)| <= d`` — a necessary condition for distance d)
and the survivors are scored in ONE Myers/Hyyroe bit-parallel pass
vectorized across the whole candidate set — the inner loop is
O(max_candidate_len) numpy steps over uint64 lanes, not a per-string
Python DP. The expanded term set then scores as an ordinary
disjunctive BM25 query through the existing kernel (each matched
vocabulary term contributes with its own df/tf, Lucene
``FuzzyQuery``-with-constant-boost semantics).

Distances are computed over UTF-8 BYTES: on ASCII vocabularies this
equals character-level Levenshtein (what SQL ``levenshtein`` and the
oracle compute); multi-byte scripts count per byte and are documented
as divergent (a code-point matrix would lift this at 4x the lane
width).

Scale notes: expansion cost is vocabulary-bounded (never touches the
corpus) and per-part independent — in serving fleets each scorer
actor expands against its resident TermStats parts exactly like
prefix queries; postings fetches for the expanded set then
parallelize per part like any multi-term query. The length prefilter
typically keeps the candidate set a few percent of the vocabulary for
d <= 2.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa


def _levenshtein_batch(
    pattern: bytes, mat: np.ndarray, lens: np.ndarray
) -> np.ndarray:
    """Levenshtein distance of ``pattern`` against every row of
    ``mat`` (uint8-padded candidate byte matrix, true lengths in
    ``lens``), Myers bit-parallel vectorized across rows. Pattern
    must be 1..64 bytes (one uint64 lane)."""
    m = len(pattern)
    if not 1 <= m <= 64:
        raise ValueError("pattern must be 1..64 bytes")
    # per-byte-value pattern masks (Eq lookup table)
    peq = np.zeros(256, dtype=np.uint64)
    u1 = np.uint64(1)
    for i, ch in enumerate(pattern):
        peq[ch] |= u1 << np.uint64(i)
    n = mat.shape[0]
    Pv = np.full(n, np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
    Mv = np.zeros(n, dtype=np.uint64)
    score = np.full(n, m, dtype=np.int64)
    hbit = u1 << np.uint64(m - 1)
    for j in range(mat.shape[1]):
        active = j < lens
        Eq = peq[mat[:, j]]
        Xv = Eq | Mv
        Xh = (((Eq & Pv) + Pv) ^ Pv) | Eq
        Ph = Mv | ~(Xh | Pv)
        Mh = Pv & Xh
        delta = ((Ph & hbit) != 0).astype(np.int64) - (
            (Mh & hbit) != 0
        ).astype(np.int64)
        score = np.where(active, score + delta, score)
        Ph = (Ph << u1) | u1
        Mh = Mh << u1
        Pv = np.where(active, Mh | ~(Xv | Ph), Pv)
        Mv = np.where(active, Ph & Xv, Mv)
    return score


def _levenshtein_rows(pattern: bytes, rows: List[bytes]) -> List[int]:
    """Plain DP fallback for patterns over 64 bytes (vectorized over
    the pattern axis; only reached for very long vocabulary probes)."""
    p = np.frombuffer(pattern, dtype=np.uint8).astype(np.int64)
    out = []
    for r in rows:
        prev = np.arange(len(p) + 1, dtype=np.int64)
        for i, ch in enumerate(r):
            cur = np.empty_like(prev)
            cur[0] = i + 1
            np.minimum(prev[:-1] + (p != ch), prev[1:] + 1, out=cur[1:])
            # sequential insertion closure: cur[k] > cur[k-1] + 1 never
            # survives; the +1 carry forces a scalar pass
            for k in range(1, len(cur)):
                if cur[k - 1] + 1 < cur[k]:
                    cur[k] = cur[k - 1] + 1
            prev = cur
        out.append(int(prev[-1]))
    return out


def _scan_view(term_stats):
    """Whole-vocabulary scan view cached on the TermStats instance,
    SORTED BY TERM LENGTH: (lens_sorted, matT [maxlen x vocab,
    transposed + length-sorted], byte offsets into the concatenated
    data, concatenated data, dfs, order) where ``order`` maps a
    sorted-view row back to its original vocabulary index. Built
    lazily on first fuzzy probe.

    Length-sorting makes each query's |len-m|<=d candidate band ONE
    contiguous slice (searchsorted, no fancy-index gather copy), and
    inside the bit-parallel kernel the still-active rows at column j
    are always a suffix of that slice — no per-column masks. The
    transpose makes each column access contiguous. Memory is
    vocab x maxlen bytes (a 1e6-term, 32-byte-max vocabulary costs
    32 MB per serving actor)."""
    view = getattr(term_stats, "_fuzzy_scan_view", None)
    if view is not None:
        return view
    lens_parts, data_parts, df_parts = [], [], []
    for p in range(term_stats.num_parts):
        entry = term_stats._part(p)
        if entry is None:
            continue
        _arr, _prefixes, off, data, df = entry
        lens_parts.append(np.diff(off))
        data_parts.append(data[int(off[0]) : int(off[-1])])
        df_parts.append(df)
    if not lens_parts:
        view = (
            np.empty(0, dtype=np.int64),
            np.empty((1, 0), dtype=np.uint8),
            np.zeros(1, dtype=np.int64),
            np.empty(0, dtype=np.uint8),
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.int64),
        )
        term_stats._fuzzy_scan_view = view
        return view
    lens = np.concatenate(lens_parts).astype(np.int64)
    data = np.concatenate(data_parts)
    off = np.concatenate(([0], np.cumsum(lens)))
    order = np.argsort(lens, kind="stable")
    lens_s = lens[order]
    L = int(lens.max()) if len(lens) else 1
    cols = np.arange(L, dtype=np.int64)
    idx = off[:-1, None] + cols[None, :]
    valid = cols[None, :] < lens[:, None]
    mat = data[np.minimum(idx, len(data) - 1)] * valid
    matT = np.ascontiguousarray(mat[order].T)
    dfs = np.concatenate(df_parts).astype(np.int64)
    view = (lens_s, matT, off, data, dfs, order)
    term_stats._fuzzy_scan_view = view
    return view


def _levenshtein_band(
    pattern: bytes, matT: np.ndarray, lens_s: np.ndarray, lo: int, hi: int
) -> np.ndarray:
    """Myers bit-parallel Levenshtein over the length-sorted rows
    ``lo:hi`` of a :func:`_scan_view`. Rows are length-ascending, so
    the active set at column j is the suffix of rows with len > j —
    plain contiguous-slice vector ops, no per-column masks/wheres."""
    m = len(pattern)
    if not 1 <= m <= 64:
        raise ValueError("pattern must be 1..64 bytes")
    peq = np.zeros(256, dtype=np.uint64)
    u1 = np.uint64(1)
    for i, ch in enumerate(pattern):
        peq[ch] |= u1 << np.uint64(i)
    n = hi - lo
    lens_b = lens_s[lo:hi]
    Pv = np.full(n, np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
    Mv = np.zeros(n, dtype=np.uint64)
    score = np.full(n, m, dtype=np.int64)
    hbit = u1 << np.uint64(m - 1)
    max_len = int(lens_b[-1]) if n else 0
    for j in range(max_len):
        # first still-active row (len > j); suffix stays active
        s = int(np.searchsorted(lens_b, j, side="right"))
        if s >= n:
            break
        Eq = peq[matT[j, lo + s : hi]]
        pv, mv = Pv[s:], Mv[s:]
        Xv = Eq | mv
        Xh = (((Eq & pv) + pv) ^ pv) | Eq
        Ph = mv | ~(Xh | pv)
        Mh = pv & Xh
        score[s:] += ((Ph & hbit) != 0).astype(np.int64)
        score[s:] -= ((Mh & hbit) != 0).astype(np.int64)
        Ph = (Ph << u1) | u1
        Mh <<= u1
        Pv[s:] = Mh | ~(Xv | Ph)
        Mv[s:] = Ph & Xv
    return score


def fuzzy_term_matches(
    term_stats, term: str, max_dist: int = 1, limit: int = 10_000
) -> List[Tuple[str, int, int]]:
    """All vocabulary terms within Levenshtein distance ``max_dist``
    of ``term`` as (term, distance, df) sorted by term; raises if the
    expansion exceeds ``limit``."""
    if not term:
        raise ValueError("empty fuzzy term")
    if max_dist < 0:
        raise ValueError("max_dist must be >= 0")
    # expansion memo: repeated probes (Zipf-headed query streams,
    # common misspellings) skip the dictionary scan entirely — the
    # standard compiled-automaton / terms-enum cache move. Bounded;
    # invalidated with the scan view on TermStats reload.
    memo = getattr(term_stats, "_fuzzy_memo", None)
    if memo is None:
        memo = term_stats._fuzzy_memo = {}
    key = (term, max_dist, limit)
    hitv = memo.get(key)
    if hitv is not None:
        return hitv
    tb = term.encode("utf-8")
    lens_s, matT, off, data, dfs, order = _scan_view(term_stats)
    lo = int(np.searchsorted(lens_s, len(tb) - max_dist, side="left"))
    hi = int(np.searchsorted(lens_s, len(tb) + max_dist, side="right"))
    if lo >= hi:
        memo[key] = []
        return []
    if len(tb) <= 64:
        dist = _levenshtein_band(tb, matT, lens_s, lo, hi)
        cand = order[lo:hi]
    else:
        cand = order[lo:hi]
        rows = [
            data[int(off[i]) : int(off[i + 1])].tobytes() for i in cand
        ]
        dist = np.asarray(_levenshtein_rows(tb, rows), dtype=np.int64)
    hit = dist <= max_dist
    if int(hit.sum()) > limit:
        raise ValueError(
            f"fuzzy term '{term}'~{max_dist} expands past {limit} terms"
        )
    out: List[Tuple[str, int, int]] = []
    for i, d in zip(cand[hit], dist[hit]):
        s, e = int(off[i]), int(off[i + 1])
        out.append(
            (data[s:e].tobytes().decode("utf-8"), int(d), int(dfs[i]))
        )
    out = sorted(out)
    if len(memo) < 65536:
        memo[key] = out
    return out


def fuzzy_terms(
    term_stats, term: str, max_dist: int = 1, limit: int = 10_000
) -> List[str]:
    """All vocabulary terms within Levenshtein distance ``max_dist``
    of ``term``, sorted; raises if the expansion exceeds ``limit``."""
    return [t for t, _d, _df in fuzzy_term_matches(term_stats, term, max_dist, limit)]


def suggest_term(
    term_stats, term: str, max_dist: int = 2
) -> Optional[Tuple[str, int, int]]:
    """Spell suggestion ("did you mean"): the vocabulary term closest
    to ``term`` — smallest edit distance, then HIGHEST doc frequency,
    then lexicographic — or None if nothing is within ``max_dist``.
    An exact vocabulary hit returns itself at distance 0."""
    best = None
    for t, d, df in fuzzy_term_matches(term_stats, term, max_dist):
        key = (d, -df, t)
        if best is None or key < best[0]:
            best = (key, (t, d, df))
    return best[1] if best is not None else None


_WORKER_RETRIEVERS: Dict[str, object] = {}


def _fuzzy_scorer_fn(index_dir: str, cfg_json: dict, cutoff: int):
    """Task-form fuzzy scorer (the msearch_ds pattern): the retriever
    — TermStats parts included — lives in a module-level per-worker
    cache, so expansion happens against resident dictionaries inside
    Ray's warm worker pool, not on the driver."""

    def fn(batch: pa.Table) -> pa.Table:
        key = f"{index_dir}|{sorted(cfg_json.items())}"
        r = _WORKER_RETRIEVERS.get(key)
        if r is None:
            from retriv_ray.config import SparseConfig
            from retriv_ray.search.searcher import RaySparseRetriever

            r = RaySparseRetriever(index_dir, SparseConfig.from_json(cfg_json))
            _WORKER_RETRIEVERS[key] = r
        ids = batch.column("id").to_pylist()
        probes = batch.column("term").to_pylist()
        dists = batch.column("max_dist").to_pylist()
        q_col: List[str] = []
        id_arrs: List[np.ndarray] = []
        sc_arrs: List[np.ndarray] = []
        rk_arrs: List[np.ndarray] = []
        for q_id, probe, d in zip(ids, probes, dists):
            terms = fuzzy_terms(r.index.term_df, probe, int(d))
            if not terms:
                continue
            docs, scores = r._score(terms, cutoff)
            q_col.extend([str(q_id)] * len(docs))
            id_arrs.append(docs)
            sc_arrs.append(scores.astype(np.float64))
            rk_arrs.append(np.arange(1, len(docs) + 1, dtype=np.int32))
        if id_arrs:
            doc = np.concatenate(id_arrs)
            convs, turns = r.index.to_original_ids(doc)
        else:
            doc = np.empty(0, dtype=np.int64)
            convs, turns = np.empty(0, object), np.empty(0, np.int32)
        return pa.Table.from_arrays(
            [
                pa.array(q_col, type=pa.string()),
                pa.array(
                    np.concatenate(rk_arrs)
                    if rk_arrs
                    else np.empty(0, np.int32)
                ),
                pa.array(convs, type=pa.string()),
                pa.array(np.asarray(turns, dtype=np.int32), type=pa.int32()),
                pa.array(
                    np.concatenate(sc_arrs)
                    if sc_arrs
                    else np.empty(0, np.float64)
                ),
                pa.array(doc, type=pa.int64()),
            ],
            names=["q_id", "rank", "conv_id", "turn_idx", "score", "doc_id"],
        )

    return fn


def fuzzy_msearch_ds(
    retriever,
    queries,
    cutoff: int = 100,
    concurrency: int = None,
    batch_size: int = None,
):
    """Batch fuzzy serving: ``queries`` is a Dataset / list of dicts
    with (id, term, max_dist); returns a streamed Dataset (q_id, rank,
    conv_id, turn_idx, score, doc_id) — the msearch_ds fleet shape,
    expansion per worker against cached TermStats."""
    import ray
    import ray.data

    if concurrency is None:
        concurrency = max(1, int(ray.cluster_resources().get("CPU", 4)) - 1)
    n_known = None
    if isinstance(queries, (list, tuple)):
        n_known = len(queries)
        queries = ray.data.from_items(
            [
                {
                    "id": q["id"],
                    "term": q["term"],
                    "max_dist": int(q.get("max_dist", 1)),
                }
                for q in queries
            ]
        )
    if n_known is not None:
        target_blocks = max(1, min(n_known // 8, 4 * concurrency))
        if queries.num_blocks() < target_blocks:
            queries = queries.repartition(target_blocks)
    if batch_size is None:
        batch_size = max(8, (n_known or 512) // (4 * concurrency) or 1)
    return queries.map_batches(
        _fuzzy_scorer_fn(
            retriever.index_dir, retriever.cfg.to_json(), cutoff
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def fuzzy_search_table(
    retriever,
    queries: Dict[str, Tuple[str, int]],
    cutoff: int = 100,
) -> pa.Table:
    """{q_id: (term, max_dist)} -> (q_id, rank, conv_id, turn_idx)
    BM25 top-k over each query's expanded term set (disjunctive OR,
    every expanded term scored with its own corpus statistics)."""
    q_col: List[str] = []
    r_col: List[int] = []
    c_parts, t_parts = [], []
    for q_id in sorted(queries):
        term, max_dist = queries[q_id]
        terms = fuzzy_terms(retriever.index.term_df, term, max_dist)
        if not terms:
            continue
        ids, _scores = retriever._score(terms, cutoff)
        convs, turns = retriever.index.to_original_ids(ids)
        q_col.extend([q_id] * len(ids))
        r_col.extend(range(1, len(ids) + 1))
        c_parts.append(np.asarray(convs, dtype=object))
        t_parts.append(turns)
    convs = np.concatenate(c_parts) if c_parts else np.empty(0, dtype=object)
    turns = np.concatenate(t_parts) if t_parts else np.empty(0, dtype=np.int32)
    return pa.Table.from_arrays(
        [
            pa.array(q_col, type=pa.string()),
            pa.array(np.asarray(r_col, dtype=np.int64)),
            pa.array(convs, type=pa.string()),
            pa.array(turns.astype(np.int32), type=pa.int32()),
        ],
        names=["q_id", "rank", "conv_id", "turn_idx"],
    )
