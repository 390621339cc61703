"""Training-data preparation operators: text cleaning, deterministic
split assignment, and document chunking.

All are single-pass ``map_batches``/``flat_map``-style transforms —
no shuffle, no driver materialization — and each is expressible in
ANSI SQL for the driver's oracle gate:
- :func:`clean_text` uses ``pyarrow.compute`` regex kernels, which are
  RE2 — the same engine DuckDB's ``regexp_replace`` uses, so the
  Python and SQL sides share one regex dialect exactly.
- :func:`split_by_hash` buckets on the md5 of a key column (low 8
  digest bytes, little-endian — DuckDB ``md5_number_lower``), so the
  assignment is reproducible anywhere, including in SQL.
- :func:`chunk_documents` windows the whitespace token stream with
  overlap (the standard embedding/packing prep step).
"""

from __future__ import annotations

import hashlib
import math
from typing import Dict, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# cleaning passes, applied in order (each a (pattern, replacement));
# RE2 syntax only — no lookarounds/backrefs — so DuckDB replicates it
_CLEAN_PASSES = [
    (r"https?://\S+", " "),  # URLs
    (r"\S+@\S+\.\S+", " "),  # emails
    (r"[\x00-\x08\x0b-\x1f\x7f]", " "),  # control chars (keep \t\n)
    (r"\s+", " "),  # collapse whitespace
]


def clean_text(ds, text_col: str = "text", id_col: str = "doc_id"):
    """(id, clean) with URLs/emails/control chars removed and
    whitespace collapsed+trimmed. Vectorized RE2 over Arrow batches."""

    def fn(batch: pa.Table) -> pa.Table:
        col = pc.cast(batch.column(text_col), pa.string())
        col = pc.fill_null(col, "")
        for pat, repl in _CLEAN_PASSES:
            col = pc.replace_substring_regex(col, pattern=pat, replacement=repl)
        col = pc.utf8_trim_whitespace(col)
        return pa.Table.from_arrays(
            [batch.column(id_col), col], names=[id_col, "clean"]
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def _drop_null_keys(batch: pa.Table, key_col: str) -> pa.Table:
    """Null-key rows are dropped (documented contract of
    :func:`topk_per_group` / :func:`stratified_sample`): Ray Data's
    groupby shuffle cannot range-partition blocks whose key column
    mixes nulls with strings, so a null group can't survive the
    exchange anyway — dropping them here keeps the vectorized partial
    from raising ArrowInvalid on null dictionary indices."""
    key = batch.column(key_col)
    if key.null_count:
        batch = batch.filter(pc.is_valid(key))
    return batch


def _group_codes(col: pa.ChunkedArray) -> np.ndarray:
    """Integer group codes for a (null-free) key column."""
    return col.combine_chunks().dictionary_encode().indices.to_numpy()


def _md5_low64(values) -> np.ndarray:
    """DuckDB ``md5_number_lower`` equivalent: low 8 digest bytes,
    little-endian, as uint64."""
    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        out[i] = int.from_bytes(
            hashlib.md5(str(v).encode()).digest()[8:16], "little"
        )
    return out


def split_by_hash(
    ds,
    ratios: Dict[str, int] | None = None,
    key_col: str = "doc_id",
    buckets: int = 100,
):
    """Deterministic dataset split: bucket = md5_low64(key) % buckets,
    assigned to named splits by cumulative ratio (default
    train/val/test = 90/5/5). Content-independent of partitioning and
    cluster size — the property that matters when the same corpus is
    re-split on a different cluster. Adds a ``split`` column."""
    ratios = ratios or {"train": 90, "val": 5, "test": 5}
    assert sum(ratios.values()) == buckets, "ratios must sum to buckets"
    names = list(ratios)
    bounds = np.cumsum([ratios[n] for n in names])

    def fn(batch: pa.Table) -> pa.Table:
        h = _md5_low64(batch.column(key_col).to_pylist()) % np.uint64(buckets)
        idx = np.searchsorted(bounds, h, side="right")
        split = np.asarray(names, dtype=object)[idx]
        return batch.append_column("split", pa.array(split, type=pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")


def chunk_documents(
    ds,
    max_tokens: int = 64,
    stride: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Split each document's whitespace token stream into windows of
    ``max_tokens`` tokens advancing by ``stride`` (default: no
    overlap). Emits (id, chunk_idx, chunk, n_tokens); empty docs emit
    nothing. One streaming pass; output rows are independent, so
    downstream embedding/packing stages parallelize freely."""
    stride = stride or max_tokens
    assert stride > 0

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        out_id, out_ci, out_ch, out_n = [], [], [], []
        for did, t in zip(ids, texts):
            toks = (t or "").split()
            ci = 0
            for start in range(0, len(toks), stride):
                window = toks[start : start + max_tokens]
                out_id.append(did)
                out_ci.append(ci)
                out_ch.append(" ".join(window))
                out_n.append(len(window))
                ci += 1
                if start + max_tokens >= len(toks):
                    break
        return pa.Table.from_arrays(
            [
                pa.array(out_id),
                pa.array(out_ci, type=pa.int64()),
                pa.array(out_ch, type=pa.string()),
                pa.array(out_n, type=pa.int64()),
            ],
            names=[id_col, "chunk_idx", "chunk", "n_tokens"],
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def pack_token_stream(
    ds,
    budget: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    driver_merge_limit: int = 50_000_000,
):
    """Pretraining-style sequence packing: concatenate every document's
    whitespace-token stream in ``id_col`` order and cut it into
    sequences of exactly ``budget`` tokens (documents may span a
    boundary). Emits one row per (sequence, document) overlap:
    (seq_id, id, tok_start, tok_end) with doc-local token offsets —
    the deterministic layout a packed-training writer consumes.

    Two passes, same shape as the index build's conv-offsets stage:
    pass 1 reduces to one (id, n_tokens) row per document
    (document-level, not token-level). Up to ``driver_merge_limit``
    documents the global offsets prefix-sum on the driver and
    broadcast (pass 2 is then an embarrassingly parallel map). Above
    the limit the prefix-sum runs DISTRIBUTED and bucketed: doc-id
    ranges partition into buckets, a tiny per-bucket token-sum table
    (one row per bucket) prefix-sums on the driver, and a
    groupby(bucket) shuffle of the doc-level (id, n) rows lets each
    bucket compute its docs' exact global offsets — and emit their
    span rows — locally. Driver memory is O(num_buckets); no
    per-document state ever gathers.
    """
    import ray

    def counts(batch: pa.Table) -> pa.Table:
        # whitespace token count = number of maximal \S+ runs; RE2 in
        # pyarrow = RE2 in the DuckDB oracle, one dialect both sides
        txt = pc.fill_null(pc.cast(batch.column(text_col), pa.string()), "")
        n = pc.cast(pc.count_substring_regex(txt, pattern=r"\S+"), pa.int64())
        return pa.Table.from_arrays([batch.column(id_col), n], names=[id_col, "n"])

    b = budget

    def doc_spans(ids, ns, bases, out_seq, out_id, out_s, out_e):
        for k in range(len(ids)):
            n = int(ns[k])
            if n == 0:
                continue
            lo = int(bases[k])
            for seq in range(lo // b, (lo + n - 1) // b + 1):
                out_seq.append(seq)
                out_id.append(int(ids[k]))
                out_s.append(max(0, seq * b - lo))
                out_e.append(min(n, (seq + 1) * b - lo))

    def span_table(out_seq, out_id, out_s, out_e) -> pa.Table:
        return pa.Table.from_arrays(
            [
                pa.array(out_seq, type=pa.int64()),
                pa.array(out_id, type=pa.int64()),
                pa.array(out_s, type=pa.int64()),
                pa.array(out_e, type=pa.int64()),
            ],
            names=["seq_id", id_col, "tok_start", "tok_end"],
        )

    counts_ds = ds.map_batches(counts, batch_format="pyarrow").materialize()
    n_docs = counts_ds.count()

    if n_docs == 0:
        # empty corpus: zero sequences (concat_tables rejects [])
        return ray.data.from_arrow(span_table([], [], [], []))

    if n_docs <= driver_merge_limit:
        parts = pa.concat_tables(
            list(counts_ds.iter_batches(batch_format="pyarrow", batch_size=None))
        )
        order = np.argsort(parts.column(id_col).to_numpy(), kind="stable")
        ids_sorted = parts.column(id_col).to_numpy()[order]
        n_sorted = parts.column("n").to_numpy()[order]
        base = np.concatenate(([0], np.cumsum(n_sorted)[:-1]))
        ref = ray.put((ids_sorted, base, n_sorted))

        def spans(batch: pa.Table) -> pa.Table:
            ids_s, base_s, n_s = ray.get(ref)
            ids = batch.column(id_col).to_numpy()
            pos = np.searchsorted(ids_s, ids)
            out = ([], [], [], [])
            doc_spans(ids, n_s[pos], base_s[pos], *out)
            return span_table(*out)

        return ds.map_batches(spans, batch_format="pyarrow")

    # ---- distributed bucketed prefix-sum (the 10^9-doc path) ----
    from ray.data.aggregate import Max, Min, Sum

    stats = counts_ds.aggregate(Min(id_col), Max(id_col))
    id_lo, id_hi = int(stats[f"min({id_col})"]), int(stats[f"max({id_col})"])
    # ~driver_merge_limit/2 docs per bucket on average keeps each
    # reduce group driver-sized while the bucket table stays tiny
    n_buckets = max(1, math.ceil(n_docs / max(1, driver_merge_limit // 2)))
    span = max(1, math.ceil((id_hi - id_lo + 1) / n_buckets))

    def bucket_partial(batch: pa.Table) -> pa.Table:
        bk = (batch.column(id_col).to_numpy() - id_lo) // span
        t = pa.Table.from_arrays(
            [pa.array(bk, type=pa.int64()), batch.column("n")],
            names=["bucket", "n"],
        )
        return pa.TableGroupBy(t, "bucket").aggregate([("n", "sum")]).rename_columns(
            ["bucket", "n"]
        )

    # one row per (bucket, batch) -> one row per bucket: tiny exchange
    btbl = pa.concat_tables(
        list(
            counts_ds.map_batches(bucket_partial, batch_format="pyarrow")
            .groupby("bucket")
            .aggregate(Sum("n"))
            .iter_batches(batch_format="pyarrow", batch_size=None)
        )
    )
    border = np.argsort(btbl.column("bucket").to_numpy())
    bkeys = btbl.column("bucket").to_numpy()[border]
    bsums = btbl.column("sum(n)").to_numpy()[border]
    bbase = np.concatenate(([0], np.cumsum(bsums)[:-1]))
    bref = ray.put((bkeys, bbase))

    def bucket_spans(group: pa.Table) -> pa.Table:
        ids = group.column(id_col).to_numpy()
        ns = group.column("n").to_numpy()
        order_ = np.argsort(ids, kind="stable")
        ids, ns = ids[order_], ns[order_]
        keys, bases0 = ray.get(bref)
        bk = int((ids[0] - id_lo) // span) if len(ids) else 0
        start = bases0[np.searchsorted(keys, bk)] if len(ids) else 0
        bases = start + np.concatenate(([0], np.cumsum(ns)[:-1]))
        out = ([], [], [], [])
        doc_spans(ids, ns, bases, *out)
        return span_table(*out)

    return (
        counts_ds.map_batches(
            lambda t: t.append_column(
                "bucket",
                pa.array((t.column(id_col).to_numpy() - id_lo) // span),
            ),
            batch_format="pyarrow",
        )
        .groupby("bucket")
        .map_groups(bucket_spans, batch_format="pyarrow")
    )


def topk_per_group(
    ds,
    k: int = 5,
    key_col: str = "source",
    score_col: str = "n_chars",
    id_col: str = "doc_id",
):
    """Data-curation staple: the top-``k`` rows per group by a score
    column (ties break by ascending id — deterministic, matching a SQL
    ``row_number() OVER (ORDER BY score DESC, id)`` oracle). Per-batch
    partial top-k runs BEFORE the shuffle, so the exchange moves at
    most ``k`` rows per (group, batch) instead of the group's rows."""

    def partial(batch: pa.Table) -> pa.Table:
        # fully vectorized group-wise top-k: C dictionary-encode for
        # group codes, one lexsort (group, -score, id), then ranks
        # within each run — no Python loop over rows or groups
        batch = _drop_null_keys(batch, key_col)
        codes = _group_codes(batch.column(key_col))
        scores = batch.column(score_col).to_numpy()
        ids = batch.column(id_col).to_numpy()
        order = np.lexsort((ids, -scores, codes))
        sc = codes[order]
        run_start = np.concatenate(([True], sc[1:] != sc[:-1]))
        starts = np.flatnonzero(run_start)
        lens = np.diff(np.append(starts, len(sc)))
        rank = np.arange(len(sc)) - np.repeat(starts, lens)
        out_idx = pa.array(np.sort(order[rank < k]), type=pa.int64())
        return pa.Table.from_arrays(
            [
                batch.column(key_col).take(out_idx),
                batch.column(score_col).take(out_idx),
                batch.column(id_col).take(out_idx),
            ],
            names=[key_col, score_col, id_col],
        )

    def final(group: pa.Table) -> pa.Table:
        scores = group.column(score_col).to_numpy()
        ids = group.column(id_col).to_numpy()
        order = np.lexsort((ids, -scores))[:k]
        return pa.Table.from_arrays(
            [
                group.column(key_col).take(pa.array(order)),
                pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
                pa.array(ids[order]),
                pa.array(scores[order]),
            ],
            names=[key_col, "rank", id_col, score_col],
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key_col)
        .map_groups(final, batch_format="pyarrow")
    )


def stratified_sample(
    ds,
    n: int = 5,
    key_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 0,
):
    """Deterministic per-group sample of ``n`` rows — the data-mixing
    staple (fixed quota per source/language/domain). Rank = ascending
    md5 low-64 of ``"{seed}:{id}"`` (= DuckDB ``md5_number_lower``,
    the repo-wide hash convention), so the sample is reproducible,
    seedable, SQL-checkable, and independent of partitioning. Same
    combiner-first shape as :func:`topk_per_group`: each batch keeps
    at most ``n`` rows per group BEFORE the shuffle."""
    def rank_hash(batch: pa.Table) -> np.ndarray:
        ids = batch.column(id_col).to_pylist()
        return _md5_low64([f"{seed}:{v}" for v in ids])

    def partial(batch: pa.Table) -> pa.Table:
        batch = _drop_null_keys(batch, key_col)
        codes = _group_codes(batch.column(key_col))
        h = rank_hash(batch)
        ids = batch.column(id_col).to_numpy()
        order = np.lexsort((ids, h, codes))
        sc = codes[order]
        starts = np.flatnonzero(np.concatenate(([True], sc[1:] != sc[:-1])))
        lens = np.diff(np.append(starts, len(sc)))
        rank = np.arange(len(sc)) - np.repeat(starts, lens)
        keep = pa.array(np.sort(order[rank < n]), type=pa.int64())
        return pa.Table.from_arrays(
            [batch.column(key_col).take(keep), batch.column(id_col).take(keep)],
            names=[key_col, id_col],
        )

    def final(group: pa.Table) -> pa.Table:
        h = rank_hash(group)
        ids = group.column(id_col).to_numpy()
        order = np.lexsort((ids, h))[:n]
        keep = np.sort(ids[order])
        return pa.Table.from_arrays(
            [
                group.column(key_col).take(pa.array([0] * len(keep))),
                pa.array(keep),
            ],
            names=[key_col, id_col],
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key_col)
        .map_groups(final, batch_format="pyarrow")
    )


def weighted_sample(
    ds,
    k: int = 50,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
    seed: int = 0,
):
    """Deterministic weighted sampling WITHOUT replacement of ``k``
    rows, inclusion probability proportional to ``weight_col``
    (Efraimidis-Spirakis A-ES): key = ln(u) / w with u the md5-derived
    uniform of ``"{seed}:{id}"`` (the repo-wide ``md5_number_lower``
    convention), take the k largest keys. Reproducible, seedable,
    partition-independent, and SQL-checkable — the oracle computes the
    identical key with DuckDB's ln/md5. Rows with w <= 0 are excluded
    (zero weight = never sampled). Ties broken by id ascending; exact
    real-value key ties are measure-zero with hash uniforms (same
    float-ordering stance as the ANN oracles — only ids are output,
    no floats).

    Scale plan: a per-batch partial top-k bounds the exchange at
    k rows per block, then the tiny survivor set (<= blocks * k rows)
    sorts and limits — no global sort of the input, no driver
    materialization. Returns (id, w) sorted by id.
    """

    def key_of(batch: pa.Table) -> np.ndarray:
        ids = batch.column(id_col).to_pylist()
        u = (
            _md5_low64([f"{seed}:{v}" for v in ids]).astype(np.float64) + 1.0
        ) / 18446744073709551616.0
        w = batch.column(weight_col).to_numpy().astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            return np.log(u) / w

    def partial(batch: pa.Table) -> pa.Table:
        w = batch.column(weight_col).to_numpy()
        keep = pa.array(np.flatnonzero(w > 0), type=pa.int64())
        batch = batch.take(keep)
        key = key_of(batch)
        ids = batch.column(id_col).to_numpy()
        order = np.sort(np.lexsort((ids, -key))[:k])
        sel = pa.array(order, type=pa.int64())
        return pa.Table.from_arrays(
            [
                batch.column(id_col).take(sel),
                batch.column(weight_col).take(sel),
                pa.array(-key[order]),
            ],
            names=[id_col, "w", "neg_key"],
        )

    survivors = ds.map_batches(partial, batch_format="pyarrow")

    def final(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        order = np.lexsort((ids, batch.column("neg_key").to_numpy()))[:k]
        sel = np.sort(ids[order])
        pos = {int(v): i for i, v in enumerate(ids)}
        take = pa.array([pos[int(v)] for v in sel], type=pa.int64())
        return pa.Table.from_arrays(
            [batch.column(id_col).take(take), batch.column("w").take(take)],
            names=[id_col, "w"],
        )

    # survivors are <= blocks * k rows; one reduce task finishes
    return survivors.repartition(1).map_batches(
        final, batch_format="pyarrow", batch_size=None
    )


def parse_json_fields(
    ds,
    col: str = "props",
    int_fields=(),
    str_fields=(),
):
    """Extract scalar fields from a FLAT JSON-object string column
    into typed top-level columns (int64 for ``int_fields``, string
    for ``str_fields``; null where the key is absent or the row isn't
    a flat object). The semi-structured-log staple: turn
    ``props='{"k": 87}'`` into a queryable ``k`` column at read time
    instead of shipping a JSON parser into every downstream stage.

    Contract (documented, not checked): values are scalars and string
    values contain no escaped quotes — the extraction is a compiled
    RE2 kernel (``pc.extract_regex``) per field, one vectorized pass,
    zero shuffle, zero Python per row. The DuckDB oracle parses the
    same rows with a real JSON parser (``json_extract``), so the
    regex shortcut is cross-checked against full-JSON semantics on
    every driver run.
    """

    int_fields, str_fields = list(int_fields), list(str_fields)

    import re as _re

    def extract(batch: pa.Table) -> pa.Table:
        src = pc.cast(batch.column(col), pa.string())
        for f in int_fields:
            st = pc.extract_regex(
                src, rf'"{_re.escape(f)}":\s*(?P<v>-?\d+)'
            )
            v = pc.cast(pc.struct_field(st, "v"), pa.int64())
            batch = batch.append_column(f, v)
        for f in str_fields:
            st = pc.extract_regex(
                src, rf'"{_re.escape(f)}":\s*"(?P<v>[^"]*)"'
            )
            batch = batch.append_column(f, pc.struct_field(st, "v"))
        return batch

    return ds.map_batches(extract, batch_format="pyarrow")


def bpe_train(
    ds,
    n_merges: int = 10,
    text_col: str = "text",
    max_token_chars: int = 64,
    driver_word_limit: int = 2_000_000,
):
    """Distributed BPE merge-rule training (Sennrich et al. 2016,
    word-internal variant): start from characters within whitespace
    words, repeatedly merge the globally most frequent adjacent
    symbol pair (ties: higher count first, then lexicographic (left,
    right) — fully deterministic). Returns a pa.Table
    (merge_idx, left, right, pair_count) of the learned rules.

    This is the iterative-algorithm family member (like k-means): NOT
    SQL-expressible as one query, so its correctness is pinned by a
    differential test against an in-memory reference implementation
    instead of a DuckDB oracle.

    Scale plan (two phases — a 50k-merge vocab must not mean 50k Ray
    jobs):

    1. ONE distributed pass collapses the corpus to its distinct
       word-frequency table (per-block value_counts combiner, one
       groupby(word).sum exchange) — Zipf collapses the volume; this
       is the only stage that ever touches the corpus.
    2. Merges train over that table. When the distinct-word count
       fits ``driver_word_limit`` (the HuggingFace-tokenizers shape:
       BPE trainers everywhere run on word counts in memory), an
       exact heap + pair-delta trainer runs all ``n_merges`` rounds
       driver-side — each merge touches only the words containing the
       winning pair, no further cluster work. Past the limit, the
       per-round distributed argmax falls back — but over the word
       table, not the corpus (each round is a small Ray job over
       distinct words).

    Words longer than ``max_token_chars`` are skipped (pathological
    unsegmented blobs would dominate pair counts).
    """
    from ray.data.aggregate import Sum

    def word_partial(batch: pa.Table) -> pa.Table:
        col = pc.utf8_trim_whitespace(
            pc.cast(pc.fill_null(batch.column(text_col), ""), pa.string())
        )
        flat = pc.list_flatten(pc.split_pattern_regex(col, r"\s+"))
        vc = flat.value_counts()
        w = vc.field("values")
        c = vc.field("counts")
        keep = pc.and_(
            pc.not_equal(w, ""),
            pc.less_equal(pc.utf8_length(w), max_token_chars),
        )
        return pa.Table.from_arrays(
            [w.filter(keep), pc.cast(c.filter(keep), pa.int64())],
            names=["w", "c"],
        )

    wc_ds = (
        ds.map_batches(word_partial, batch_format="pyarrow")
        .groupby("w")
        .aggregate(Sum("c", alias_name="c"))
        .materialize()
    )
    n_words = wc_ds.count()
    if n_words <= driver_word_limit:
        words, counts = [], []
        for blk in wc_ds.to_arrow_refs():
            import ray as _ray

            t = _ray.get(blk)
            if t.num_rows:
                words.extend(t.column("w").to_pylist())
                counts.extend(t.column("c").to_pylist())
        return _bpe_train_mem(words, counts, n_merges)
    return _bpe_train_rounds(wc_ds, n_merges)


def _bpe_apply_merge(syms: List[str], l: str, r: str) -> List[str]:
    """Replace every non-overlapping adjacent (l, r) left-to-right."""
    i, out = 0, []
    n = len(syms)
    while i < n:
        if i + 1 < n and syms[i] == l and syms[i + 1] == r:
            out.append(l + r)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _bpe_train_mem(
    words: List[str], counts: List[int], n_merges: int
) -> pa.Table:
    """Exact in-memory BPE over a word-frequency table: lazy max-heap
    with stale-entry discard + per-merge pair-delta maintenance (only
    words containing the winning pair are touched). Argmax tie rule
    identical to the distributed path: count desc, then (left, right)
    lexicographic asc."""
    import heapq
    from collections import Counter, defaultdict

    seqs: List[List[str]] = [list(w) for w in words]
    pair_counts: dict = {}
    where: defaultdict = defaultdict(set)
    for idx, (syms, c) in enumerate(zip(seqs, counts)):
        for p in zip(syms, syms[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + c
            where[p].add(idx)
    heap = [(-c, l, r) for (l, r), c in pair_counts.items()]
    heapq.heapify(heap)

    out_l, out_r, out_c = [], [], []
    for _ in range(n_merges):
        best = None
        while heap:
            negc, l, r = heap[0]
            cur = pair_counts.get((l, r), 0)
            if cur == -negc and cur > 0:
                best = (l, r, cur)
                break
            heapq.heappop(heap)  # stale: count changed since push
            if cur > 0:
                heapq.heappush(heap, (-cur, l, r))
        if best is None:
            break
        l, r, c_best = best
        out_l.append(l)
        out_r.append(r)
        out_c.append(c_best)
        for idx in sorted(where[(l, r)]):
            syms = seqs[idx]
            c = counts[idx]
            old_pairs = Counter(zip(syms, syms[1:]))
            new_syms = _bpe_apply_merge(syms, l, r)
            new_pairs = Counter(zip(new_syms, new_syms[1:]))
            for p in old_pairs.keys() | new_pairs.keys():
                d = new_pairs[p] - old_pairs[p]
                if d:
                    nc = pair_counts.get(p, 0) + d * c
                    if nc > 0:
                        pair_counts[p] = nc
                        if d > 0:
                            heapq.heappush(heap, (-nc, p[0], p[1]))
                    else:
                        pair_counts.pop(p, None)
                if new_pairs[p]:
                    where[p].add(idx)
                elif old_pairs[p]:
                    where[p].discard(idx)
            seqs[idx] = new_syms
        del where[(l, r)]
        pair_counts.pop((l, r), None)

    return pa.Table.from_arrays(
        [
            pa.array(np.arange(len(out_l), dtype=np.int64)),
            pa.array(out_l, type=pa.string()),
            pa.array(out_r, type=pa.string()),
            pa.array(out_c, type=pa.int64()),
        ],
        names=["merge_idx", "left", "right", "pair_count"],
    )


def _bpe_train_rounds(wc_ds, n_merges: int) -> pa.Table:
    """Beyond-driver-limit fallback: per-round distributed argmax over
    the (materialized) word-frequency table — each round replays the
    driver-held merge list per distinct word and exchanges bounded
    (block x distinct-pair) count rows."""
    from ray.data.aggregate import Sum

    merges: List[tuple] = []
    out_l, out_r, out_c = [], [], []

    for _round in range(n_merges):
        rules = tuple(merges)

        def pair_partial(batch: pa.Table, _rules=rules) -> pa.Table:
            from collections import Counter

            pairs: Counter = Counter()
            for w, c in zip(
                batch.column("w").to_pylist(), batch.column("c").to_pylist()
            ):
                syms = list(w)
                for l, r in _rules:
                    syms = _bpe_apply_merge(syms, l, r)
                for p in zip(syms, syms[1:]):
                    pairs[p] += c
            if not pairs:
                return pa.Table.from_arrays(
                    [pa.array([], type=pa.string())] * 2
                    + [pa.array([], type=pa.int64())],
                    names=["l", "r", "c"],
                )
            ls, rs, cs = zip(*((a, b, c) for (a, b), c in pairs.items()))
            return pa.Table.from_arrays(
                [
                    pa.array(list(ls), type=pa.string()),
                    pa.array(list(rs), type=pa.string()),
                    pa.array(list(cs), type=pa.int64()),
                ],
                names=["l", "r", "c"],
            )

        counts = (
            wc_ds.map_batches(pair_partial, batch_format="pyarrow")
            .groupby(["l", "r"])
            .aggregate(Sum("c", alias_name="c"))
            # deterministic argmax: count desc, then (l, r) asc
            .sort(["c", "l", "r"], descending=[True, False, False])
            .limit(1)
            .take_all()
        )
        if not counts:
            break
        row = counts[0]
        merges.append((row["l"], row["r"]))
        out_l.append(row["l"])
        out_r.append(row["r"])
        out_c.append(int(row["c"]))

    return pa.Table.from_arrays(
        [
            pa.array(np.arange(len(out_l), dtype=np.int64)),
            pa.array(out_l, type=pa.string()),
            pa.array(out_r, type=pa.string()),
            pa.array(out_c, type=pa.int64()),
        ],
        names=["merge_idx", "left", "right", "pair_count"],
    )
