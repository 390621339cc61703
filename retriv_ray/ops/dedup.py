"""Deduplication operators over a documents Dataset.

All operators take a ``ray.data.Dataset`` with at least
``(doc_id: int64, text: string)`` and are Ray-Data-first: per-batch
vectorized maps + key shuffles; nothing materializes the corpus on
the driver (driver-side state is limited to O(#query/#block-ref)
metadata). Scale notes per operator.

- :func:`exact_dedup` — content-hash groupby; the shuffle moves
  (sha1, doc_id) pairs only, never the text.
- :func:`ngram_jaccard_pairs` — EXACT all-pairs Jaccard over word
  n-gram shingle sets via the inverted-pair expansion: shingle ->
  (shingle, doc, set_size) -> groupby(shingle) -> co-occurring pairs
  -> groupby(pair) count = |A ∩ B|. Set sizes ride along on each
  shingle row (8 extra bytes/row), so the Jaccard finalize is fully
  row-local — no driver-side size map. Pair volume is Σ_shingle df²;
  at 100 TB cap hot shingles with ``max_shingle_df`` (makes the
  result approximate: a pair ALL of whose shared shingles are hot is
  missed — log-noted per dropped group).
- :func:`minhash_lsh_pairs` — MinHash signatures (vectorized over
  64 hash seeds) -> banded LSH keys -> groupby(band) -> candidate
  pairs -> exact-Jaccard verification via two hash-shuffle joins of
  the candidate pairs against the per-doc shingle table (packed
  binary) — no whole-corpus driver map. Candidate volume is tunable
  via (num_perm, bands); completeness vs the exact operator is the
  LSH recall (1.0 on the test corpora at the default parameters —
  the exact operator doubles as its oracle).
- :func:`simhash64` — 64-bit SimHash fingerprints per doc (hamming
  near-dup grouping via 4x16-bit band buckets). Token hashes are the
  low 8 bytes of md5 (= DuckDB ``md5_number_lower``), so the whole
  fingerprint is reproducible in SQL for the correctness oracle.
- :func:`embedding_near_dup` — cosine near-dup pairs with two paths:
  ``method='exact'`` distributes the O(n²) all-pairs matmul over
  block-pair Ray tasks (driver holds block refs only — works until
  n² compute itself is the wall); ``method='lsh'`` buckets by
  random-hyperplane signatures and does in-bucket pairwise only (the
  10^9-vector path; recall < 1 possible, exact path doubles as its
  oracle on samples).
"""

from __future__ import annotations

import hashlib
import logging
import math
import zlib
from typing import List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from retriv_ray.ops._safejoin import safe_join

logger = logging.getLogger(__name__)

_MERSENNE = np.uint64((1 << 61) - 1)


def _md5_low64(s: str) -> int:
    """Low 8 bytes of md5, little-endian — matches DuckDB
    ``md5_number_lower`` so SQL oracles can reproduce token hashes."""
    return int.from_bytes(hashlib.md5(s.encode()).digest()[8:16], "little")


# Token-level md5 memo: web text is extremely repetitive (measured
# ~0.1% unique tokens per 4k-doc batch on the documents table), so one
# digest per distinct token amortizes the hashlib call away. Worker-
# process-local; cleared wholesale at the cap (same FIFO-free policy
# as the serving caches — a full clear is O(1) and the next batch
# repopulates the hot head immediately).
_MD5_MEMO: dict = {}
_MD5_MEMO_MAX = 1 << 20

# Reusable per-worker scratch (keyed by name): fresh multi-MB numpy
# allocations fault in new pages on every batch, which measures
# 4ms -> 140-260ms under Ray's memory churn; a kept-alive buffer pays
# that once per worker.
_SCRATCH: dict = {}


def _scratch_2d(key: str, rows: int, cols: int, dtype) -> np.ndarray:
    buf = _SCRATCH.get(key)
    if buf is None or buf.shape[0] < rows or buf.shape[1] < cols:
        r = max(rows, buf.shape[0] if buf is not None else 0)
        c = max(cols, 2 * buf.shape[1] if buf is not None else 0)
        buf = np.empty((r, c), dtype=dtype)
        _SCRATCH[key] = buf
    return buf[:rows, :cols]


def _md5_low64_many(tokens) -> np.ndarray:
    """Vectorized-ish ``_md5_low64`` over a token sequence: one md5
    per *distinct* token (process-local memo), dict hits for the rest.
    Bit-identical to mapping :func:`_md5_low64`."""
    memo = _MD5_MEMO
    md5 = hashlib.md5
    from_bytes = int.from_bytes
    out = np.empty(len(tokens), dtype=np.uint64)
    for i, w in enumerate(tokens):
        v = memo.get(w)
        if v is None:
            v = from_bytes(md5(w.encode()).digest()[8:16], "little")
            if len(memo) >= _MD5_MEMO_MAX:
                memo.clear()
            memo[w] = v
        out[i] = v
    return out


def _shingle_hashes(tokens: List[str], n: int) -> np.ndarray:
    """Distinct 64-bit hashes of word n-gram shingles."""
    if len(tokens) < n:
        return np.empty(0, dtype=np.uint64)
    joined = [" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)]
    h = np.fromiter(
        (
            int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "little")
            for s in joined
        ),
        dtype=np.uint64,
        count=len(joined),
    )
    return np.unique(h)


def _tokens(text: Optional[str]) -> List[str]:
    return (text or "").split()


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Keep the lowest id per distinct text. Returns a Dataset with
    column ``doc_id`` (kept ids). Oracle: GROUP BY text -> min(id)."""

    def add_hash(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        hashes = pa.array(
            [hashlib.sha1((t or "").encode()).digest() for t in texts],
            type=pa.binary(),
        )
        return pa.Table.from_arrays(
            [hashes, batch.column(id_col)], names=["h", id_col]
        )

    from ray.data.aggregate import Min

    return (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Min(id_col))
        .select_columns([f"min({id_col})"])
        .rename_columns({f"min({id_col})": id_col})
    )


# ---------------------------------------------------------------------------
# exact n-gram Jaccard pairs
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    ds,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_df: Optional[int] = 10_000,
):
    """All pairs (a < b) with Jaccard(shingles_a, shingles_b) >=
    threshold, plus the exact jaccard as cents (int64, floor(j*10000))
    so the result hashes exactly against a SQL oracle.

    Each (shingle, doc) row carries the doc's shingle-set size, so the
    final Jaccard is computed row-locally after the pair groupby — no
    driver-side size map and no extra shuffle. Groups larger than
    ``max_shingle_df`` emit no pairs: the pair fan-out is df² per
    shingle, so ONE boilerplate shingle shared by 10^6 docs would
    emit 5*10^11 rows — the cap defaults ON (10^4 ~ 5*10^7 pairs
    worst-case per hot shingle, object-store sized) so the default
    configuration cannot silently OOM the reducer. Each dropped group
    logs a warning with its df. The result is then approximate only
    for pairs whose EVERY shared shingle is hotter than the cap; at
    threshold >= 0.5 such pairs are boilerplate-only matches. Pass
    ``max_shingle_df=None`` for exact semantics on bounded inputs."""

    def shingles(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        texts = batch.column(text_col).to_pylist()
        out_s: List[np.ndarray] = []
        out_d: List[np.ndarray] = []
        out_z: List[np.ndarray] = []
        for d, t in zip(ids, texts):
            h = _shingle_hashes(_tokens(t), n)
            out_s.append(h)
            out_d.append(np.full(len(h), d, dtype=np.int64))
            out_z.append(np.full(len(h), len(h), dtype=np.int64))
        s = np.concatenate(out_s) if out_s else np.empty(0, np.uint64)
        return pa.Table.from_arrays(
            [
                pa.array(s.astype(np.int64)),
                pa.array(np.concatenate(out_d) if out_d else np.empty(0, np.int64)),
                pa.array(np.concatenate(out_z) if out_z else np.empty(0, np.int64)),
            ],
            names=["sh", id_col, "sz"],
        )

    sh = ds.map_batches(shingles, batch_format="pyarrow")

    from ray.data.aggregate import Count, Max

    def pairs_of_group(group: pa.Table) -> pa.Table:
        order = np.argsort(group.column(id_col).to_numpy())
        docs = group.column(id_col).to_numpy()[order]
        sizes = group.column("sz").to_numpy()[order]
        if max_shingle_df is not None and len(docs) > max_shingle_df:
            logger.warning(
                "ngram_jaccard_pairs: dropping hot shingle with df=%d > cap %d",
                len(docs),
                max_shingle_df,
            )
            docs = docs[:0]
        if len(docs) < 2:
            return pa.Table.from_arrays(
                [pa.array([], type=pa.int64())] * 4,
                names=["a", "b", "sa", "sb"],
            )
        ai, bi = np.triu_indices(len(docs), k=1)
        return pa.Table.from_arrays(
            [
                pa.array(docs[ai]),
                pa.array(docs[bi]),
                pa.array(sizes[ai]),
                pa.array(sizes[bi]),
            ],
            names=["a", "b", "sa", "sb"],
        )

    pair_counts = (
        sh.groupby("sh")
        .map_groups(pairs_of_group, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Count(), Max("sa"), Max("sb"))
    )

    thr = threshold

    def finalize(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy()
        b = batch.column("b").to_numpy()
        inter = batch.column("count()").to_numpy().astype(np.float64)
        sa = batch.column("max(sa)").to_numpy().astype(np.float64)
        sb = batch.column("max(sb)").to_numpy().astype(np.float64)
        j = inter / (sa + sb - inter)
        keep = j >= thr
        return pa.Table.from_arrays(
            [
                pa.array(a[keep]),
                pa.array(b[keep]),
                pa.array(np.floor(j[keep] * 10000).astype(np.int64)),
            ],
            names=["doc_id_a", "doc_id_b", "jaccard_e4"],
        )

    return pair_counts.map_batches(finalize, batch_format="pyarrow")


def jaccard_join(
    left,
    right,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_df: Optional[int] = 10_000,
):
    """Cross-DATASET fuzzy join: every (left_id, right_id) pair whose
    word-``n``-gram shingle sets have Jaccard >= ``threshold``, with
    the exact similarity as ``jaccard_e4 = floor(j * 10000)``. The
    decontamination shape: ``left`` = training corpus, ``right`` =
    held-out benchmark; matched pairs name exactly which training doc
    leaks which eval doc (``contamination_check`` gives per-doc
    counts; this gives the pair evidence).

    Same shuffle skeleton as ``ngram_jaccard_pairs``: shingle both
    sides (tagged), ONE groupby(shingle) emits only CROSS-side
    candidate pairs (within-side pairs are never formed, so a
    boilerplate shingle costs df_l*df_r, not (df_l+df_r)²/2), then a
    pair-keyed aggregate counts the intersection and the Jaccard is
    finalized row-locally from the carried set sizes — no driver
    state, no size-map broadcast. ``max_shingle_df`` caps
    df_l + df_r per shingle (drop + warn) exactly like the self-join
    variant. Ids may collide across sides (they are independent
    datasets); output columns are ``left_id`` / ``right_id``.
    """
    from ray.data.aggregate import Count, Max

    def shingle_side(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            ids = batch.column(id_col).to_numpy()
            texts = batch.column(text_col).to_pylist()
            out_s: List[np.ndarray] = []
            out_d: List[np.ndarray] = []
            out_z: List[np.ndarray] = []
            for d, t in zip(ids, texts):
                h = _shingle_hashes(_tokens(t), n)
                out_s.append(h)
                out_d.append(np.full(len(h), d, dtype=np.int64))
                out_z.append(np.full(len(h), len(h), dtype=np.int64))
            s = np.concatenate(out_s) if out_s else np.empty(0, np.uint64)
            nrows = len(s)
            return pa.Table.from_arrays(
                [
                    pa.array(s.astype(np.int64)),
                    pa.array(
                        np.concatenate(out_d) if out_d else np.empty(0, np.int64)
                    ),
                    pa.array(
                        np.concatenate(out_z) if out_z else np.empty(0, np.int64)
                    ),
                    pa.array(np.full(nrows, side, dtype=np.int64)),
                ],
                names=["sh", id_col, "sz", "side"],
            )

        return fn

    sh = left.map_batches(shingle_side(0), batch_format="pyarrow").union(
        right.map_batches(shingle_side(1), batch_format="pyarrow")
    )

    def cross_pairs(group: pa.Table) -> pa.Table:
        empty = pa.Table.from_arrays(
            [pa.array([], type=pa.int64())] * 4,
            names=["a", "b", "sa", "sb"],
        )
        if max_shingle_df is not None and group.num_rows > max_shingle_df:
            logger.warning(
                "jaccard_join: dropping hot shingle with df=%d > cap %d",
                group.num_rows,
                max_shingle_df,
            )
            return empty
        sides = group.column("side").to_numpy()
        docs = group.column(id_col).to_numpy()
        sizes = group.column("sz").to_numpy()
        l = sides == 0
        dl, zl = docs[l], sizes[l]
        dr, zr = docs[~l], sizes[~l]
        if not len(dl) or not len(dr):
            return empty
        ai, bi = np.meshgrid(np.arange(len(dl)), np.arange(len(dr)), indexing="ij")
        ai, bi = ai.ravel(), bi.ravel()
        return pa.Table.from_arrays(
            [
                pa.array(dl[ai]),
                pa.array(dr[bi]),
                pa.array(zl[ai]),
                pa.array(zr[bi]),
            ],
            names=["a", "b", "sa", "sb"],
        )

    pair_counts = (
        sh.groupby("sh")
        .map_groups(cross_pairs, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Count(), Max("sa"), Max("sb"))
    )

    thr = threshold

    def finalize(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy()
        b = batch.column("b").to_numpy()
        inter = batch.column("count()").to_numpy().astype(np.float64)
        sa = batch.column("max(sa)").to_numpy().astype(np.float64)
        sb = batch.column("max(sb)").to_numpy().astype(np.float64)
        j = inter / (sa + sb - inter)
        keep = j >= thr
        return pa.Table.from_arrays(
            [
                pa.array(a[keep]),
                pa.array(b[keep]),
                pa.array(np.floor(j[keep] * 10000).astype(np.int64)),
            ],
            names=["left_id", "right_id", "jaccard_e4"],
        )

    return pair_counts.map_batches(finalize, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _perm_params(num_perm: int, seed: int = 1) -> Tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(_MERSENNE), size=num_perm, dtype=np.uint64)
    b = rng.integers(0, int(_MERSENNE), size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(shingle_hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """num_perm minimums of (a*x + b) mod 2^61-1 — vectorized
    [num_perm, n_shingles] in one numpy pass."""
    if len(shingle_hashes) == 0:
        return np.full(len(a), int(_MERSENNE), dtype=np.uint64)
    x = shingle_hashes[None, :] & _MERSENNE
    v = (a[:, None] * x + b[:, None]) % _MERSENNE
    return v.min(axis=1)


def minhash_lsh_pairs(
    ds,
    n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    join_partitions: int = 32,
):
    """Candidate pairs via banded MinHash-LSH, verified with exact
    Jaccard over the shingle sets. Returns (doc_id_a, doc_id_b,
    jaccard_e4) for verified pairs >= threshold.

    Verification is a shuffle join: the per-doc shingle table (one
    packed-binary row per doc) is hash-joined against the candidate
    pairs on each side's doc id, then the exact Jaccard is computed
    row-locally — no whole-corpus driver map anywhere. Output is a
    subset of :func:`ngram_jaccard_pairs` (equal when LSH candidate
    recall is 1.0, which the exact operator verifies on samples)."""
    assert num_perm % bands == 0
    rows = num_perm // bands
    a, b = _perm_params(num_perm)

    def sigs(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        texts = batch.column(text_col).to_pylist()
        band_ids: List[np.ndarray] = []
        band_hash: List[np.ndarray] = []
        docs: List[np.ndarray] = []
        for d, t in zip(ids, texts):
            h = _shingle_hashes(_tokens(t), n)
            sig = minhash_signature(h, a, b)
            bh = np.fromiter(
                (
                    zlib.crc32(sig[i * rows : (i + 1) * rows].tobytes())
                    for i in range(bands)
                ),
                dtype=np.int64,
                count=bands,
            )
            band_ids.append(np.arange(bands, dtype=np.int64))
            band_hash.append(bh)
            docs.append(np.full(bands, d, dtype=np.int64))
        return pa.Table.from_arrays(
            [
                pa.array(np.concatenate(band_ids) if band_ids else np.empty(0, np.int64)),
                pa.array(np.concatenate(band_hash) if band_hash else np.empty(0, np.int64)),
                pa.array(np.concatenate(docs) if docs else np.empty(0, np.int64)),
            ],
            names=["band", "bh", id_col],
        )

    cand = (
        ds.map_batches(sigs, batch_format="pyarrow")
        .groupby(["band", "bh"])
        .map_groups(
            lambda g: _group_pairs(g, id_col),
            batch_format="pyarrow",
        )
    )
    # distinct candidate pairs
    from ray.data.aggregate import Count

    cand = (
        cand.groupby(["a", "b"])
        .aggregate(Count())
        .select_columns(["a", "b"])
    )

    # per-doc shingle sets, one packed-binary row per doc (sorted
    # uint64 hashes as raw little-endian bytes — compact through the
    # join shuffle, zero-copy decode with np.frombuffer)
    def shingle_rows(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        packed = pa.array(
            [_shingle_hashes(_tokens(t), n).tobytes() for t in texts],
            type=pa.binary(),
        )
        ids = pc.cast(batch.column(id_col), pa.int64())
        return pa.Table.from_arrays([ids, packed], names=[id_col, "sh"])

    sh_tbl = ds.map_batches(shingle_rows, batch_format="pyarrow")

    # candidate pairs ⨝ shingles (a side), then ⨝ shingles (b side);
    # safe_join: "zero candidate pairs" is a normal steady state
    pair_schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])
    sh_schema = pa.schema([(id_col, pa.int64()), ("sh", pa.binary())])
    joined = safe_join(
        cand,
        sh_tbl,
        join_type="inner",
        num_partitions=join_partitions,
        on=("a",),
        right_on=(id_col,),
        left_schema=pair_schema,
        right_schema=sh_schema,
    ).rename_columns({"sh": "sh_a"})
    joined = safe_join(
        joined,
        sh_tbl,
        join_type="inner",
        num_partitions=join_partitions,
        on=("b",),
        right_on=(id_col,),
        left_schema=pair_schema.append(pa.field("sh_a", pa.binary())),
        right_schema=sh_schema,
    ).rename_columns({"sh": "sh_b"})

    thr = threshold

    def verify(batch: pa.Table) -> pa.Table:
        a_ = batch.column("a").to_numpy()
        b_ = batch.column("b").to_numpy()
        sh_a = batch.column("sh_a").to_pylist()
        sh_b = batch.column("sh_b").to_pylist()
        out_j = np.empty(len(a_), dtype=np.float64)
        for i in range(len(a_)):
            sa = np.frombuffer(sh_a[i] or b"", dtype=np.uint64)
            sb = np.frombuffer(sh_b[i] or b"", dtype=np.uint64)
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            union = len(sa) + len(sb) - inter
            out_j[i] = inter / union if union else 0.0
        keep = out_j >= thr
        return pa.Table.from_arrays(
            [
                pa.array(a_[keep]),
                pa.array(b_[keep]),
                pa.array(np.floor(out_j[keep] * 10000).astype(np.int64)),
            ],
            names=["doc_id_a", "doc_id_b", "jaccard_e4"],
        )

    return joined.map_batches(verify, batch_format="pyarrow")


def _group_pairs(group: pa.Table, id_col: str) -> pa.Table:
    docs = np.sort(np.unique(group.column(id_col).to_numpy()))
    if len(docs) < 2:
        return pa.Table.from_arrays(
            [pa.array([], type=pa.int64())] * 2, names=["a", "b"]
        )
    ai, bi = np.triu_indices(len(docs), k=1)
    return pa.Table.from_arrays(
        [pa.array(docs[ai]), pa.array(docs[bi])], names=["a", "b"]
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(ds, text_col: str = "text", id_col: str = "doc_id"):
    """64-bit SimHash per doc over unigram token hashes (md5 low 8
    bytes — reproducible as DuckDB ``md5_number_lower``), plus 4x16-bit
    band keys for hamming-neighborhood bucketing. Deterministic and
    SQL-expressible: fingerprint bit b is set iff
    sum_tokens(2*bit_b(md5_low64(tok)) - 1) >= 0, counted WITH token
    multiplicity."""

    def sim(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        texts = batch.column(text_col).to_pylist()
        fps = np.zeros(len(ids), dtype=np.uint64)
        tok_lists = [_tokens(t) for t in texts]
        lens = np.fromiter(
            (len(tl) for tl in tok_lists), dtype=np.int64, count=len(tok_lists)
        )
        nonempty = lens > 0
        if nonempty.any():
            # one flat bit matrix for the whole batch + segmented sums
            # (reduceat over doc boundaries): empty docs contribute no
            # tokens, so consecutive non-empty starts still delimit
            # exact per-doc segments.
            flat = [w for tl in tok_lists for w in tl]
            hs = _md5_low64_many(flat)
            # unpackbits on the little-endian byte view is ~30x faster
            # than a broadcast uint64 shift; laid out (64, n_tokens) so
            # the segmented sum runs along the contiguous axis
            # (reduceat axis=1 measures ~9x faster than axis=0 on the
            # row-major layout), widened into a kept-alive int64
            # scratch (uint8 would overflow on >255-token docs; fresh
            # multi-MB allocs fault 4ms -> 140-260ms under Ray churn).
            b8 = np.unpackbits(
                np.ascontiguousarray(hs.view(np.uint8).reshape(-1, 8).T),
                axis=0,
                bitorder="little",
            )
            bits = _scratch_2d("simbits", 64, len(hs), np.int64)
            np.copyto(bits, b8)
            offsets = np.zeros(len(lens) + 1, dtype=np.int64)
            np.cumsum(lens, out=offsets[1:])
            starts = offsets[:-1][nonempty]
            ones = np.add.reduceat(bits, starts, axis=1)
            # bit b set iff sum(2*bit_b - 1) >= 0  <=>  2*ones >= n
            mask = (2 * ones >= lens[None, nonempty]).astype(np.uint64)
            weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
            fps[nonempty] = (mask * weights[:, None]).sum(axis=0, dtype=np.uint64)
        arrs = [pa.array(ids), pa.array(fps.astype(np.int64))]
        names = [id_col, "simhash"]
        for band in range(4):
            arrs.append(
                pa.array(((fps >> np.uint64(band * 16)) & np.uint64(0xFFFF)).astype(np.int64))
            )
            names.append(f"band{band}")
        return pa.Table.from_arrays(arrs, names=names)

    return ds.map_batches(sim, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------


def embedding_near_dup(
    ds,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_id: Optional[int] = None,
    method: str = "exact",
    block_rows: int = 8192,
    n_tables: int = 16,
    n_bits: int = 6,
    seed: int = 11,
):
    """Embedding-cosine near-duplicate pairs: all (a < b) with
    cosine(v_a, v_b) >= threshold, sim as floor(sim*10000) int64 for
    exact SQL-oracle hashing.

    ``method='exact'``: the (optionally id-bounded) table is
    materialized into the OBJECT STORE as ~``block_rows``-row blocks;
    one Ray task per block pair (i <= j) computes the cross-block
    matmul. The driver holds only block refs — no ``take_all``. O(n²)
    compute is inherent to the exact semantics; use 'lsh' beyond
    ~10^6 vectors.

    ``method='lsh'``: random-hyperplane band keys per vector (any of
    ``n_tables`` tables); groupby(table, key) -> in-bucket pairwise
    exact cosine -> distinct. Fully streaming, scales to 10^9+
    vectors; recall < 1 possible (collision prob per table =
    (1 - theta/pi)^n_bits) — the exact path doubles as its oracle on
    samples.
    """
    import pyarrow.compute as pc

    base = ds
    if max_id is not None:
        bound = max_id

        def _bound(b: pa.Table) -> pa.Table:
            return b.filter(pc.less(b.column(id_col), bound))

        base = base.map_batches(_bound, batch_format="pyarrow")
    base = base.select_columns([id_col, vec_col])
    if method == "exact":
        return _near_dup_exact(base, threshold, id_col, vec_col, block_rows)
    if method == "lsh":
        return _near_dup_lsh(
            base, threshold, id_col, vec_col, n_tables, n_bits, seed
        )
    raise ValueError(f"unknown method {method!r} (expected 'exact' or 'lsh')")


def _block_id_vecs(t: pa.Table, id_col: str, vec_col: str):
    ids = t.column(id_col).to_numpy()
    m = np.asarray(t.column(vec_col).to_pylist(), dtype=np.float64)
    if m.size == 0:
        return ids, np.empty((0, 1), dtype=np.float64)
    m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    return ids, m


def _pair_table(a: np.ndarray, b: np.ndarray, s: np.ndarray) -> pa.Table:
    mask = a < b  # each unordered pair once, no self-pairs
    return pa.Table.from_arrays(
        [
            pa.array(a[mask]),
            pa.array(b[mask]),
            pa.array(np.floor(s[mask] * 10000).astype(np.int64)),
        ],
        names=["vec_id_a", "vec_id_b", "sim_e4"],
    )


#: 'exact' is O((n/block_rows)^2) block-pair tasks — above this row
#: count the task count alone is in the tens of thousands and 'lsh'
#: is the intended path; the guard makes the cliff loud, not silent.
EXACT_NEAR_DUP_MAX_ROWS = 2_000_000


def _near_dup_exact(base, threshold: float, id_col: str, vec_col: str, block_rows: int):
    """Distributed exact all-pairs: block-pair cross tasks over object
    store refs. Results come back as a Dataset via from_arrow_refs
    (never gathered to the driver)."""
    import ray
    import ray.data

    mat = base.materialize()
    n = mat.count()
    if n == 0:
        # an empty corpus repartitions to zero-column blocks whose
        # arrow refs lack the id/vec fields — return no pairs directly
        return ray.data.from_arrow(
            _pair_table(
                np.empty(0, np.int64),
                np.empty(0, np.int64),
                np.empty(0, np.float64),
            )
        )
    if n > EXACT_NEAR_DUP_MAX_ROWS:
        raise ValueError(
            f"embedding_near_dup(method='exact') on {n} rows would "
            f"schedule ~{math.ceil(n / block_rows) ** 2 // 2} block-pair "
            "tasks; use method='lsh' (streaming, scales to 10^9+) or "
            "raise ops.dedup.EXACT_NEAR_DUP_MAX_ROWS explicitly"
        )
    num_blocks = max(1, math.ceil(n / block_rows))
    refs = list(mat.repartition(num_blocks).materialize().to_arrow_refs())
    thr = threshold

    @ray.remote
    def block_pair(ti: pa.Table, tj: pa.Table, same: bool) -> pa.Table:
        ids_i, mi = _block_id_vecs(ti, id_col, vec_col)
        ids_j, mj = _block_id_vecs(tj, id_col, vec_col)
        if not len(ids_i) or not len(ids_j):
            return _pair_table(
                np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.float64)
            )
        sims = mi @ mj.T
        bi, bj = np.nonzero(sims >= thr)
        a, b = ids_i[bi], ids_j[bj]
        if not same:
            # blocks aren't id-ordered: normalize so the smaller id is
            # always 'a' (same-block pairs appear twice in the symmetric
            # sims matrix, so there the a<b mask alone dedups them)
            a, b = np.minimum(a, b), np.maximum(a, b)
        return _pair_table(a, b, sims[bi, bj])

    out_refs = []
    for i in range(len(refs)):
        for j in range(i, len(refs)):
            out_refs.append(block_pair.remote(refs[i], refs[j], i == j))
    return ray.data.from_arrow_refs(out_refs)


def _near_dup_lsh(
    base, threshold: float, id_col: str, vec_col: str,
    n_tables: int, n_bits: int, seed: int,
):
    """Streaming near-dup: per-vector band keys (one row per table),
    groupby(table, key), in-bucket pairwise exact cosine, distinct
    via a (a, b) groupby. The bucket groupby is the only shuffle and
    moves (table, key, id, vec) rows."""
    powers = 1 << np.arange(n_bits, dtype=np.int64)
    planes: Optional[np.ndarray] = None
    thr = threshold

    def keys(batch: pa.Table) -> pa.Table:
        nonlocal planes
        ids, m = _block_id_vecs(batch, id_col, vec_col)
        if planes is None:
            # dim discovered from the first batch; rng is seeded so
            # every task draws identical planes
            r = np.random.default_rng(seed)
            planes = r.standard_normal((n_tables, n_bits, m.shape[1]))
        out_t, out_k, out_i, out_v = [], [], [], []
        for t in range(n_tables):
            sig = ((m @ planes[t].T) > 0) @ powers
            out_t.append(np.full(len(ids), t, dtype=np.int64))
            out_k.append(sig.astype(np.int64))
            out_i.append(ids)
            out_v.append(batch.column(vec_col))
        return pa.Table.from_arrays(
            [
                pa.array(np.concatenate(out_t)),
                pa.array(np.concatenate(out_k)),
                pa.array(np.concatenate(out_i)),
                pa.concat_arrays(
                    [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in out_v]
                ),
            ],
            names=["tbl", "key", id_col, vec_col],
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids, m = _block_id_vecs(group, id_col, vec_col)
        if len(ids) < 2:
            return _pair_table(
                np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.float64)
            )
        sims = m @ m.T
        bi, bj = np.nonzero(sims >= thr)
        return _pair_table(ids[bi], ids[bj], sims[bi, bj])

    from ray.data.aggregate import Max

    pairs = (
        base.map_batches(keys, batch_format="pyarrow")
        .groupby(["tbl", "key"])
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )
    # distinct across tables (sim identical wherever the pair appears)
    return (
        pairs.groupby(["vec_id_a", "vec_id_b"])
        .aggregate(Max("sim_e4"))
        .rename_columns({"max(sim_e4)": "sim_e4"})
    )


_LINE_LIM = 1 << 20  # max lines per doc (packed-key radix)


def dedup_lines(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
):
    """C4-style line-level dedup (Raffel et al. 2020 §2.2 "we
    discarded all but one of any three-sentence span occurring more
    than once", here at line granularity): keep only the globally
    FIRST occurrence of every distinct line — first = smallest
    (doc_id, line_idx) — and re-emit each doc with its surviving
    lines in original order. Docs whose every line loses are dropped
    (the SQL GROUP BY drops them the same way).

    Returns a Dataset of (id_col, text_col). Line identity is the
    sha1 of the exact line string (the :func:`exact_dedup`
    convention; collision odds are negligible and the SQL oracle
    groups by the line text itself).

    Scale shape — the corpus text crosses exactly ONE all-to-all
    exchange; the line-identity traffic is 28 bytes/line:
      1. explode pass A (vectorized split): (h = sha1(line),
         packed = doc_id * 2^20 + line_idx) -> groupby(h) ->
         min(packed) = the winner of every distinct line;
      2. explode pass B re-derives the same rows and inner-joins the
         winners on h (per-key traffic: group size, no driver set);
         rows with packed != winner are the removals (doc_id,
         line_idx);
      3. removals + original docs co-group on doc_id (the
         tag-union-groupby pattern — robust to the zero-column empty
         blocks Ray aggregates emit); each group drops its removed
         line indices locally and rejoins with ``sep``.
    Docs need < 2^20 lines and doc_id < 2^43 (packed int64); both
    validated. A broadcast fast path (ship the removal set via
    ray.put when it is small) would skip shuffle 3's text exchange —
    the join path is the default because removal volume is unbounded
    on duplicate-heavy web corpora.
    """
    import ray
    from ray.data.aggregate import Min

    n_cpus = int(ray.cluster_resources().get("CPU", 4))
    n_parts = max(4, n_cpus)

    def explode(batch: pa.Table) -> pa.Table:
        col = pc.cast(batch.column(text_col), pa.string())
        split = pc.split_pattern(col, sep).combine_chunks()
        flat = pc.list_flatten(split)
        parent = pc.list_parent_indices(split).to_numpy(
            zero_copy_only=False
        )
        off = split.offsets.to_numpy(zero_copy_only=False)
        counts = np.diff(off)
        if counts.size and counts.max() >= _LINE_LIM:
            raise ValueError(
                f"doc with >= {_LINE_LIM} lines; repack or raise _LINE_LIM"
            )
        idx = np.arange(len(flat), dtype=np.int64) - np.repeat(
            off[:-1].astype(np.int64), counts
        )
        docs = batch.column(id_col).to_numpy().astype(np.int64)
        if docs.size and docs.max() >= (1 << 43):
            raise ValueError("doc_id >= 2^43 overflows the packed key")
        packed = docs[parent] * np.int64(_LINE_LIM) + idx
        hashes = pa.array(
            [hashlib.sha1(s.encode()).digest() for s in flat.to_pylist()],
            type=pa.binary(),
        )
        return pa.Table.from_arrays(
            [hashes, pa.array(packed)], names=["h", "packed"]
        )

    exploded = ds.map_batches(explode, batch_format="pyarrow")
    winners = (
        exploded.groupby("h")
        .aggregate(Min("packed", alias_name="keep_packed"))
        .repartition(n_parts)  # drop empty zero-column agg blocks pre-join
    )
    def losers_only(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.not_equal(batch.column("packed"), batch.column("keep_packed"))
        )

    removals = safe_join(
        ds.map_batches(explode, batch_format="pyarrow"),
        winners,
        join_type="inner",
        num_partitions=n_parts,
        on=("h",),
        left_schema=pa.schema([("h", pa.binary()), ("packed", pa.int64())]),
        right_schema=pa.schema(
            [("h", pa.binary()), ("keep_packed", pa.int64())]
        ),
    ).map_batches(losers_only, batch_format="pyarrow")

    def tag_rem(batch: pa.Table) -> pa.Table:
        packed = batch.column("packed").to_numpy()
        return pa.Table.from_arrays(
            [
                pa.array(packed // _LINE_LIM),
                pa.array(packed % _LINE_LIM),
                pa.nulls(batch.num_rows, type=pa.string()),
            ],
            names=[id_col, "line_idx", text_col],
        )

    def tag_doc(batch: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                pc.cast(batch.column(id_col), pa.int64()),
                pa.array(np.full(batch.num_rows, -1, dtype=np.int64)),
                pc.cast(batch.column(text_col), pa.string()),
            ],
            names=[id_col, "line_idx", text_col],
        )

    def strip(group: pa.Table) -> pa.Table:
        li = group.column("line_idx").to_numpy(zero_copy_only=False)
        doc_rows = np.flatnonzero(li == -1)
        if len(doc_rows) != 1:  # removal rows for a doc absent from ds
            return pa.Table.from_arrays(
                [
                    pa.array([], type=pa.int64()),
                    pa.array([], type=pa.string()),
                ],
                names=[id_col, text_col],
            )
        text = group.column(text_col)[doc_rows[0]].as_py() or ""
        drop = set(li[li >= 0].tolist())
        lines = [
            s for i, s in enumerate(text.split(sep)) if i not in drop
        ]
        if not lines:
            return pa.Table.from_arrays(
                [
                    pa.array([], type=pa.int64()),
                    pa.array([], type=pa.string()),
                ],
                names=[id_col, text_col],
            )
        return pa.Table.from_arrays(
            [
                pa.array([group.column(id_col)[0].as_py()], type=pa.int64()),
                pa.array([sep.join(lines)], type=pa.string()),
            ],
            names=[id_col, text_col],
        )

    return (
        ds.map_batches(tag_doc, batch_format="pyarrow")
        .union(removals.map_batches(tag_rem, batch_format="pyarrow"))
        .groupby(id_col)
        .map_groups(strip, batch_format="pyarrow")
    )


def exact_substring_dedup(
    ds,
    window: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """ExactSubstr-style dedup (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better"), token-aligned:
    every ``window``-token span whose content occurs more than once
    in the corpus is cut from every NON-FIRST occurrence (first =
    smallest (doc_id, start)); overlapping cuts merge via a coverage
    diff-array, surviving tokens re-join with single spaces (output
    text is whitespace-normalized). Docs shorter than ``window``
    tokens pass through; docs with every token covered drop.

    Span identity is the polynomial rolling hash (base 1000003 mod
    2^61-1) over md5-low64 token hashes — the
    :func:`~retriv_ray.ops.textstats.doc_fingerprint` convention, so
    a SQL oracle reproduces identities bit-exactly (HUGEINT
    sum-of-products). Distinct spans colliding under the 61-bit hash
    would be wrongly cut; at 10^12 windows the expected collision
    count is ~10^6 windows == ~10^-6 of the corpus (the paper's
    suffix-array tool is exact; the hash form is the standard
    distributed compromise).

    Scale shape (== :func:`dedup_lines`): span identity moves as
    16-byte (h, doc*2^20+start) rows through one groupby(h)
    min-packed pass and one join-back; the corpus text crosses
    exactly one doc-keyed co-group exchange. Hash computation is a
    per-doc rolling loop over Python ints (mod-mul on 61-bit values
    overflows uint64; a vectorized 128-bit split-multiply is the
    known upgrade if the map wall ever shows here)."""
    import ray
    from ray.data.aggregate import Min

    n_cpus = int(ray.cluster_resources().get("CPU", 4))
    n_parts = max(4, n_cpus)
    P = (1 << 61) - 1
    BASE = 1000003
    TOP = pow(BASE, window, P)

    def windows(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        docs = batch.column(id_col).to_numpy().astype(np.int64)
        if docs.size and docs.max() >= (1 << 43):
            raise ValueError("doc_id >= 2^43 overflows the packed key")
        h_out: List[int] = []
        p_out: List[int] = []
        for d, t in zip(docs.tolist(), texts):
            toks = (t or "").split()
            if len(toks) < window:
                continue
            if len(toks) >= _LINE_LIM:
                raise ValueError(
                    f"doc with >= {_LINE_LIM} tokens; raise _LINE_LIM"
                )
            vals = (_md5_low64_many(toks) % np.uint64(P)).tolist()
            h = 0
            base_packed = d * _LINE_LIM
            for j, x in enumerate(vals):
                h = (h * BASE + x) % P
                if j >= window:
                    h = (h - vals[j - window] * TOP) % P
                if j >= window - 1:
                    h_out.append(h)
                    p_out.append(base_packed + j - window + 1)
        return pa.Table.from_arrays(
            [
                pa.array(np.asarray(h_out, dtype=np.int64)),
                pa.array(np.asarray(p_out, dtype=np.int64)),
            ],
            names=["h", "packed"],
        )

    winners = (
        ds.map_batches(windows, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Min("packed", alias_name="keep_packed"))
        .repartition(n_parts)  # drop empty zero-column agg blocks pre-join
    )

    def losers_only(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.not_equal(batch.column("packed"), batch.column("keep_packed"))
        )

    removals = safe_join(
        ds.map_batches(windows, batch_format="pyarrow"),
        winners,
        join_type="inner",
        num_partitions=n_parts,
        on=("h",),
        left_schema=pa.schema([("h", pa.int64()), ("packed", pa.int64())]),
        right_schema=pa.schema(
            [("h", pa.int64()), ("keep_packed", pa.int64())]
        ),
    ).map_batches(losers_only, batch_format="pyarrow")

    def tag_rem(batch: pa.Table) -> pa.Table:
        packed = batch.column("packed").to_numpy()
        return pa.Table.from_arrays(
            [
                pa.array(packed // _LINE_LIM),
                pa.array(packed % _LINE_LIM),
                pa.nulls(batch.num_rows, type=pa.string()),
            ],
            names=[id_col, "start", text_col],
        )

    def tag_doc(batch: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                pc.cast(batch.column(id_col), pa.int64()),
                pa.array(np.full(batch.num_rows, -1, dtype=np.int64)),
                pc.cast(batch.column(text_col), pa.string()),
            ],
            names=[id_col, "start", text_col],
        )

    def strip(group: pa.Table) -> pa.Table:
        empty = pa.Table.from_arrays(
            [pa.array([], type=pa.int64()), pa.array([], type=pa.string())],
            names=[id_col, text_col],
        )
        st = group.column("start").to_numpy(zero_copy_only=False)
        doc_rows = np.flatnonzero(st == -1)
        if len(doc_rows) != 1:
            return empty
        toks = (group.column(text_col)[doc_rows[0]].as_py() or "").split()
        starts = st[st >= 0]
        if len(starts):
            diff = np.zeros(len(toks) + 1, dtype=np.int64)
            np.add.at(diff, starts, 1)
            np.add.at(diff, np.minimum(starts + window, len(toks)), -1)
            covered = np.cumsum(diff[:-1]) > 0
            toks = [t for t, c in zip(toks, covered) if not c]
        if not toks:
            return empty
        return pa.Table.from_arrays(
            [
                pa.array(
                    [group.column(id_col)[0].as_py()], type=pa.int64()
                ),
                pa.array([" ".join(toks)], type=pa.string()),
            ],
            names=[id_col, text_col],
        )

    return (
        ds.map_batches(tag_doc, batch_format="pyarrow")
        .union(removals.map_batches(tag_rem, batch_format="pyarrow"))
        .groupby(id_col)
        .map_groups(strip, batch_format="pyarrow")
    )


def dedup_filter(ds, pairs, id_col: str = "doc_id"):
    """Materialize the DEDUPLICATED corpus from a near-dup pairs
    table: every ``doc_id_b`` of an (a < b) pair is dropped, keeping
    the lowest-id representative of each pairwise-connected pair (the
    standard greedy policy; full transitive clustering needs iterative
    label propagation and rarely changes training-corpus composition).

    Scale shape: a distributed LEFT OUTER join of the corpus against
    the (tiny relative to the corpus) pairs table + null filter — a
    left anti-join without ever collecting the drop set on the
    driver. No distinct pass is needed: a doc matched by several
    pairs joins to several rows, all of which the null filter drops.
    """
    import ray

    n_cpus = int(ray.cluster_resources().get("CPU", 4))
    # repartition the (corpus-small) pairs side before the join: Ray
    # Data passes EMPTY blocks through map_batches untouched, so an
    # upstream aggregate's zero-column empty blocks would otherwise
    # reach pyarrow's join and fail schema resolution; the coalesce
    # also right-sizes the build side's partitions.
    marked = (
        pairs.select_columns(["doc_id_b", "doc_id_a"])
        .repartition(max(4, n_cpus))
    )
    # safe_join: "zero duplicate pairs" must yield the corpus unchanged,
    # not an empty-side join crash (pair ids are int64 by the pair-op
    # contract)
    joined = safe_join(
        ds,
        marked,
        join_type="left_outer",
        num_partitions=max(4, n_cpus),
        on=(id_col,),
        right_on=("doc_id_b",),
        right_schema=pa.schema(
            [("doc_id_b", pa.int64()), ("doc_id_a", pa.int64())]
        ),
    )

    def keep_unmatched(batch: pa.Table) -> pa.Table:
        out = batch.filter(pc.is_null(batch.column("doc_id_a")))
        drop = [c for c in ("doc_id_a", "doc_id_b") if c in out.column_names]
        return out.drop_columns(drop)

    return joined.map_batches(keep_unmatched, batch_format="pyarrow")


def cluster_dedup_filter(ds, clusters, id_col: str = "doc_id"):
    """Materialize the TRANSITIVELY deduplicated corpus: keep only
    each cluster's canonical (minimum-id) member. ``clusters`` is the
    (doc_id, cluster_id) output of :func:`dedup_clusters` /
    :func:`connected_components` — unlike :func:`dedup_filter`'s
    pairwise-greedy policy, chains A~B~C collapse to one survivor
    even when A and C never formed a direct pair.

    Scale shape: the loser set (rows with doc_id != cluster_id)
    ships through a distributed LEFT OUTER join + null filter — the
    dedup_filter anti-join; nothing gathers on the driver."""
    import ray

    n_cpus = int(ray.cluster_resources().get("CPU", 4))

    def losers(batch: pa.Table) -> pa.Table:
        keep = pc.not_equal(
            batch.column(id_col), batch.column("cluster_id")
        )
        out = batch.filter(keep)
        # the join key itself may be coalesced away by the join; a
        # sibling marker column survives to flag matched rows (the
        # dedup_filter doc_id_a pattern)
        return pa.Table.from_arrays(
            [
                out.column(id_col),
                pa.array(np.ones(out.num_rows, dtype=np.int8)),
            ],
            names=["drop_id", "_dropmark"],
        )

    marked = clusters.map_batches(
        losers, batch_format="pyarrow"
    ).repartition(max(4, n_cpus))
    # safe_join: an all-singleton clustering has zero losers — the
    # empty right side must pass the corpus through unchanged
    joined = safe_join(
        ds,
        marked,
        join_type="left_outer",
        num_partitions=max(4, n_cpus),
        on=(id_col,),
        right_on=("drop_id",),
        right_schema=pa.schema(
            [("drop_id", pa.int64()), ("_dropmark", pa.int8())]
        ),
    )

    def keep_unmatched(batch: pa.Table) -> pa.Table:
        out = batch.filter(pc.is_null(batch.column("_dropmark")))
        drop = [
            c for c in ("drop_id", "_dropmark") if c in out.column_names
        ]
        return out.drop_columns(drop)

    return joined.map_batches(keep_unmatched, batch_format="pyarrow")


def duplicate_window_stats(
    ds,
    window: int = 50,
    stride: int = 25,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Exact substring-duplication stats (the windowed form of
    Lee et al. 2022's "Deduplicating Training Data Makes Language
    Models Better" exact-substring pass): per document, the number of
    ``window``-token windows sampled at ``stride`` and how many of
    them occur — verbatim — at two or more (doc, position) sites
    corpus-wide. Documents shorter than ``window`` tokens emit no row.

    Scale plan: windows are md5-low64 hashed at the map side (8 bytes
    + doc_id per window cross the wire, never the window text), one
    groupby(hash) counts each window's global multiplicity and emits
    per-occurrence (doc_id, dup) flags locally, and a doc-keyed sum
    produces (doc_id, n_windows, dup_windows). No driver state, no
    broadcast; 2^-64 hash-collision odds stand in for the verify pass
    (the SQL oracle groups by the verbatim window text, so a collision
    would surface as a mismatch)."""
    from retriv_ray.ops.prep import _md5_low64

    from ray.data.aggregate import Sum

    def windows(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        out_h, out_d = [], []
        for i, t in enumerate(batch.column(text_col).to_pylist()):
            toks = (t or "").split()
            if len(toks) < window:
                continue
            grams = [
                " ".join(toks[j : j + window])
                for j in range(0, len(toks) - window + 1, stride)
            ]
            out_h.append(_md5_low64(grams).astype(np.int64))
            out_d.append(np.full(len(grams), ids[i], dtype=np.int64))
        if not out_h:
            return pa.Table.from_arrays(
                [pa.array([], type=pa.int64()), pa.array([], type=pa.int64())],
                names=["h", id_col],
            )
        return pa.Table.from_arrays(
            [
                pa.array(np.concatenate(out_h)),
                pa.array(np.concatenate(out_d)),
            ],
            names=["h", id_col],
        )

    def flag(group: pa.Table) -> pa.Table:
        dup = 1 if group.num_rows > 1 else 0
        return pa.Table.from_arrays(
            [
                group.column(id_col),
                pa.array(np.ones(group.num_rows, dtype=np.int64)),
                pa.array(np.full(group.num_rows, dup, dtype=np.int64)),
            ],
            names=[id_col, "w", "dup"],
        )

    return (
        ds.map_batches(windows, batch_format="pyarrow")
        .groupby("h")
        .map_groups(flag, batch_format="pyarrow")
        .groupby(id_col)
        .aggregate(
            Sum("w", alias_name="n_windows"),
            Sum("dup", alias_name="dup_windows"),
        )
    )


# ---------------------------------------------------------------------------
# connected components / duplicate clustering
# ---------------------------------------------------------------------------


def connected_components(
    memb,
    id_col: str = "doc_id",
    key_col: str = "k",
    max_iters: int = 64,
):
    """Connected components of the bipartite id-key graph: two ids are
    connected when they share any key. Returns a Dataset with columns
    ``(id_col, cluster_id)`` where ``cluster_id`` is the MINIMUM id in
    the component (deterministic canonical representative).

    This is the standard scalable entity-resolution / dedup-clustering
    primitive (Hash-to-Min-style label propagation): iterate
    ``label(key) := min label of member ids`` then ``label(id) := min
    label over its keys``, which strictly decreases labels until the
    fixpoint. Each round is TWO hash shuffles of the (id, key, label)
    membership rows — never the payload, never an explicit edge list
    (a blocking key with g members would otherwise expand to g²
    edges). Rounds needed = O(component diameter in key-hops); the
    driver holds only the changed-row counter. At 100 TB the
    membership table is O(#docs × #key-families) rows of ~24 bytes.
    """
    import pyarrow.compute as _pc
    from ray.data.aggregate import Min, Sum

    def init(batch: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [batch.column(id_col), batch.column(key_col),
             batch.column(id_col)],
            names=[id_col, key_col, "label"],
        )

    m = memb.map_batches(init, batch_format="pyarrow").materialize()

    def snapshot(batch: pa.Table) -> pa.Table:
        # (re)set prev := label at the top of each round; the final
        # aggregate ignores prev, so it is never dropped mid-loop
        # (dropping would cost an extra full materialization per round)
        if "prev" in batch.column_names:
            batch = batch.drop_columns(["prev"])
        return batch.append_column("prev", batch.column("label"))

    def group_min(col_keep):
        def fn(group: pa.Table) -> pa.Table:
            lab = _pc.min(group.column("label"))
            n = group.num_rows
            return pa.Table.from_arrays(
                [group.column(id_col), group.column(key_col),
                 pa.array(np.full(n, lab.as_py(), dtype=np.int64)),
                 group.column("prev")],
                names=[id_col, key_col, "label", "prev"],
            )
        return fn

    def flag(batch: pa.Table) -> pa.Table:
        chg = _pc.cast(
            _pc.not_equal(batch.column("label"), batch.column("prev")),
            pa.int64(),
        )
        return pa.Table.from_arrays([chg], names=["chg"])

    for _ in range(max_iters):
        m = (
            m.map_batches(snapshot, batch_format="pyarrow")
            .groupby(key_col)
            .map_groups(group_min(key_col), batch_format="pyarrow")
            .groupby(id_col)
            .map_groups(group_min(id_col), batch_format="pyarrow")
            .materialize()
        )
        changed = (
            m.map_batches(flag, batch_format="pyarrow").sum("chg") or 0
        )
        if changed == 0:
            break
    else:
        logger.warning(
            "connected_components: no fixpoint after %d rounds "
            "(component diameter exceeds the cap); labels are an "
            "upper bound", max_iters,
        )

    return (
        m.groupby(id_col)
        .aggregate(Min("label", alias_name="cluster_id"))
    )


def dedup_clusters(
    ds,
    id_col: str = "doc_id",
    lang_bucket: int = 8,
    source_bucket: int = 12,
    max_iters: int = 64,
):
    """Duplicate clusters over the documents table via two blocking
    keys — (lang, n_chars//lang_bucket) and (source,
    n_chars//source_bucket) — merged transitively with
    :func:`connected_components` (a doc pair in the same cluster may
    share NO key directly; the chain runs through intermediates,
    which is exactly what pairwise dedup misses). Returns
    ``(doc_id, cluster_id)``, cluster_id = min doc_id in the cluster.

    SQL oracle: the same membership + recursive CTE label spread
    (see ``oracle_sql()['dedup_clusters']``).
    """

    def membership(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).combine_chunks()
        n_chars = batch.column("n_chars")
        # integer division == floor for the positive n_chars, matching
        # SQL's // in the oracle
        b1 = pc.cast(pc.divide(n_chars, lang_bucket), pa.string())
        b2 = pc.cast(pc.divide(n_chars, source_bucket), pa.string())
        prefix_a = pa.array(["a"] * batch.num_rows)
        prefix_b = pa.array(["b"] * batch.num_rows)
        k1 = pc.binary_join_element_wise(
            prefix_a, pc.cast(batch.column("lang"), pa.string()), b1, "#"
        )
        k2 = pc.binary_join_element_wise(
            prefix_b, pc.cast(batch.column("source"), pa.string()), b2, "#"
        )

        def _flat(arr):
            return arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr

        return pa.Table.from_arrays(
            [
                pa.concat_arrays([_flat(ids), _flat(ids)]),
                pa.concat_arrays([_flat(k1), _flat(k2)]),
            ],
            names=[id_col, "k"],
        )

    memb = ds.map_batches(membership, batch_format="pyarrow")
    return connected_components(
        memb, id_col=id_col, key_col="k", max_iters=max_iters
    )
