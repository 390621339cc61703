"""Deduplication operators over a documents Dataset.

All operators take a ``ray.data.Dataset`` with at least
``(doc_id: int64, text: string)`` and are Ray-Data-first: per-batch
vectorized maps + key shuffles; nothing materializes the corpus on
the driver. Scale notes per operator.

- :func:`exact_dedup` — content-hash groupby; the shuffle moves
  (sha1, doc_id) pairs only, never the text.
- :func:`ngram_jaccard_pairs` — EXACT all-pairs Jaccard over word
  n-gram shingle sets via the inverted-pair expansion: shingle ->
  (shingle, doc) -> groupby(shingle) -> co-occurring pairs ->
  groupby(pair) count = |A ∩ B|. Pair volume is Σ_shingle df² — fine
  for moderately selective shingles; at 100 TB you cap hot shingles
  (drop shingles with df > D, a standard prefix-filter bound that
  cannot remove pairs above the threshold when D is chosen from the
  threshold) — the cap is exposed as ``max_shingle_df``.
- :func:`minhash_lsh_pairs` — MinHash signatures (vectorized over
  64 hash seeds) -> banded LSH keys -> groupby(band) -> candidate
  pairs -> exact-Jaccard verification. The scalable near-dup path:
  candidate volume is tunable via (num_perm, bands).
- :func:`simhash64` — 64-bit SimHash fingerprints per doc (hamming
  near-dup grouping via 4x16-bit band buckets).
"""

from __future__ import annotations

import hashlib
import zlib
from typing import List, Optional, Tuple

import numpy as np
import pyarrow as pa

_MERSENNE = np.uint64((1 << 61) - 1)


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
    max_shingle_df: Optional[int] = None,
):
    """All pairs (a < b) with Jaccard(shingles_a, shingles_b) >=
    threshold, plus the exact jaccard as cents (int64, floor(j*10000))
    so the result hashes exactly against a SQL oracle."""
    import ray
    import ray.data

    def shingles(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        texts = batch.column(text_col).to_pylist()
        out_s: List[np.ndarray] = []
        out_d: List[np.ndarray] = []
        for d, t in zip(ids, texts):
            h = _shingle_hashes(_tokens(t), n)
            out_s.append(h)
            out_d.append(np.full(len(h), d, dtype=np.int64))
        s = np.concatenate(out_s) if out_s else np.empty(0, np.uint64)
        return pa.Table.from_arrays(
            [
                pa.array(s.astype(np.int64)),
                pa.array(np.concatenate(out_d) if out_d else np.empty(0, np.int64)),
            ],
            names=["sh", id_col],
        )

    sh = ds.map_batches(shingles, batch_format="pyarrow")

    # per-doc shingle-set sizes (small side -> broadcast)
    from ray.data.aggregate import Count

    sizes_tbl = pa.Table.from_pandas(
        sh.groupby(id_col).aggregate(Count()).to_pandas()
    )
    size_map = dict(
        zip(
            sizes_tbl.column(id_col).to_pylist(),
            sizes_tbl.column("count()").to_pylist(),
        )
    )
    size_ref = ray.put(size_map)

    def pairs_of_group(group: pa.Table) -> pa.Table:
        docs = np.sort(group.column(id_col).to_numpy())
        if max_shingle_df is not None and len(docs) > max_shingle_df:
            docs = docs[:0]
        if len(docs) < 2:
            return pa.Table.from_arrays(
                [pa.array([], type=pa.int64())] * 2, names=["a", "b"]
            )
        ai, bi = np.triu_indices(len(docs), k=1)
        return pa.Table.from_arrays(
            [pa.array(docs[ai]), pa.array(docs[bi])], names=["a", "b"]
        )

    pair_counts = (
        sh.groupby("sh")
        .map_groups(pairs_of_group, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Count())
    )

    thr = threshold

    def finalize(batch: pa.Table) -> pa.Table:
        sizes = ray.get(size_ref)
        a = batch.column("a").to_numpy()
        b = batch.column("b").to_numpy()
        inter = batch.column("count()").to_numpy().astype(np.float64)
        sa = np.fromiter((sizes[x] for x in a), dtype=np.float64, count=len(a))
        sb = np.fromiter((sizes[x] for x in b), dtype=np.float64, count=len(b))
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
):
    """Candidate pairs via banded MinHash-LSH, verified with exact
    Jaccard over the shingle sets. Returns (doc_id_a, doc_id_b,
    jaccard_e4) for verified pairs >= threshold.

    Verification uses a broadcast {doc_id -> shingle hashes} map —
    fine up to ~1e7 docs per verification partition; the 100 TB path
    re-joins candidate pairs against the shingle table by doc_id
    instead (two more shuffles, same semantics)."""
    import ray

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

    cand = cand.groupby(["a", "b"]).aggregate(Count())

    # exact verification against broadcast shingle sets
    shingle_map = {}
    for batch in ds.map_batches(
        lambda t: pa.Table.from_arrays(
            [
                t.column(id_col),
                pa.array(
                    [
                        _shingle_hashes(_tokens(x), n).astype(np.int64)
                        for x in t.column(text_col).to_pylist()
                    ],
                    type=pa.list_(pa.int64()),
                ),
            ],
            names=[id_col, "sh"],
        ),
        batch_format="pyarrow",
    ).iter_batches(batch_format="pyarrow"):
        for d, s in zip(batch.column(id_col).to_pylist(), batch.column("sh").to_pylist()):
            shingle_map[d] = np.asarray(s, dtype=np.int64)
    sh_ref = ray.put(shingle_map)
    thr = threshold

    def verify(batch: pa.Table) -> pa.Table:
        sm = ray.get(sh_ref)
        a_ = batch.column("a").to_numpy()
        b_ = batch.column("b").to_numpy()
        out_j = np.empty(len(a_), dtype=np.float64)
        for i in range(len(a_)):
            sa, sb = sm[a_[i]], sm[b_[i]]
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

    return cand.map_batches(verify, batch_format="pyarrow")


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
    """64-bit SimHash per doc over unigram token hashes, plus 4x16-bit
    band keys for hamming-neighborhood bucketing. Deterministic."""

    def sim(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        texts = batch.column(text_col).to_pylist()
        fps = np.empty(len(ids), dtype=np.uint64)
        for i, t in enumerate(texts):
            toks = _tokens(t)
            if not toks:
                fps[i] = 0
                continue
            hs = np.fromiter(
                (
                    int.from_bytes(
                        hashlib.blake2b(w.encode(), digest_size=8).digest(), "little"
                    )
                    for w in toks
                ),
                dtype=np.uint64,
                count=len(toks),
            )
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
                np.int64
            )
            votes = (2 * bits - 1).sum(axis=0)
            fps[i] = np.packbits((votes >= 0)[::-1]).view(">u8")[0]
        arrs = [pa.array(ids), pa.array(fps.astype(np.int64))]
        names = [id_col, "simhash"]
        for band in range(4):
            arrs.append(
                pa.array(((fps >> np.uint64(band * 16)) & np.uint64(0xFFFF)).astype(np.int64))
            )
            names.append(f"band{band}")
        return pa.Table.from_arrays(arrs, names=names)

    return ds.map_batches(sim, batch_format="pyarrow")


def embedding_near_dup(
    ds,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_id: Optional[int] = None,
):
    """Embedding-cosine near-duplicate pairs: all (a < b) with
    cosine(v_a, v_b) >= threshold, sim as floor(sim*10000) int64 for
    exact SQL-oracle hashing.

    Exact path: the (optionally id-bounded) vector matrix is
    L2-normalized and broadcast once via ``ray.put``; each batch
    matmuls against it (blocked all-pairs — O(n^2) but vectorized and
    embarrassingly parallel). The 10^9-vector scale path is the
    LSH-bucketed variant (cosine_topk_lsh's bucketing with in-bucket
    pairwise), trading exactness for candidate recall; this exact
    operator doubles as its verification oracle on samples.
    """
    import ray
    import pyarrow.compute as pc

    base = ds
    if max_id is not None:
        bound = max_id

        def _bound(b: pa.Table) -> pa.Table:
            return b.filter(pc.less(b.column(id_col), bound))

        base = base.map_batches(_bound, batch_format="pyarrow")
    rows = base.select_columns([id_col, vec_col]).take_all()
    all_ids = np.asarray([r[id_col] for r in rows], dtype=np.int64)
    mat = np.asarray([r[vec_col] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    mat = mat / np.maximum(norms, 1e-12)
    ref = ray.put((all_ids, mat))
    thr = threshold

    def pairs(batch: pa.Table) -> pa.Table:
        ids_all, m_all = ray.get(ref)
        ids = batch.column(id_col).to_numpy()
        if max_id is not None:
            keep = ids < max_id
            batch = batch.filter(pa.array(keep))
            ids = ids[keep]
        if not len(ids):
            return pa.Table.from_arrays(
                [pa.array([], type=pa.int64())] * 3,
                names=["vec_id_a", "vec_id_b", "sim_e4"],
            )
        m = np.asarray(batch.column(vec_col).to_pylist(), dtype=np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = m @ m_all.T
        bi, bj = np.nonzero(sims >= thr)
        a = ids[bi]
        b = ids_all[bj]
        mask = a < b  # each unordered pair once, no self-pairs
        return pa.Table.from_arrays(
            [
                pa.array(a[mask]),
                pa.array(b[mask]),
                pa.array(np.floor(sims[bi, bj][mask] * 10000).astype(np.int64)),
            ],
            names=["vec_id_a", "vec_id_b", "sim_e4"],
        )

    return base.map_batches(pairs, batch_format="pyarrow")
