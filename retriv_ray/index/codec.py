"""Posting-list compression: delta + LEB128 varint in 128-entry blocks.

The reference keeps postings as raw ``np.int32`` arrays inside one
pickled dict (reference build_inverted_index.py:9-26,
sparse_retriever.py:124-138). At 10^12 turns that layout is the
scalability wall; we store postings as Parquet segment rows with

    doc_bytes : binary — concatenated per-block varint streams; the
                first doc_id of each block is absolute, the rest are
                deltas (ascending doc_ids -> small deltas);
    tf_bytes  : binary — plain varints;
    counts    : list<int32> — entries per block (<= BLOCK);
    last      : list<int64> — last doc_id per block (skip pointers);
    max_tf    : list<int32> — per-block tf upper bound (block-max
                metadata for score-safe WAND/MaxScore pruning; stored
                hyperparameter-free: the BM25 bound is derived from
                max_tf at query time for the active (b, k1)).

Each block is independently decodable, so partial postings built in
separate (part, salt) shuffle groups concatenate block-wise without
re-encoding (doc-id-range salts guarantee ascending order across
partials). Encode/decode are vectorized numpy (no per-value Python
loop): encode scatters the k-th byte of every value in one op per
byte position; decode classifies terminal bytes, derives per-byte
in-group positions, and reduces 7-bit groups with
``np.add.reduceat``.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

BLOCK = 128

_THRESHOLDS = [np.uint64(1) << np.uint64(7 * k) for k in range(1, 10)]


def varint_nbytes(values: np.ndarray) -> np.ndarray:
    """Per-value LEB128 byte counts (int8)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    nb = np.ones(v.shape, dtype=np.int8)
    for t in _THRESHOLDS:
        m = v >= t
        if not m.any():
            break
        nb += m
    return nb


def varint_encode(values: np.ndarray, nbytes: np.ndarray = None) -> bytes:
    """LEB128-encode a uint64 array (vectorized; minimal temporaries —
    the reduce stage is allocation-bound under concurrency)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    nb = varint_nbytes(v) if nbytes is None else nbytes
    max_nb = int(nb.max())
    if max_nb == 1:
        # fast path: every value < 128 (typical for tfs and in-block
        # deltas) — the stream IS the byte cast
        return v.astype(np.uint8).tobytes()
    offs = np.cumsum(nb, dtype=np.int64)
    total = int(offs[-1])
    offs -= nb
    out = np.zeros(total, dtype=np.uint8)
    # k=0 exists for every value
    out[offs] = (v & np.uint64(0x7F)).astype(np.uint8) | ((nb > 1).view(np.uint8) << 7)
    for k in range(1, max_nb):
        mask = nb > k
        idx = offs[mask] + k
        byte = ((v[mask] >> np.uint64(7 * k)) & np.uint64(0x7F)).astype(np.uint8)
        out[idx] = byte | ((nb[mask] - 1 > k).view(np.uint8) << 7)
    return out.tobytes()


def varint_decode(buf: bytes) -> np.ndarray:
    """Decode a LEB128 stream to a uint64 array (vectorized)."""
    u8 = np.frombuffer(buf, dtype=np.uint8)
    if u8.size == 0:
        return np.empty(0, dtype=np.uint64)
    terminal = u8 < 128
    ends = np.flatnonzero(terminal)
    starts = np.empty(len(ends), dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    gid = np.cumsum(terminal) - terminal  # group index per byte
    pos = np.arange(u8.size, dtype=np.int64) - starts[gid]
    contrib = (u8.astype(np.uint64) & np.uint64(0x7F)) << (
        np.uint64(7) * pos.astype(np.uint64)
    )
    return np.add.reduceat(contrib, starts)


def encode_postings(doc_ids: np.ndarray, tfs: np.ndarray) -> tuple:
    """Encode one term's (ascending doc_ids, tfs) into block streams.

    Returns (doc_bytes, tf_bytes, counts, last, max_tf, doc_blens,
    tf_blens). Deltas are computed within blocks only; the first entry
    of each block stays absolute so blocks decode independently (and
    partials merge by concatenation). The per-block byte lengths give
    random access for block-skipping decode (:func:`decode_blocks`).
    """
    n = len(doc_ids)
    ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    tf = np.ascontiguousarray(tfs, dtype=np.int64)
    n_blocks = (n + BLOCK - 1) // BLOCK
    starts = np.arange(n_blocks, dtype=np.int64) * BLOCK
    counts = np.minimum(starts + BLOCK, n) - starts
    ends = starts + counts
    deltas = np.empty(n, dtype=np.int64)
    deltas[0:1] = ids[0:1]
    deltas[1:] = ids[1:] - ids[:-1]
    deltas[starts] = ids[starts]  # block-first entries stay absolute
    d_nb = varint_nbytes(deltas.view(np.uint64))
    t_nb = varint_nbytes(tf.astype(np.uint64))
    doc_bytes = varint_encode(deltas.view(np.uint64), d_nb)
    tf_bytes = varint_encode(tf.astype(np.uint64), t_nb)
    d_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(d_nb, out=d_off[1:])
    t_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(t_nb, out=t_off[1:])
    last = ids[np.minimum(ends - 1, n - 1)]
    max_tf = np.maximum.reduceat(tf, starts) if n else np.empty(0, np.int64)
    return (
        doc_bytes,
        tf_bytes,
        counts.astype(np.int32),
        last.astype(np.int64),
        max_tf.astype(np.int32),
        (d_off[ends] - d_off[starts]).astype(np.int32),
        (t_off[ends] - t_off[starts]).astype(np.int32),
    )


def decode_postings(
    doc_bytes: bytes, tf_bytes: bytes, counts: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Decode block streams back to (doc_ids int64, tfs int32)."""
    deltas = varint_decode(doc_bytes).astype(np.int64)
    tfs = varint_decode(tf_bytes).astype(np.int64)
    counts = np.asarray(counts, dtype=np.int64)
    starts = np.cumsum(counts) - counts
    c = np.cumsum(deltas)
    base = (c[starts] - deltas[starts]) if len(deltas) else np.empty(0, np.int64)
    doc_ids = c - np.repeat(base, counts)
    return doc_ids, tfs.astype(np.int32)


def encode_grouped_postings(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    t_starts: np.ndarray,
    t_counts: np.ndarray,
):
    """Encode MANY terms' postings in one vectorized pass.

    ``doc_ids``/``tfs`` are the concatenated, (term, doc_id)-sorted
    pair arrays of a whole shuffle partition; ``t_starts``/``t_counts``
    delimit each term's slice. All delta/varint work happens in a
    single numpy pass over the partition; the per-term Python loop
    afterwards only slices bytes. Returns a list of per-term tuples
    ``(doc_bytes, tf_bytes, counts, last, max_tf)`` compatible with
    ``encode_postings`` output.
    """
    ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    tf = np.ascontiguousarray(tfs)
    t_starts = np.asarray(t_starts, dtype=np.int64)
    t_counts = np.asarray(t_counts, dtype=np.int64)
    n = len(ids)
    if n == 0:
        return []
    # global block structure (blocks never span terms)
    nb_t = (t_counts + BLOCK - 1) // BLOCK
    first_block = np.cumsum(nb_t) - nb_t
    total_blocks = int(nb_t.sum())
    rep_start = np.repeat(t_starts, nb_t)
    block_ord = np.arange(total_blocks, dtype=np.int64) - np.repeat(first_block, nb_t)
    b_starts = rep_start + block_ord * BLOCK
    b_ends = np.minimum(b_starts + BLOCK, np.repeat(t_starts + t_counts, nb_t))
    b_counts = b_ends - b_starts
    # deltas with absolute block-first values
    deltas = np.empty(n, dtype=np.int64)
    deltas[0] = ids[0]
    deltas[1:] = ids[1:] - ids[:-1]
    deltas[b_starts] = ids[b_starts]
    # one varint pass for the whole partition, then per-value byte
    # lengths -> per-term byte spans (nbytes computed once and shared
    # with the encoder)
    u = deltas.view(np.uint64)
    nbytes = varint_nbytes(u)
    doc_all = varint_encode(u, nbytes)
    byte_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(nbytes, out=byte_off[1:])
    ut = tf.astype(np.uint64)
    tbytes_n = varint_nbytes(ut)
    tf_all = varint_encode(ut, tbytes_n)
    tbyte_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(tbytes_n, out=tbyte_off[1:])
    # per-block metadata (incl. per-block byte lengths: the random
    # access needed to SKIP decoding pruned blocks at query time —
    # block-max WAND/MaxScore support)
    last_all = ids[b_ends - 1]
    max_tf_all = np.maximum.reduceat(tf, b_starts)
    d_blen_all = (byte_off[b_ends] - byte_off[b_starts]).astype(np.int32)
    t_blen_all = (tbyte_off[b_ends] - tbyte_off[b_starts]).astype(np.int32)
    out = []
    t_ends = t_starts + t_counts
    for i in range(len(t_starts)):
        s, e = t_starts[i], t_ends[i]
        fb, nb = first_block[i], nb_t[i]
        out.append(
            (
                doc_all[byte_off[s] : byte_off[e]],
                tf_all[tbyte_off[s] : tbyte_off[e]],
                b_counts[fb : fb + nb].astype(np.int32),
                last_all[fb : fb + nb],
                max_tf_all[fb : fb + nb].astype(np.int32),
                d_blen_all[fb : fb + nb],
                t_blen_all[fb : fb + nb],
            )
        )
    return out


def decode_blocks(
    doc_bytes: bytes,
    tf_bytes: bytes,
    counts: np.ndarray,
    doc_blens: np.ndarray,
    tf_blens: np.ndarray,
    block_sel: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray]:
    """Decode ONLY the selected blocks (sorted block indices). Block
    first-entries are absolute (encode_postings), so any subset of
    blocks decodes independently — this is what makes block-max
    pruning skip real work, not just scoring."""
    counts = np.asarray(counts, dtype=np.int64)
    d_off = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(doc_blens, out=d_off[1:])
    t_off = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(tf_blens, out=t_off[1:])
    db = b"".join(doc_bytes[d_off[b] : d_off[b + 1]] for b in block_sel)
    tb = b"".join(tf_bytes[t_off[b] : t_off[b + 1]] for b in block_sel)
    return decode_postings(db, tb, counts[block_sel])


def concat_partials(parts: list) -> tuple:
    """Merge per-salt partial encodings of one term (salt order ==
    ascending doc_id ranges): pure concatenation, no re-encoding."""
    doc_bytes = b"".join(p[0] for p in parts)
    tf_bytes = b"".join(p[1] for p in parts)
    rest = [np.concatenate([p[i] for p in parts]) for i in range(2, len(parts[0]))]
    return (doc_bytes, tf_bytes, *rest)
