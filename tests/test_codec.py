"""Round-trip and merge tests for the posting codec (hypothesis)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from retriv_ray.index import codec


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=60))
@settings(max_examples=50, deadline=None)
def test_varint_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    assert np.array_equal(codec.varint_decode(codec.varint_encode(arr)), arr)


def test_varint_matches_scalar_leb128():
    def scalar_encode(vals):
        out = bytearray()
        for v in vals:
            v = int(v)
            while True:
                b = v & 0x7F
                v >>= 7
                if v:
                    out.append(b | 0x80)
                else:
                    out.append(b)
                    break
        return bytes(out)

    vals = [0, 1, 127, 128, 300, 2**14 - 1, 2**14, 2**35, 2**63 - 1]
    assert codec.varint_encode(np.array(vals, np.uint64)) == scalar_encode(vals)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**12),
            st.integers(min_value=1, max_value=10**6),
        ),
        min_size=1,
        max_size=150,
        unique_by=lambda t: t[0],
    )
)
@settings(max_examples=30, deadline=None)
def test_postings_roundtrip(pairs):
    pairs.sort()
    ids = np.array([p[0] for p in pairs], dtype=np.int64)
    tfs = np.array([p[1] for p in pairs], dtype=np.int32)
    db, tb, counts, last, max_tf, dbl, tbl = codec.encode_postings(ids, tfs)
    ids2, tfs2 = codec.decode_postings(db, tb, counts)
    assert np.array_equal(ids, ids2)
    assert np.array_equal(tfs, tfs2)
    # block metadata invariants
    starts = np.cumsum(counts) - counts
    for j, (s, c) in enumerate(zip(starts, counts)):
        assert last[j] == ids[s + c - 1]
        assert max_tf[j] == tfs[s : s + c].max()


def test_partial_concat_equals_whole():
    rng = np.random.RandomState(7)
    ids = np.unique(rng.randint(0, 10**9, size=1100)).astype(np.int64)[:1000]
    tfs = rng.randint(1, 100, size=len(ids)).astype(np.int32)
    # split at an arbitrary doc-id boundary (salt ranges)
    cut = 537
    p1 = codec.encode_postings(ids[:cut], tfs[:cut])
    p2 = codec.encode_postings(ids[cut:], tfs[cut:])
    db, tb, counts, last, max_tf, dbl, tbl = codec.concat_partials([p1, p2])
    ids2, tfs2 = codec.decode_postings(db, tb, counts)
    assert np.array_equal(ids, ids2)
    assert np.array_equal(tfs, tfs2)


def test_compression_is_effective():
    ids = np.arange(0, 500_000, 3, dtype=np.int64)  # dense ascending
    tfs = np.ones(len(ids), dtype=np.int32)
    db, tb, counts, _, _, _, _ = codec.encode_postings(ids, tfs)
    # delta+varint: ~1 byte/doc vs 8 raw
    assert len(db) < len(ids) * 1.3
    assert len(tb) == len(ids)


def test_grouped_encode_matches_single():
    rng = np.random.RandomState(3)
    t_counts = rng.randint(1, 400, size=30)
    t_starts = np.cumsum(t_counts) - t_counts
    ids_parts, tf_parts = [], []
    for c in t_counts:
        ids_parts.append(np.unique(rng.randint(0, 10**7, size=c * 2))[:c])
        tf_parts.append(rng.randint(1, 50, size=c).astype(np.int32))
    ids = np.concatenate(ids_parts)
    tfs = np.concatenate(tf_parts)
    grouped = codec.encode_grouped_postings(ids, tfs, t_starts, t_counts)
    for i, (s, c) in enumerate(zip(t_starts, t_counts)):
        single = codec.encode_postings(ids[s : s + c], tfs[s : s + c])
        assert grouped[i][0] == single[0]
        assert grouped[i][1] == single[1]
        for j in range(2, 7):
            assert np.array_equal(grouped[i][j], single[j])


def test_block_metadata_bytes_and_selective_decode():
    rng = np.random.RandomState(11)
    ids = np.unique(rng.randint(0, 10**8, size=3000)).astype(np.int64)[:2500]
    tfs = rng.randint(1, 300, size=len(ids)).astype(np.int32)
    db, tb, counts, last, max_tf, dbl, tbl = codec.encode_postings(ids, tfs)
    assert int(dbl.sum()) == len(db)
    assert int(tbl.sum()) == len(tb)
    # decode an arbitrary subset of blocks == slicing the full decode
    sel = np.array([0, 3, 4, len(counts) - 1])
    ids_sel, tfs_sel = codec.decode_blocks(db, tb, counts, dbl, tbl, sel)
    starts = np.cumsum(counts) - counts
    want_ids = np.concatenate([ids[starts[b]:starts[b]+counts[b]] for b in sel])
    want_tfs = np.concatenate([tfs[starts[b]:starts[b]+counts[b]] for b in sel])
    assert np.array_equal(ids_sel, want_ids)
    assert np.array_equal(tfs_sel, want_tfs)
