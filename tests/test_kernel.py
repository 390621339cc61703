"""Kernel unit tests.

Sorted-set-op expectations ported from reference
tests/numba_utils_test.py:18-117; top-k semantics pinned against a
direct transcription of the reference's replace-min loop
(numba_utils.py:143-158); BM25/TF-IDF float32 math cross-checked with
a scalar re-implementation, property-tested via hypothesis.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from retriv_ray.search import kernel


def _a(*xs):
    return np.array(xs, dtype=np.int64)


def test_union_sorted():
    assert np.array_equal(
        kernel.union_sorted(_a(1, 3, 4, 7), _a(1, 4, 7, 9)), _a(1, 3, 4, 7, 9)
    )


def test_union_sorted_multi():
    arrays = [_a(1, 3, 4, 7), _a(1, 4, 7, 9), _a(10, 11), _a(11, 12, 13)]
    assert np.array_equal(
        kernel.union_sorted_multi(arrays), _a(1, 3, 4, 7, 9, 10, 11, 12, 13)
    )


def test_intersect_sorted():
    assert np.array_equal(
        kernel.intersect_sorted(_a(1, 3, 4, 7), _a(1, 4, 7, 9)), _a(1, 4, 7)
    )


def test_intersect_sorted_multi():
    arrays = [_a(1, 3, 4, 7), _a(1, 4, 7, 9), _a(4, 7), _a(3, 7, 9)]
    assert np.array_equal(kernel.intersect_sorted_multi(arrays), _a(7))


def test_diff_sorted():
    assert np.array_equal(kernel.diff_sorted(_a(1, 3, 4, 7), _a(1, 4, 7, 9)), _a(3))
    assert np.array_equal(
        kernel.diff_sorted(_a(1, 3, 4, 7, 11), _a(1, 4, 7, 9)), _a(3, 11)
    )


def test_concat1d():
    arrays = [_a(1, 3, 4, 7), _a(1, 4, 7, 9), _a(10, 11), _a(11, 12, 13)]
    assert np.array_equal(
        kernel.concat1d(arrays), _a(1, 3, 4, 7, 1, 4, 7, 9, 10, 11, 11, 12, 13)
    )


def test_unsorted_top_k_reference_case():
    values, indices = kernel.unsorted_top_k(
        np.array([0.1, 0.3, 0.2, 0.4], dtype=np.float32), 2
    )
    assert set(values.tolist()) == {np.float32(0.3), np.float32(0.4)}
    assert set(indices.tolist()) == {1, 3}


def _reference_unsorted_top_k(array, k):
    """Direct transcription of numba_utils.py:143-158."""
    top_k_values = np.zeros(k, dtype=np.float32)
    top_k_indices = np.zeros(k, dtype=np.int64)
    min_value = 0.0
    min_value_idx = 0
    for i, value in enumerate(array):
        if value > min_value:
            top_k_values[min_value_idx] = value
            top_k_indices[min_value_idx] = i
            min_value_idx = top_k_values.argmin()
            min_value = top_k_values[min_value_idx]
    return top_k_values, top_k_indices


@given(
    st.lists(
        st.floats(min_value=0.0, max_value=100.0, width=32), min_size=1, max_size=50
    ),
    st.integers(min_value=1, max_value=20),
)
@settings(max_examples=200, deadline=None)
def test_unsorted_top_k_matches_reference_loop(values, k):
    arr = np.array(values, dtype=np.float32)
    v_ours, i_ours = kernel.unsorted_top_k(arr, k)
    v_ref, i_ref = _reference_unsorted_top_k(arr, k)
    # the selected score MULTISET must match the reference loop; tied
    # boundary members may legitimately differ (documented deviation)
    assert sorted(v_ours.tolist()) == sorted(v_ref.tolist())
    # and every picked index must carry its claimed value
    got = {(int(i), float(v)) for i, v in zip(i_ours, v_ours) if v > 0}
    assert all(arr[i] == v for i, v in got)


def test_unsorted_top_k_zero_padding():
    # fewer than k strictly-positive entries -> zero/index-0 padding
    # exactly like the reference's zero-initialized heap.
    arr = np.array([0.0, 0.5, 0.0], dtype=np.float32)
    values, indices = kernel.unsorted_top_k(arr, 3)
    assert values.tolist() == [0.5, 0.0, 0.0]
    assert indices.tolist() == [1, 0, 0]


def _scalar_bm25(b, k1, postings, rel, doc_count, terms):
    """Scalar float32 re-implementation (one doc at a time)."""
    out = {}
    for t in terms:
        ids, tfs = postings[t]
        df = np.float32(len(ids))
        idf = np.float32(np.log(1.0 + (((doc_count - df) + 0.5) / (df + 0.5))))
        for d, f in zip(ids, tfs):
            contrib = idf * (
                (f * (k1 + 1.0)) / (f + k1 * (1.0 - b + (b * rel[d])))
            )
            out[d] = np.float32(out.get(d, np.float32(0.0)) + contrib)
    return out


@given(st.data())
@settings(max_examples=50, deadline=None)
def test_bm25_matches_scalar_float32(data):
    rng = np.random.RandomState(data.draw(st.integers(0, 10_000)))
    doc_count = data.draw(st.integers(3, 40))
    n_terms = data.draw(st.integers(1, 5))
    doc_lens = rng.randint(1, 30, size=doc_count).astype(np.float32)
    rel = doc_lens / np.mean(doc_lens, dtype=np.float32)
    postings = {}
    for t in range(n_terms):
        df = rng.randint(1, doc_count + 1)
        ids = np.sort(rng.choice(doc_count, size=df, replace=False)).astype(np.int64)
        tfs = rng.randint(1, 5, size=df).astype(np.int32)
        postings[t] = (ids, tfs)
    b, k1 = data.draw(st.sampled_from([(0.75, 1.2), (0.5, 0.0), (0.0, 10.0), (1.0, 5.0)]))
    terms = list(range(n_terms))
    ids, scores = kernel.bm25(
        b,
        k1,
        [postings[t][1] for t in terms],
        [postings[t][0] for t in terms],
        rel,
        doc_count,
        cutoff=doc_count + 1,
    )
    expected = _scalar_bm25(b, k1, postings, rel, doc_count, terms)
    assert set(ids.tolist()) == set(expected)
    for i, s in zip(ids, scores):
        assert s == np.float32(expected[int(i)]), (i, s, expected[int(i)])


def test_and_operator_and_subset():
    postings = {
        0: (_a(0, 1, 2), np.array([1, 1, 1], np.int32)),
        1: (_a(1, 2, 3), np.array([1, 1, 1], np.int32)),
    }
    rel = np.ones(5, dtype=np.float32)
    ids, _ = kernel.bm25(
        0.75, 1.2, [postings[0][1], postings[1][1]],
        [postings[0][0], postings[1][0]], rel, 5, cutoff=10, operator="AND",
    )
    assert ids.tolist() == [1, 2]
    ids, _ = kernel.bm25(
        0.75, 1.2, [postings[0][1], postings[1][1]],
        [postings[0][0], postings[1][0]], rel, 5, cutoff=10, operator="OR",
        subset_doc_ids=_a(0, 3),
    )
    assert sorted(ids.tolist()) == [0, 3]
