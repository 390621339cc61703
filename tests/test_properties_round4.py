"""Property tests (hypothesis) for round-4 pure helpers: classic
Levenshtein parity with DuckDB, and injectivity of dataset_diff's
length-prefixed value encoding."""

import duckdb
import pyarrow as pa
import pyarrow.compute as pc
from hypothesis import given, settings
from hypothesis import strategies as st

from retriv_ray.ops.textstats import _lev

_words = st.text(alphabet="abcde|:\x1f", min_size=0, max_size=8)


@given(_words, _words)
@settings(max_examples=200, deadline=None)
def test_lev_matches_duckdb(a, b):
    want = duckdb.connect().execute(
        "SELECT levenshtein(?, ?)", [a, b]
    ).fetchone()[0]
    assert _lev(a, b, cap=20) == want


@given(_words, _words)
@settings(max_examples=200, deadline=None)
def test_lev_cap_is_exact_threshold(a, b):
    true = _lev(a, b, cap=20)
    for cap in (0, 1, 2):
        got = _lev(a, b, cap=cap)
        if true <= cap:
            assert got == true
        else:
            assert got > cap  # any value above cap means "pruned"


def _encode(values):
    """dataset_diff's length-prefixed encoding, reproduced over one
    row of string-or-null values."""
    cols = []
    for v in values:
        sc = pa.array([v], type=pa.string())
        lp = pc.binary_join_element_wise(
            pc.cast(pc.fill_null(pc.utf8_length(sc), -1), pa.string()),
            pc.fill_null(sc, ""),
            ":",
        )
        cols.append(lp)
    joined = cols[0]
    for c in cols[1:]:
        joined = pc.binary_join_element_wise(joined, c, "|")
    return joined[0].as_py()


_cell = st.one_of(st.none(), st.text(alphabet="ab|:0123", max_size=6))


@given(st.tuples(_cell, _cell), st.tuples(_cell, _cell))
@settings(max_examples=300, deadline=None)
def test_diff_encoding_injective(row_a, row_b):
    """Two 2-column rows encode equal iff they ARE equal — separators
    and null sentinels inside values cannot alias."""
    assert (_encode(row_a) == _encode(row_b)) == (row_a == row_b)
