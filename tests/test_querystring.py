"""Lucene-style query-string retrieval vs a brute-force Python oracle
over the same tiny corpus (boolean structure, phrase, prefix, fuzzy,
metadata field leaves; BM25-over-candidates scoring contract)."""

import math

import numpy as np
import pyarrow as pa
import pytest

from retriv_ray.config import SparseConfig
from retriv_ray.index.build import build_index
from retriv_ray.search.querystring import (
    QueryStringError,
    parse_query_string,
    query_string_search,
    query_string_table,
)
from retriv_ray.search.searcher import RaySparseRetriever

DOCS = [
    "red green blue deep",          # 0
    "red red yellow quick",         # 1
    "green yellow purple quiet",    # 2
    "blue purple deep",             # 3
    "red blue purple yellow",       # 4
    "orange quick quack",           # 5
    "deep blue deep sea",           # 6
]
LANGS = ["en", "en", "de", "de", "en", "fr", "en"]
SIZES = [10, 20, 30, 40, 50, 60, 70]


@pytest.fixture(scope="module")
def qs_env(ray_session, tmp_path_factory):
    import ray.data

    from retriv_ray.index.positional import (
        PositionalIndex,
        build_positional_index,
    )
    from retriv_ray.search.metadata import build_metadata

    tmp = tmp_path_factory.mktemp("qs_idx")
    src = str(tmp / "src")
    ray.data.from_arrow(
        pa.table(
            {
                "conv_id": [f"c{i:04d}" for i in range(len(DOCS))],
                "turn_idx": pa.array([0] * len(DOCS), type=pa.int32()),
                "text": DOCS,
            }
        )
    ).write_parquet(src)
    idx = str(tmp / "idx")
    cfg = SparseConfig(
        tokenizer="whitespace", stemmer=None, stopwords=None,
        score_dtype="float64",
    )
    build_index(src, idx, cfg, num_parts=2, resume=False)
    r = RaySparseRetriever(idx, cfg)
    build_metadata(
        ray.data.from_arrow(
            pa.table(
                {
                    "conv_id": [f"c{i:04d}" for i in range(len(DOCS))],
                    "turn_idx": pa.array([0] * len(DOCS), type=pa.int32()),
                    "lang": LANGS,
                    "n_chars": SIZES,
                }
            )
        ),
        idx,
        {"lang": "keyword", "n_chars": "number"},
    )
    pos_dir = str(tmp / "pos")
    build_positional_index(src, pos_dir, cfg, num_parts=2)
    return r, PositionalIndex(pos_dir)


# -- parser ----------------------------------------------------------------


def test_parse_precedence_or_lower_than_and():
    ast = parse_query_string("a AND b OR c")
    assert ast[0] == "or"
    assert ast[1][0] == ("and", [("term", "a"), ("term", "b")])
    assert ast[1][1] == ("term", "c")


def test_parse_adjacency_is_and():
    assert parse_query_string("a b c") == (
        "and",
        [("term", "a"), ("term", "b"), ("term", "c")],
    )


def test_parse_leaf_kinds():
    assert parse_query_string('"big data"') == ("phrase", "big data")
    assert parse_query_string("pre*") == ("prefix", "pre")
    assert parse_query_string("word~2") == ("fuzzy", "word", 2)
    assert parse_query_string("lang:en") == ("field_eq", "lang", "en")
    assert parse_query_string("n:[2 TO 6]") == ("field_range", "n", 2, 6)
    assert parse_query_string("-x") == ("not", ("term", "x"))
    assert parse_query_string("NOT x") == ("not", ("term", "x"))


def test_parse_errors():
    for bad in ["", "(a", "a)", "a AND", "OR a", "a**b", '""']:
        with pytest.raises(QueryStringError):
            parse_query_string(bad)


# -- brute-force oracle ------------------------------------------------------


def _toks(i):
    return DOCS[i].split()


def _bm25(terms, cand):
    """terms: list (all boost 1) or {term: boost}."""
    boosts = terms if isinstance(terms, dict) else {t: 1.0 for t in terms}
    n = len(DOCS)
    avgdl = sum(len(_toks(i)) for i in range(n)) / n
    k1, b = 1.2, 0.75
    out = {}
    for i in cand:
        toks = _toks(i)
        s = 0.0
        for t, bo in boosts.items():
            tf = toks.count(t)
            if tf == 0:
                continue
            df = sum(1 for j in range(n) if t in _toks(j))
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            s += bo * idf * tf * (k1 + 1) / (
                tf + k1 * (1 - b + b * len(toks) / avgdl)
            )
        if s > 0:
            out[i] = s
    return [i for i, _ in sorted(out.items(), key=lambda kv: (-kv[1], kv[0]))]


def _ids(r, got_ids):
    convs, _ = r.index.to_original_ids(got_ids)
    return [int(c[1:]) for c in convs]


CASES = [
    # (query string, candidate set, scoring terms)
    ("red", {0, 1, 4}, ["red"]),
    ("red AND blue", {0, 4}, ["red", "blue"]),
    ("red blue", {0, 4}, ["red", "blue"]),  # adjacency = AND
    ("red OR orange", {0, 1, 4, 5}, ["red", "orange"]),
    ("red AND NOT yellow", {0}, ["red"]),
    ("red -yellow", {0}, ["red"]),
    ("(red OR green) AND purple", {2, 4}, ["red", "green", "purple"]),
    ("NOT red", {2, 3, 5, 6}, []),  # no scoring terms -> empty result
    ("qu*", {1, 2, 5}, ["quack", "quick", "quiet"]),
    ("quicc~1 AND red", {1}, ["quick"]),
    ('"deep blue"', {6}, ["deep", "blue"]),
    ('"blue deep" OR orange', {0, 5, 6}, ["blue", "deep", "orange"]),
    ("lang:en AND purple", {4}, ["purple"]),
    ("n_chars:[30 TO 60] AND blue", {3, 4}, ["blue"]),
    ("lang:de OR orange", {2, 3, 5}, ["orange"]),
    ("nosuchterm AND red", set(), []),
]


@pytest.mark.parametrize("qs,cand,terms", CASES)
def test_query_string_matches_brute_force(qs_env, qs, cand, terms):
    r, px = qs_env
    ids, scores = query_string_search(r, qs, cutoff=10, positional=px)
    assert _ids(r, ids) == _bm25(terms, cand)
    assert list(scores) == sorted(scores, reverse=True)


BOOST_CASES = [
    ("blue^3 OR red", {0, 1, 3, 4, 6}, {"blue": 3.0, "red": 1.0}),
    ('"deep blue"^2 OR orange', {5, 6}, {"deep": 2.0, "blue": 2.0, "orange": 1.0}),
    ("(red OR green)^2 AND purple", {2, 4}, {"red": 2.0, "green": 2.0, "purple": 1.0}),
    ("yellow^0.5 OR quick", {1, 2, 4, 5}, {"yellow": 0.5, "quick": 1.0}),
]


@pytest.mark.parametrize("qs,cand,boosts", BOOST_CASES)
def test_boosts_match_brute_force(qs_env, qs, cand, boosts):
    r, px = qs_env
    ids, scores = query_string_search(r, qs, cutoff=10, positional=px)
    assert _ids(r, ids) == _bm25(boosts, cand)


def test_parse_boost_forms():
    assert parse_query_string("a^2") == ("boost", 2.0, ("term", "a"))
    assert parse_query_string('"x y"^3') == ("boost", 3.0, ("phrase", "x y"))
    assert parse_query_string("(a OR b)^2") == (
        "boost", 2.0, ("or", [("term", "a"), ("term", "b")])
    )
    assert parse_query_string("pre*^2") == ("boost", 2.0, ("prefix", "pre"))
    assert parse_query_string("w~1^2") == ("boost", 2.0, ("fuzzy", "w", 1))


def test_duplicate_term_max_boost_wins(qs_env):
    r, px = qs_env
    a_ids, a_sc = query_string_search(r, "red^2 OR red", positional=px)
    b_ids, b_sc = query_string_search(r, "red^2", positional=px)
    assert list(a_ids) == list(b_ids)
    assert list(a_sc) == list(b_sc)


def test_field_boost_is_noop(qs_env):
    r, px = qs_env
    a, _ = query_string_search(r, "lang:en^2 AND purple", positional=px)
    b, _ = query_string_search(r, "lang:en AND purple", positional=px)
    assert list(a) == list(b)


def test_synonym_expansion(qs_env):
    r, px = qs_env
    syn = {"red": ["orange"]}
    ids, _ = query_string_search(r, "red", positional=px, synonyms=syn)
    assert _ids(r, ids) == _bm25(["red", "orange"], {0, 1, 4, 5})
    # synonym group under a boost: the whole group is boosted
    ids2, _ = query_string_search(r, "red^2 OR quick", positional=px, synonyms=syn)
    assert _ids(r, ids2) == _bm25(
        {"red": 2.0, "orange": 2.0, "quick": 1.0}, {0, 1, 4, 5}
    )


def test_phrase_without_positional_raises(qs_env):
    r, _px = qs_env
    with pytest.raises(QueryStringError):
        query_string_search(r, '"deep blue"', positional=None)


def test_query_string_table_shape(qs_env):
    r, px = qs_env
    t = query_string_table(
        r, {"a": "red AND blue", "b": "qu*"}, cutoff=5, positional=px
    )
    assert t.column_names == ["q_id", "rank", "conv_id", "turn_idx"]
    per_q = {}
    for q, rk in zip(t.column("q_id").to_pylist(), t.column("rank").to_pylist()):
        per_q.setdefault(q, []).append(rk)
    assert per_q["a"] == list(range(1, len(per_q["a"]) + 1))
    assert per_q["b"] == list(range(1, len(per_q["b"]) + 1))


def test_unknown_field_raises(qs_env):
    r, px = qs_env
    with pytest.raises(QueryStringError):
        query_string_search(r, "bogusfield:x AND red", positional=px)


def test_missing_keyword_value_matches_nothing(qs_env):
    r, px = qs_env
    ids, _ = query_string_search(r, "lang:zz AND red", positional=px)
    assert len(ids) == 0
