"""Faceted search counts (search/facets.py) vs a brute-force oracle,
including filter-DSL composition and tombstone masking."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from retriv_ray.config import SparseConfig
from retriv_ray.index.build import build_index
from retriv_ray.index.tombstones import delete_conversations
from retriv_ray.search.facets import facet_counts
from retriv_ray.search.metadata import build_metadata
from retriv_ray.search.searcher import RaySparseRetriever
from retriv_ray.sources.transcripts import _EPOCH_US

ROWS = [
    # conv, turn, role, text, tool, tags
    ("c1", 0, "user", "alpha beta", "", ["x", "y"]),
    ("c1", 1, "assistant", "beta gamma", "search", ["y"]),
    ("c2", 0, "user", "alpha gamma", "", ["z"]),
    ("c2", 1, "assistant", "delta", "python", ["x", "z"]),
    ("c3", 0, "user", "alpha beta gamma", "", []),
    ("c3", 1, "assistant", "beta delta", "search", ["y", "z"]),
]
SCHEMA_META = {"role": "keyword", "tool": "keyword", "tags": "keywords",
               "turn_idx": "number"}


def _table() -> pa.Table:
    return pa.Table.from_arrays(
        [
            pa.array([r[0] for r in ROWS]),
            pa.array([r[1] for r in ROWS], type=pa.int32()),
            pa.array([r[2] for r in ROWS]),
            pa.array([r[3] for r in ROWS]),
            pa.array([r[4] for r in ROWS]),
            pa.array(
                [int(_EPOCH_US) + i * 1_000_000 for i in range(len(ROWS))],
                type=pa.int64(),
            ).cast(pa.timestamp("us")),
            pa.array([r[5] for r in ROWS], type=pa.list_(pa.string())),
        ],
        names=["conv_id", "turn_idx", "role", "text", "tool", "ts", "tags"],
    )


def _brute(query_terms, fields, rows=ROWS, doc_filter=None):
    want = {}
    for i, (_c, _t, role, text, tool, tags) in enumerate(rows):
        if not any(t in text.split() for t in query_terms):
            continue
        if doc_filter is not None and not doc_filter(i):
            continue
        vals = {"role": [role], "tool": [tool], "tags": tags}
        for f in fields:
            for v in vals[f]:
                want[(f, v)] = want.get((f, v), 0) + 1
    return want


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("facets")
    src = os.path.join(d, "t.parquet")
    pq.write_table(_table(), src)
    idx = os.path.join(d, "idx")
    cfg = SparseConfig(tokenizer="whitespace", stemmer=None, stopwords=None)
    build_index(src, idx, cfg, num_parts=2)
    build_metadata(src, idx, SCHEMA_META)
    return d, cfg


def _open(built):
    d, cfg = built
    return RaySparseRetriever(os.path.join(d, "idx"), cfg)


def test_facets_match_bruteforce(built):
    r = _open(built)
    t = facet_counts(r, "beta delta", ["role", "tool", "tags"])
    got = {
        (f, v): n
        for f, v, n in zip(
            t.column("field").to_pylist(),
            t.column("value").to_pylist(),
            t.column("n_docs").to_pylist(),
        )
    }
    assert got == _brute(["beta", "delta"], ["role", "tool", "tags"])


def test_facets_compose_with_filter_dsl(built):
    r = _open(built)
    t = facet_counts(
        r, {"text": "alpha beta", "where": {"role": "user"}}, ["tags"]
    )
    got = dict(
        zip(t.column("value").to_pylist(), t.column("n_docs").to_pylist())
    )
    want = _brute(
        ["alpha", "beta"],
        ["tags"],
        doc_filter=lambda i: ROWS[i][2] == "user",
    )
    assert got == {v: n for (_f, v), n in want.items()}


def test_facets_number_field_raises(built):
    r = _open(built)
    with pytest.raises(ValueError):
        facet_counts(r, "alpha", ["turn_idx"])
    with pytest.raises(ValueError):
        facet_counts(r, "alpha", ["nope"])


def test_facets_honor_tombstones(built, tmp_path):
    import shutil

    d, cfg = built
    idx2 = str(tmp_path / "idx2")
    shutil.copytree(os.path.join(d, "idx"), idx2)
    delete_conversations(idx2, ["c1"])
    r2 = RaySparseRetriever(idx2, cfg)
    t = facet_counts(r2, "beta delta", ["role"])
    got = dict(
        zip(t.column("value").to_pylist(), t.column("n_docs").to_pylist())
    )
    want = _brute(
        ["beta", "delta"], ["role"], doc_filter=lambda i: ROWS[i][0] != "c1"
    )
    assert got == {v: n for (_f, v), n in want.items()}


def test_collapse_topk_matches_bruteforce(built):
    from retriv_ray.search.collapse import collapse_topk

    r = _open(built)
    # full ranking for 'beta delta', collapse by role, 1 per value
    ids, _ = r._score(r.query_terms("beta delta"), r.index.local_count)
    roles = [ROWS[i][2] for i in ids]
    seen, want = set(), []
    for i, role in zip(ids, roles):
        if role in seen:
            continue
        seen.add(role)
        want.append(int(i))
    t = collapse_topk(r, "beta delta", "role", per_value=1, cutoff=10)
    assert t.column("doc_id").to_pylist() == want
    assert t.column("rank").to_pylist() == list(range(1, len(want) + 1))
    assert t.column("value").to_pylist() == [ROWS[i][2] for i in want]


def test_collapse_per_value_two(built):
    from retriv_ray.search.collapse import collapse_topk

    r = _open(built)
    ids, _ = r._score(r.query_terms("beta delta"), r.index.local_count)
    counts, want = {}, []
    for i in ids:
        role = ROWS[i][2]
        if counts.get(role, 0) >= 2:
            continue
        counts[role] = counts.get(role, 0) + 1
        want.append(int(i))
    t = collapse_topk(r, "beta delta", "role", per_value=2, cutoff=10)
    assert t.column("doc_id").to_pylist() == want


def test_collapse_rejects_multi_valued_field(built):
    from retriv_ray.search.collapse import collapse_topk

    r = _open(built)
    with pytest.raises(ValueError):
        collapse_topk(r, "beta", "tags")
    with pytest.raises(ValueError):
        collapse_topk(r, "beta", "turn_idx")
    with pytest.raises(ValueError):
        collapse_topk(r, "beta", "role", per_value=0)


def test_retriever_facade_methods(built):
    """The RaySparseRetriever facades delegate to the query modules."""
    r = _open(built)
    assert r.suggest("alpna") == ("alpha", 1, 3)
    t = r.fuzzy_search({"q": ("beta", 1)}, cutoff=5)
    assert t.num_rows > 0
    t = r.regex_search({"q": "al.*"})
    assert set(t.column_names) == {"q_id", "conv_id", "turn_idx", "n_terms"}
    t = r.facets("beta delta", ["role"])
    assert t.num_rows > 0
    t = r.more_like_this("alpha beta", cutoff=3)
    assert t.num_rows > 0
    p1 = r.search_after("beta", page_size=2)
    assert p1.num_rows == 2
    cur = (p1.column("score")[-1].as_py(), p1.column("doc_id")[-1].as_py())
    p2 = r.search_after("beta", page_size=2, cursor=cur)
    assert p2.column("rank").to_pylist() == [3, 4] or p2.num_rows <= 2
    t = r.collapse("beta delta", "role", per_value=1)
    assert t.num_rows > 0
    t = r.explain("beta", int(p1.column("doc_id")[0].as_py()))
    assert t.num_rows == 1 and t.column("term")[0].as_py() == "beta"


def test_range_facets_bruteforce(built):
    from retriv_ray.search.facets import range_facets

    d, cfg = built
    # give the fixture a number field view: turn_idx acts as the value
    r = _open(built)
    t = range_facets(r, "alpha beta", "turn_idx", [0, 1, 2])
    got = {
        (lo, hi): n
        for lo, hi, n in zip(
            t.column("lo").to_pylist(),
            t.column("hi").to_pylist(),
            t.column("n_docs").to_pylist(),
        )
    }
    want = {}
    for i, (_c, turn, _r, text, _tool, _tags) in enumerate(ROWS):
        if not any(w in text.split() for w in ("alpha", "beta")):
            continue
        for lo, hi in [(0.0, 1.0), (1.0, 2.0)]:
            if lo <= turn < hi:
                want[(lo, hi)] = want.get((lo, hi), 0) + 1
    assert got == want


def test_range_facets_validation(built):
    from retriv_ray.search.facets import range_facets

    r = _open(built)
    with pytest.raises(ValueError):
        range_facets(r, "alpha", "role", [0, 1])  # keyword field
    with pytest.raises(ValueError):
        range_facets(r, "alpha", "turn_idx", [5])  # one edge
    with pytest.raises(ValueError):
        range_facets(r, "alpha", "turn_idx", [2, 1])  # not increasing


def test_significant_terms_bruteforce(built):
    from retriv_ray.search.facets import significant_terms

    r = _open(built)
    t = significant_terms(r, "delta", top_k=5, min_df_fg=1)
    # matching docs: rows containing 'delta' -> ids 3, 5
    match = [i for i, row in enumerate(ROWS) if "delta" in row[3].split()]
    n, n_fg = len(ROWS), len(match)
    want = []
    vocab = sorted({w for row in ROWS for w in row[3].split()})
    for term in vocab:
        df = sum(1 for row in ROWS if term in row[3].split())
        df_fg = sum(1 for i in match if term in ROWS[i][3].split())
        if df_fg < 1:
            continue
        want.append((-((10_000 * df_fg * n) // (df * n_fg)), -df_fg, term, df))
    want.sort()
    want = want[:5]
    got = t.to_pylist()
    assert [(r_["term"], r_["df_fg"], r_["df"], r_["lift_e4"]) for r_ in got] == [
        (w[2], -w[1], w[3], -w[0]) for w in want
    ]
    # 'delta' itself has maximal lift (present in every matching doc)
    assert got[0]["term"] == "delta"


def test_significant_terms_empty_query(built):
    from retriv_ray.search.facets import significant_terms

    r = _open(built)
    t = significant_terms(r, "qqqq", top_k=5)
    assert t.num_rows == 0


def test_facet_counts_additive_across_shards(ray_session, tmp_path_factory):
    """Facet counts from per-doc-shard views sum to the monolithic
    count (the sharded-serving merge contract in facets.py)."""
    d = tmp_path_factory.mktemp("facets_sharded")
    src = os.path.join(d, "t.parquet")
    pq.write_table(_table(), src)
    idx = os.path.join(d, "idx")
    cfg = SparseConfig(tokenizer="whitespace", stemmer=None, stopwords=None)
    man = build_index(src, idx, cfg, num_parts=2, shard_docs=4)
    assert man.doc_count == 6  # spans 2 shards of 4
    build_metadata(src, idx, SCHEMA_META)

    def counts(r):
        t = facet_counts(r, "beta delta", ["role", "tags"])
        return {
            (f, v): n
            for f, v, n in zip(
                t.column("field").to_pylist(),
                t.column("value").to_pylist(),
                t.column("n_docs").to_pylist(),
            )
        }

    mono = counts(RaySparseRetriever(idx, cfg))
    summed = {}
    for s in (0, 1):
        for k, n in counts(
            RaySparseRetriever(idx, cfg, shard_range=(s, s))
        ).items():
            summed[k] = summed.get(k, 0) + n
    assert summed == mono


def test_autocomplete_top_df(ray_session, tmp_path_factory):
    from retriv_ray.search.prefix import complete

    import ray.data

    d = tmp_path_factory.mktemp("complete")
    tbl = pa.table(
        {
            "conv_id": [f"c{i}" for i in range(4)],
            "turn_idx": pa.array([0] * 4, type=pa.int32()),
            "text": [
                "alpha alarm albedo",
                "alpha albedo",
                "alpha beta",
                "albatross beta",
            ],
        }
    )
    src = os.path.join(d, "src")
    ray.data.from_arrow(tbl).write_parquet(src)
    idx = os.path.join(d, "idx")
    cfg = SparseConfig(tokenizer="whitespace", stemmer=None, stopwords=None)
    build_index(src, idx, cfg, num_parts=2, resume=False)
    r = RaySparseRetriever(idx, cfg)
    got = complete(r.index.term_df, "al", k=3)
    # dfs: alpha 3, albedo 2, alarm 1, albatross 1 -> df-1 tie breaks
    # lexically ('alarm' < 'albatross')
    assert got == [("alpha", 3), ("albedo", 2), ("alarm", 1)]
    assert complete(r.index.term_df, "al", k=10) == [
        ("alpha", 3), ("albedo", 2), ("alarm", 1), ("albatross", 1)
    ]
    assert complete(r.index.term_df, "zz", k=3) == []
    with pytest.raises(ValueError):
        complete(r.index.term_df, "")


# -- ES stats sub-aggregation (facet_stats) ----------------------------------


def test_facet_stats_match_bruteforce(built):
    from retriv_ray.search.facets import facet_stats

    r = _open(built)
    t = facet_stats(r, "alpha beta", "role", "turn_idx")
    rows = {
        v: (n, s, lo, hi)
        for v, n, s, lo, hi in zip(
            *(t.column(c).to_pylist() for c in t.column_names)
        )
    }
    # matching docs (alpha or beta): 0,1,2,4,5; user turns = 0,0,0;
    # assistant turns = 1,1
    assert rows == {"user": (3, 0, 0, 0), "assistant": (2, 2, 1, 1)}


def test_facet_stats_field_kind_errors(built):
    from retriv_ray.search.facets import facet_stats

    r = _open(built)
    with pytest.raises(ValueError):
        facet_stats(r, "alpha", "turn_idx", "turn_idx")  # numeric facet
    with pytest.raises(ValueError):
        facet_stats(r, "alpha", "role", "role")  # non-numeric value field
